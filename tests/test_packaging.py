"""The --py-files zip must be self-contained and importable via zipimport
(what executors do with it)."""

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).parent.parent


def test_pyfiles_zip_importable(tmp_path):
    out = tmp_path / "wpx.zip"
    subprocess.run(
        [sys.executable, str(REPO / "scripts" / "make_pyfiles.py"), str(out)],
        check=True,
        capture_output=True,
    )
    probe = (
        "import sys; sys.path.insert(0, sys.argv[1]); "
        "from wpextract_spark.kernel.content import extract_content; "
        "from wpextract_spark.htmlkit import parse_html; "
        "import wpextract_spark.pywarm_daemon; "
        "print(extract_content(parse_html('<p>ok</p>'), 'https://x/')['text'])"
    )
    res = subprocess.run(
        [sys.executable, "-c", probe, str(out)],
        capture_output=True,
        text=True,
        cwd=tmp_path,  # make sure the repo checkout isn't on the path
    )
    assert res.returncode == 0, res.stderr
    assert res.stdout.strip() == "ok"
