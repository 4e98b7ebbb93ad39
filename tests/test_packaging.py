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


def test_pyfiles_zip_reproducible_and_source_only(tmp_path):
    """Content-addressed artifact: rebuilding an unchanged tree gives
    byte-identical zips; only package source ships (no tests/fixtures)."""
    import zipfile

    outs = []
    for name in ("a.zip", "b.zip"):
        out = tmp_path / name
        subprocess.run(
            [sys.executable, str(REPO / "scripts" / "make_pyfiles.py"), str(out)],
            check=True,
            capture_output=True,
        )
        outs.append(out.read_bytes())
    assert outs[0] == outs[1]
    names = zipfile.ZipFile(tmp_path / "a.zip").namelist()
    assert all(n.startswith("wpextract_spark/") and n.endswith(".py") for n in names)
