"""Regenerate wpextract_spark/functions/iso639_data.py from the public
Debian iso-codes registry (/usr/share/iso-codes/json, package `iso-codes`,
LGPL data originally from ISO 639-2/-3/-5 and ISO 15924).

The locale module needs the same registry breadth the reference gets from
`langcodes` (IANA language-subtag-registry): ALL ISO 639-3 individual +
macro languages, 639-5 collections, 639-2 bibliographic aliases, and the
full ISO 15924 script list. Hand-curating a subset (rounds 1-2) left
documented divergences; this generates the whole table as pure data.

Usage: python scripts/gen_iso639.py   (rewrites the data module in place)
"""

from __future__ import annotations

import json
import os

JSON_DIR = "/usr/share/iso-codes/json"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "wpextract_spark",
    "functions",
    "iso639_data.py",
)


def _load(name: str, key: str) -> list[dict]:
    with open(os.path.join(JSON_DIR, name)) as fh:
        return json.load(fh)[key]


def _wrap(codes: list[str], width: int = 74) -> str:
    lines, cur = [], ""
    for c in codes:
        if len(cur) + len(c) + 1 > width:
            lines.append(cur)
            cur = c
        else:
            cur = f"{cur} {c}" if cur else c
    if cur:
        lines.append(cur)
    return "\n".join(f'    "{line} "' for line in lines)


def main() -> None:
    d3 = _load("iso_639-3.json", "639-3")
    d2 = _load("iso_639-2.json", "639-2")
    d5 = _load("iso_639-5.json", "639-5")
    scripts = _load("iso_15924.json", "15924")

    part1 = sorted({e["alpha_2"] for e in d3 if "alpha_2" in e})
    to_part1: dict[str, str] = {}
    for e in d3:
        if "alpha_2" in e:
            to_part1[e["alpha_3"]] = e["alpha_2"]
    for e in d2:
        if "alpha_2" in e:
            to_part1.setdefault(e["alpha_3"], e["alpha_2"])
            if "bibliographic" in e:
                to_part1[e["bibliographic"]] = e["alpha_2"]
    alpha3 = {e["alpha_3"] for e in d3} | {e["alpha_3"] for e in d5}
    alpha3 |= set(to_part1)  # bibliographic aliases validate too
    alpha3 = sorted(alpha3)
    script_codes = sorted({e["alpha_4"].lower() for e in scripts})

    body = f'''"""ISO 639 / ISO 15924 registry tables — GENERATED, do not edit.

Regenerate with: python scripts/gen_iso639.py
Source: /usr/share/iso-codes/json (Debian `iso-codes` package; public
ISO 639-2/-3/-5 + ISO 15924 data, the same registries behind the IANA
language-subtag-registry that the reference's `langcodes` dependency uses).

{len(alpha3)} three-letter language codes ({len(d3)} ISO 639-3 +
{len(d5)} ISO 639-5 collections + bibliographic aliases),
{len(part1)} two-letter codes, {len(to_part1)} 3->2 mappings,
{len(script_codes)} script codes.
"""

ISO639_1 = frozenset(
{_wrap(part1)}
    .split()
)

ISO639_3 = frozenset(
{_wrap(alpha3)}
    .split()
)

SCRIPTS = frozenset(
{_wrap(script_codes)}
    .split()
)

TO_PART1 = dict(
    pair.split(":")
    for pair in (
{_wrap(sorted(f"{k}:{v}" for k, v in to_part1.items()))}
    ).split()
)
'''
    with open(OUT, "w") as fh:
        fh.write(body)
    print(
        f"wrote {OUT}: {len(alpha3)} alpha3, {len(part1)} alpha2, "
        f"{len(to_part1)} mappings, {len(script_codes)} scripts"
    )


if __name__ == "__main__":
    main()
