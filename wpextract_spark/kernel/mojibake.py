"""Mojibake repair: undo UTF-8 text that was decoded as cp1252/latin-1.

The single most common encoding corruption in web corpora: a page's UTF-8
bytes were interpreted as cp1252 somewhere in the serving/crawling chain, so
"café" arrives as "cafÃ©" and "—" as "â€”".  The repair is the exact
inverse — re-encode the characters to their cp1252 bytes and decode those
bytes as UTF-8 — applied only when the text actually looks corrupted, and
iterated to unwind double encoding ("ÃƒÂ©" → "Ã©" → "é").

Detection is the classic lead-image/continuation-image heuristic: a UTF-8
lead byte (0xC2–0xF4) decoded as cp1252 yields a character in Â…ß/à…ï/ð…ô,
and a continuation byte (0x80–0xBF) yields one of €‚ƒ…Ÿ/NBSP…¿; those two
classes adjacent essentially never occur in clean text, so their presence
gates the repair attempt.  Repair is ALL-OR-NOTHING per string: if the
re-encoded bytes are not valid UTF-8 (e.g. a legitimate stray "€" in
otherwise clean text), the input is returned unchanged — a conservative
policy that can miss mixed corruption but never corrupts clean text.

cp1252 leaves five bytes unmapped (0x81 0x8D 0x8F 0x90 0x9D); real decoders
(and WHATWG windows-1252) pass them through as their latin-1 code points,
so the re-encoder does too.
"""

from __future__ import annotations

import re

# cp1252 images of UTF-8 lead bytes 0xC2-0xF4.  0xC2-0xDF and 0xE0-0xEF and
# 0xF0-0xF4 all decode to their latin-1 code points (none fall in the
# cp1252-remapped 0x80-0x9F window), so the image set is just those chars.
_LEAD = "".join(chr(b) for b in range(0xC2, 0xF5))
# cp1252 images of continuation bytes 0x80-0xBF: 0x80-0x9F go through the
# cp1252 table (with the 5 gap bytes passed through), 0xA0-0xBF are
# latin-1 identity.
_CONT = "".join(
    (bytes([b]).decode("cp1252") if b not in (0x81, 0x8D, 0x8F, 0x90, 0x9D) else chr(b))
    for b in range(0x80, 0xC0)
)
_SUSPECT = re.compile("[{}][{}]".format(re.escape(_LEAD), re.escape(_CONT)))


def _cp1252_bytes(text: str) -> bytes | None:
    """Inverse of bytes.decode('cp1252') with WHATWG gap passthrough."""
    try:
        return text.encode("cp1252")
    except UnicodeEncodeError:
        pass
    out = bytearray()
    for ch in text:
        try:
            out += ch.encode("cp1252")
        except UnicodeEncodeError:
            o = ord(ch)
            if 0x80 <= o <= 0x9F:  # the five unmapped control bytes
                out.append(o)
            else:  # genuinely non-cp1252 char: this is not cp1252 mojibake
                return None
    return bytes(out)


def fix_mojibake(text: str, max_passes: int = 3) -> str:
    """Repaired text, or ``text`` unchanged if it doesn't look corrupted or
    the corruption isn't a clean whole-string cp1252/UTF-8 swap."""
    for _ in range(max_passes):
        if not _SUSPECT.search(text):
            return text
        raw = _cp1252_bytes(text)
        if raw is None:
            return text
        try:
            fixed = raw.decode("utf-8")
        except UnicodeDecodeError:
            return text
        if fixed == text:
            return text
        text = fixed
    return text
