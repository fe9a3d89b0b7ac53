"""Minimal pure-Python PDF text extraction (stdlib only).

The reference's PDFAdvancedLoader extracts per-page plain text with a
native PDF library and joins pages with a newline
(pkg/rag/loader_pdf_advanced.go:63-83); image extraction (:86-172) is
out of scope here. This module is the in-repo analog for the TEXT path:
a content-stream scanner for the two stream encodings that cover
machine-generated PDFs — uncompressed and /FlateDecode (stdlib zlib).

What it implements (all public PDF 1.7 spec structure, ISO 32000-1):
  * object stream discovery: ``<<dict>> stream .. endstream`` spans;
  * /FlateDecode decompression; other filters are skipped;
  * text-showing operators inside BT..ET blocks: ``Tj``, ``'``, ``"``
    and ``TJ`` (array form, kerning numbers ignored);
  * literal strings ``(..)`` with the spec's escape set (octal, the
    two-char escapes, balanced nested parens, line continuations) and
    hex strings ``<..>``;
  * newline heuristics on the text-positioning operators
    (``Td``/``TD``/``T*``/``Tm``) so extracted lines keep their breaks;
  * inline-image ``BI..ID..EI`` spans are skipped.

Documented limitations (the CLI-parser route handles these, exactly as
the reference's SmartLoader does for its own failures): font-encoded
CIDs are not mapped through /ToUnicode CMaps (hex strings decode as
latin-1 bytes), and LZW/DCT/CCITT-filtered streams are skipped. A PDF
from which no text is recovered raises upstream (PdfLoader), keeping
the fallback chain loud instead of emitting garbage.
"""

from __future__ import annotations

import re
import zlib

_STREAM_RE = re.compile(
    rb"<<(?P<dict>.*?)>>\s*stream\r?\n(?P<body>.*?)endstream", re.DOTALL
)

# The only escapes with special meaning; anything else after a
# backslash means "drop the backslash" (spec table 3).
_ESCAPES = {
    ord("n"): "\n", ord("r"): "\r", ord("t"): "\t",
    ord("b"): "\b", ord("f"): "\f",
    ord("("): "(", ord(")"): ")", ord("\\"): "\\",
}

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


def _parse_literal(data: bytes, i: int) -> tuple[str, int]:
    """Parse a literal string starting AT the '('. Returns (text,
    index past the closing paren)."""
    assert data[i : i + 1] == b"("
    i += 1
    depth = 1
    out: list[str] = []
    n = len(data)
    while i < n and depth:
        c = data[i]
        if c == 0x5C:  # backslash
            i += 1
            if i >= n:
                break
            e = data[i]
            if e in _ESCAPES:
                out.append(_ESCAPES[e])
                i += 1
            elif 0x30 <= e <= 0x37:  # up to 3 octal digits
                j = i
                while j < min(i + 3, n) and 0x30 <= data[j] <= 0x37:
                    j += 1
                out.append(chr(int(data[i:j], 8) & 0xFF))
                i = j
            elif e in (0x0A, 0x0D):  # line continuation
                i += 1
                if e == 0x0D and i < n and data[i] == 0x0A:
                    i += 1
            else:
                out.append(chr(e))
                i += 1
        elif c == 0x28:  # nested (
            depth += 1
            out.append("(")
            i += 1
        elif c == 0x29:  # )
            depth -= 1
            if depth:
                out.append(")")
            i += 1
        else:
            out.append(chr(c))
            i += 1
    return "".join(out), i


def _parse_hex(data: bytes, i: int) -> tuple[str, int]:
    """Parse a hex string starting AT the '<'. Bytes decode latin-1
    (no CMap mapping — documented limitation)."""
    j = data.find(b">", i + 1)
    if j < 0:
        return "", len(data)
    hx = re.sub(rb"[^0-9a-fA-F]", b"", data[i + 1 : j])
    if len(hx) % 2:
        hx += b"0"  # spec: odd final digit is padded with 0
    try:
        return bytes.fromhex(hx.decode("ascii")).decode("latin-1"), j + 1
    except ValueError:
        return "", j + 1


def _content_text(cs: bytes) -> str:
    """Walk one decoded content stream, collecting text shown by
    Tj / ' / " / TJ inside BT..ET blocks, with newline heuristics on
    the positioning operators."""
    out: list[str] = []
    strings: list[str] = []  # strings seen since the last operator
    i, n = 0, len(cs)
    in_bt = False

    def _newline() -> None:
        if out and not out[-1].endswith("\n"):
            out.append("\n")

    while i < n:
        c = cs[i]
        if c in _WS:
            i += 1
        elif c == 0x25:  # % comment to EOL
            j = cs.find(b"\n", i)
            i = n if j < 0 else j + 1
        elif c == 0x28:  # (
            s, i = _parse_literal(cs, i)
            strings.append(s)
        elif c == 0x3C:  # < or <<
            if cs[i : i + 2] == b"<<":
                j = cs.find(b">>", i + 2)
                i = n if j < 0 else j + 2
            else:
                s, i = _parse_hex(cs, i)
                strings.append(s)
        elif c in b"[]{}":
            i += 1  # TJ arrays: strings accumulate, numbers are skipped
        elif c == 0x2F:  # /Name
            i += 1
            while i < n and cs[i] not in _WS and cs[i] not in _DELIM:
                i += 1
        else:
            j = i
            while j < n and cs[j] not in _WS and cs[j] not in _DELIM:
                j += 1
            tok = cs[i:j]
            i = j if j > i else i + 1
            if tok == b"BT":
                in_bt = True
                strings.clear()
            elif tok == b"ET":
                in_bt = False
                _newline()
            elif tok == b"BI":
                # inline image: skip to EI after the binary ID section
                j = cs.find(b"EI", i)
                i = n if j < 0 else j + 2
            elif in_bt and tok in (b"Tj", b"TJ"):
                out.extend(strings)
                strings.clear()
            elif in_bt and tok in (b"'", b'"'):
                _newline()  # both mean "next line, then show"
                out.extend(strings[-1:])
                strings.clear()
            elif in_bt and tok in (b"Td", b"TD", b"T*", b"Tm"):
                _newline()
                strings.clear()
            elif tok and not re.fullmatch(rb"[-+.0-9]+", tok):
                strings.clear()  # any other operator consumes operands
    return "".join(out)


def extract_pdf_text(data: bytes) -> str:
    """Extract plain text from raw PDF bytes: every uncompressed or
    Flate stream whose decoded body contains a BT text block
    contributes, in file order, joined with a newline (the reference's
    per-page join, loader_pdf_advanced.go:73-81; content streams
    appear in page order in machine-generated PDFs). Returns '' when
    nothing decodes — callers treat that as a parse failure."""
    pages: list[str] = []
    for m in _STREAM_RE.finditer(data):
        d, body = m.group("dict"), m.group("body")
        # strip the trailing EOL the spec puts before 'endstream'
        if body.endswith(b"\r\n"):
            body = body[:-2]
        elif body.endswith(b"\n") or body.endswith(b"\r"):
            body = body[:-1]
        if b"/FlateDecode" in d:
            try:
                body = zlib.decompress(body)
            except zlib.error:
                continue
        elif b"/Filter" in d:
            continue  # unsupported filter (DCT/LZW/CCITT/...)
        if b"BT" not in body:
            continue
        text = _content_text(body)
        if text.strip():
            pages.append(text if text.endswith("\n") else text + "\n")
    return "".join(pages)
