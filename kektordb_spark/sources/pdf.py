"""Minimal pure-Python PDF text extraction (stdlib only).

The reference's PDFAdvancedLoader extracts per-page plain text with a
native PDF library and joins pages with a newline
(pkg/rag/loader_pdf_advanced.go:63-83); image extraction (:86-172) is
out of scope here. This module is the in-repo analog for the TEXT path.

What it implements (all public PDF 1.7 spec structure, ISO 32000-1):
  * indirect-object parsing (``N G obj .. endobj``) with balanced
    ``<<..>>`` dictionaries and ``stream .. endstream`` bodies;
  * page discovery (``/Type /Page``), multi-part ``/Contents`` arrays,
    ``/Resources`` -> ``/Font`` resolution (inline dicts or refs);
  * stream filters: ``/FlateDecode`` (stdlib zlib), ``/LZWDecode``
    (spec 7.4.4 variable-width codes, EarlyChange honored — r6, was a
    documented CLI-fallback gap), ``/ASCIIHexDecode`` and
    ``/ASCII85Decode``, including chained filter arrays;
  * ``/ToUnicode`` CMaps (spec 9.10.3): ``beginbfchar``/``beginbfrange``
    entries (list- and increment-form ranges), UTF-16BE destinations,
    multi-byte source codes — font-encoded (CID) strings map through
    the CMap of the font selected by the ``Tf`` operator (r6, was a
    documented latin-1-bytes gap);
  * text-showing operators inside BT..ET blocks: ``Tj``, ``'``, ``"``
    and ``TJ`` (array form, kerning numbers ignored);
  * literal strings ``(..)`` with the spec's escape set (octal, the
    two-char escapes, balanced nested parens, line continuations) and
    hex strings ``<..>``;
  * newline heuristics on the text-positioning operators
    (``Td``/``TD``/``T*``/``Tm``) so extracted lines keep their breaks;
  * inline-image ``BI..ID..EI`` spans are skipped.

Documented limitations (the CLI-parser route handles these, exactly as
the reference's SmartLoader does for its own failures): DCT/CCITT/JBIG2
image filters (no text inside anyway), encrypted PDFs, cross-reference
streams as the ONLY object source (objects inside compressed object
streams — /Type /ObjStm — are not expanded), and fonts whose only
mapping is a built-in/embedded encoding without /ToUnicode (bytes
decode latin-1). A PDF from which no text is recovered raises upstream
(PdfLoader), keeping the fallback chain loud instead of emitting
garbage.
"""

from __future__ import annotations

import re
import zlib

_STREAM_RE = re.compile(
    rb"<<(?P<dict>.*?)>>\s*stream\r?\n(?P<body>.*?)endstream", re.DOTALL
)
_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b(.*?)endobj", re.DOTALL)
_REF_RE = rb"(\d+)\s+\d+\s+R"

# The only escapes with special meaning; anything else after a
# backslash means "drop the backslash" (spec table 3).
_ESCAPES = {
    ord("n"): b"\n", ord("r"): b"\r", ord("t"): b"\t",
    ord("b"): b"\b", ord("f"): b"\f",
    ord("("): b"(", ord(")"): b")", ord("\\"): b"\\",
}

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


# ---------------------------------------------------------------------------
# Stream filters
# ---------------------------------------------------------------------------

def _lzw_decode(data: bytes, early: int = 1) -> bytes:
    """LZWDecode (spec 7.4.4): 9-bit initial codes, 256 = clear-table,
    257 = EOD, code width grows to 12 bits. ``early`` is the
    /EarlyChange DecodeParm (default 1: the width bumps one code
    early, matching every mainstream encoder)."""
    out = bytearray()
    base = [bytes([i]) for i in range(256)] + [b"", b""]
    table = list(base)
    width = 9
    bitbuf = bitcnt = 0
    prev: bytes | None = None
    for byte in data:
        bitbuf = (bitbuf << 8) | byte
        bitcnt += 8
        while bitcnt >= width:
            code = (bitbuf >> (bitcnt - width)) & ((1 << width) - 1)
            bitcnt -= width
            if code == 256:
                table = list(base)
                width = 9
                prev = None
                continue
            if code == 257:
                return bytes(out)
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                if len(table) < 4096:
                    table.append(prev + entry[:1])
            elif code == len(table) and code < 4096:
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("LZW: code out of range")
            out += entry
            prev = entry
            # Width bump (r7 fix): at table len 511/1023/2047 for
            # EarlyChange=1 (512/1024/2048 for 0) — the pdfminer/pdf.js
            # schedule. r6 shipped `+ early - 1`, one entry late, which
            # desynced from every mainstream encoder once a stream
            # added >253 entries; the in-repo test encoder shared the
            # off-by-one so round-trips couldn't catch it (ADVICE r6).
            if len(table) + early >= (1 << width) and width < 12:
                width += 1
    return bytes(out)


def _unpredict(data: bytes, pred: int, columns: int, colors: int,
               bpc: int) -> bytes | None:
    """Reverse a /DecodeParms predictor after Flate/LZW decode
    (spec 7.4.4.4). PNG predictors (pred >= 10) are the ubiquitous
    case — PDF 1.5+ writers emit /Predictor 12 (Up) on /ObjStm and
    xref streams; without reversal the decompressed bytes parse as
    garbage and the packed objects are silently lost (ADVICE r6).
    TIFF predictor 2 is reversed for the 8-bit case; anything else
    returns None so the caller skips the stream loudly."""
    bpp = max(1, (colors * bpc + 7) // 8)        # bytes per pixel
    stride = (columns * colors * bpc + 7) // 8   # bytes per row
    rowlen = stride + (1 if pred >= 10 else 0)
    if rowlen <= 0 or len(data) % rowlen:
        return None  # malformed: partial trailing row — skip loudly
    if pred == 2:
        if bpc != 8:
            return None
        out = bytearray(data)
        for r in range(0, len(out) - stride + 1, stride):
            for i in range(r + bpp, r + stride):
                out[i] = (out[i] + out[i - bpp]) & 0xFF
        return bytes(out)
    if pred < 10:
        return None
    # PNG: every row is 1 tag byte + stride data bytes
    out = bytearray()
    prior = bytearray(stride)
    for r in range(0, len(data) - rowlen + 1, rowlen):
        tag = data[r]
        row = bytearray(data[r + 1 : r + rowlen])
        if tag == 1:    # Sub
            for i in range(bpp, stride):
                row[i] = (row[i] + row[i - bpp]) & 0xFF
        elif tag == 2:  # Up
            for i in range(stride):
                row[i] = (row[i] + prior[i]) & 0xFF
        elif tag == 3:  # Average
            for i in range(stride):
                left = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + ((left + prior[i]) >> 1)) & 0xFF
        elif tag == 4:  # Paeth
            for i in range(stride):
                a = row[i - bpp] if i >= bpp else 0
                b = prior[i]
                c = prior[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                if pa <= pb and pa <= pc:
                    pr = a
                elif pb <= pc:
                    pr = b
                else:
                    pr = c
                row[i] = (row[i] + pr) & 0xFF
        elif tag != 0:
            return None
        out += row
        prior = row
    return bytes(out)


def _apply_filters(d: bytes, body: bytes) -> bytes | None:
    """Run the stream dict's filter chain; None = unsupported filter
    (the caller skips the stream — DCT/CCITT images have no text)."""
    filters = re.findall(rb"/([A-Za-z0-9]+)", d[d.find(b"/Filter"):]) \
        if b"/Filter" in d else []
    # /Filter /Name or /Filter [/N1 /N2]: the findall above also sweeps
    # trailing keys (e.g. /Length); stop at the first non-filter name.
    known = {b"FlateDecode", b"LZWDecode", b"ASCIIHexDecode",
             b"ASCII85Decode", b"DCTDecode", b"CCITTFaxDecode",
             b"JBIG2Decode", b"JPXDecode", b"RunLengthDecode"}
    chain = []
    for f in filters:
        if f == b"Filter":
            continue
        if f not in known:
            break
        chain.append(f)
    em = re.search(rb"/EarlyChange\s+(\d+)", d)
    early = int(em.group(1)) if em else 1

    def _parm(name: bytes, default: int) -> int:
        m = re.search(rb"/" + name + rb"\s+(\d+)", d)
        return int(m.group(1)) if m else default

    predictor = _parm(b"Predictor", 1)
    # /DecodeParms is per-filter; this dict-level scan applies the one
    # predictor it finds to the LAST Flate/LZW stage only (the
    # real-world shape — a predictor belongs to the final compression
    # filter; applying it after EACH stage of a pathological
    # Flate-then-Flate chain would double-reverse).
    last_pred_stage = max(
        (i for i, f in enumerate(chain)
         if f in (b"FlateDecode", b"LZWDecode")), default=-1)
    for fi, f in enumerate(chain):
        try:
            if f == b"FlateDecode":
                body = zlib.decompress(body)
                if predictor > 1 and fi == last_pred_stage:
                    body = _unpredict(
                        body, predictor, _parm(b"Columns", 1),
                        _parm(b"Colors", 1),
                        _parm(b"BitsPerComponent", 8))
                    if body is None:
                        return None
            elif f == b"LZWDecode":
                body = _lzw_decode(body, early)
                if predictor > 1 and fi == last_pred_stage:
                    body = _unpredict(
                        body, predictor, _parm(b"Columns", 1),
                        _parm(b"Colors", 1),
                        _parm(b"BitsPerComponent", 8))
                    if body is None:
                        return None
            elif f == b"ASCIIHexDecode":
                hx = re.sub(rb"[^0-9a-fA-F]", b"",
                            body.split(b">", 1)[0])
                if len(hx) % 2:
                    hx += b"0"
                body = bytes.fromhex(hx.decode("ascii"))
            elif f == b"ASCII85Decode":
                import base64

                raw = body.strip()
                if raw.endswith(b"~>"):
                    raw = raw[:-2]
                body = base64.a85decode(re.sub(rb"\s", b"", raw))
            else:
                return None  # image filter — no text inside
        except Exception:
            return None
    return body


# ---------------------------------------------------------------------------
# String parsing (returns RAW BYTES — decoding depends on the active font)
# ---------------------------------------------------------------------------

def _parse_literal(data: bytes, i: int) -> tuple[bytes, int]:
    """Parse a literal string starting AT the '('. Returns (raw bytes,
    index past the closing paren)."""
    assert data[i : i + 1] == b"("
    i += 1
    depth = 1
    out = bytearray()
    n = len(data)
    while i < n and depth:
        c = data[i]
        if c == 0x5C:  # backslash
            i += 1
            if i >= n:
                break
            e = data[i]
            if e in _ESCAPES:
                out += _ESCAPES[e]
                i += 1
            elif 0x30 <= e <= 0x37:  # up to 3 octal digits
                j = i
                while j < min(i + 3, n) and 0x30 <= data[j] <= 0x37:
                    j += 1
                out.append(int(data[i:j], 8) & 0xFF)
                i = j
            elif e in (0x0A, 0x0D):  # line continuation
                i += 1
                if e == 0x0D and i < n and data[i] == 0x0A:
                    i += 1
            else:
                out.append(e)
                i += 1
        elif c == 0x28:  # nested (
            depth += 1
            out += b"("
            i += 1
        elif c == 0x29:  # )
            depth -= 1
            if depth:
                out += b")"
            i += 1
        else:
            out.append(c)
            i += 1
    return bytes(out), i


def _parse_hex(data: bytes, i: int) -> tuple[bytes, int]:
    """Parse a hex string starting AT the '<'. Returns raw bytes."""
    j = data.find(b">", i + 1)
    if j < 0:
        return b"", len(data)
    hx = re.sub(rb"[^0-9a-fA-F]", b"", data[i + 1 : j])
    if len(hx) % 2:
        hx += b"0"  # spec: odd final digit is padded with 0
    try:
        return bytes.fromhex(hx.decode("ascii")), j + 1
    except ValueError:
        return b"", j + 1


# ---------------------------------------------------------------------------
# ToUnicode CMaps
# ---------------------------------------------------------------------------

def parse_tounicode(cmap: bytes) -> tuple[int, dict[int, str]]:
    """Parse a /ToUnicode CMap stream body (spec 9.10.3): returns
    (source code width in bytes, {code -> unicode string}). Handles
    bfchar entries, increment-form bfrange, and list-form bfrange;
    destinations decode UTF-16BE (surrogate pairs included)."""
    mapping: dict[int, str] = {}
    width = 0

    def dst_text(hx: bytes) -> str:
        try:
            return bytes.fromhex(hx.decode("ascii")).decode(
                "utf-16-be", errors="replace")
        except ValueError:
            return ""

    hexs = rb"<([0-9a-fA-F\s]*)>"
    for m in re.finditer(
            rb"beginbfchar(.*?)endbfchar", cmap, re.DOTALL):
        for sm in re.finditer(hexs + rb"\s*" + hexs, m.group(1)):
            src = re.sub(rb"\s", b"", sm.group(1))
            width = max(width, len(src) // 2)
            mapping[int(src, 16)] = dst_text(
                re.sub(rb"\s", b"", sm.group(2)))
    for m in re.finditer(
            rb"beginbfrange(.*?)endbfrange", cmap, re.DOTALL):
        body = m.group(1)
        # list form: <lo> <hi> [<d0> <d1> ...]
        for sm in re.finditer(
                hexs + rb"\s*" + hexs + rb"\s*\[(.*?)\]", body,
                re.DOTALL):
            lo = int(re.sub(rb"\s", b"", sm.group(1)), 16)
            width = max(width, len(re.sub(rb"\s", b"", sm.group(1))) // 2)
            dsts = re.findall(hexs, sm.group(3))
            for off, dh in enumerate(dsts):
                mapping[lo + off] = dst_text(re.sub(rb"\s", b"", dh))
        # increment form: <lo> <hi> <dst> — scanned with the list-form
        # spans removed, so a bracketed destination list can never be
        # misread as an increment triple
        body_inc = re.sub(
            hexs + rb"\s*" + hexs + rb"\s*\[.*?\]", b"", body,
            flags=re.DOTALL)
        for sm in re.finditer(
                hexs + rb"\s*" + hexs + rb"\s*" + hexs, body_inc):
            lo = int(re.sub(rb"\s", b"", sm.group(1)), 16)
            hi = int(re.sub(rb"\s", b"", sm.group(2)), 16)
            width = max(width, len(re.sub(rb"\s", b"", sm.group(1))) // 2)
            d0h = re.sub(rb"\s", b"", sm.group(3))
            base_txt = dst_text(d0h)
            base_val = int(d0h, 16) if d0h else 0
            for code in range(lo, min(hi, lo + 65535) + 1):
                if code in mapping:
                    continue  # list form above already claimed it
                if len(base_txt) == 1:
                    mapping[code] = chr(base_val + (code - lo))
                else:
                    # multi-char destination: spec increments the LAST
                    # code unit
                    mapping[code] = (
                        base_txt[:-1]
                        + chr(ord(base_txt[-1]) + (code - lo))
                        if base_txt else "")
    return (width or 1), mapping


def _decode_shown(raw: bytes, cmap: tuple[int, dict[int, str]] | None) -> str:
    """Decode one shown string: through the active font's ToUnicode
    CMap when present (width-byte codes; unmapped codes drop — matching
    native extractors), latin-1 otherwise."""
    if not cmap:
        return raw.decode("latin-1")
    width, mapping = cmap
    out = []
    for i in range(0, len(raw) - width + 1, width):
        code = int.from_bytes(raw[i : i + width], "big")
        t = mapping.get(code)
        if t is not None:
            out.append(t)
    return "".join(out)


# ---------------------------------------------------------------------------
# Content-stream text
# ---------------------------------------------------------------------------

def _content_text(
    cs: bytes,
    fonts: dict[str, tuple[int, dict[int, str]]] | None = None,
) -> str:
    """Walk one decoded content stream, collecting text shown by
    Tj / ' / " / TJ inside BT..ET blocks, with newline heuristics on
    the positioning operators. ``fonts`` maps resource names (``F1``)
    to parsed ToUnicode CMaps; the ``Tf`` operator switches the active
    map (no entry -> latin-1 passthrough)."""
    fonts = fonts or {}
    out: list[str] = []
    strings: list[bytes] = []  # strings seen since the last operator
    last_name: str | None = None  # most recent /Name token (Tf operand)
    cmap: tuple[int, dict[int, str]] | None = None
    i, n = 0, len(cs)
    in_bt = False

    def _newline() -> None:
        if out and not out[-1].endswith("\n"):
            out.append("\n")

    def _show(parts: list[bytes]) -> None:
        out.extend(_decode_shown(p, cmap) for p in parts)

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
            j = i
            while j < n and cs[j] not in _WS and cs[j] not in _DELIM:
                j += 1
            last_name = cs[i:j].decode("latin-1")
            i = j
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
            elif tok == b"Tf":
                cmap = fonts.get(last_name or "")
                strings.clear()
            elif in_bt and tok in (b"Tj", b"TJ"):
                _show(strings)
                strings.clear()
            elif in_bt and tok in (b"'", b'"'):
                _newline()  # both mean "next line, then show"
                _show(strings[-1:])
                strings.clear()
            elif in_bt and tok in (b"Td", b"TD", b"T*", b"Tm"):
                _newline()
                strings.clear()
            elif tok and not re.fullmatch(rb"[-+.0-9]+", tok):
                strings.clear()  # any other operator consumes operands
    return "".join(out)


# ---------------------------------------------------------------------------
# Document structure
# ---------------------------------------------------------------------------

def _balanced_dict(data: bytes) -> bytes:
    """The first balanced <<..>> span of ``data`` (contents only)."""
    start = data.find(b"<<")
    if start < 0:
        return b""
    depth = 0
    i = start
    n = len(data)
    while i < n - 1:
        pair = data[i : i + 2]
        if pair == b"<<":
            depth += 1
            i += 2
        elif pair == b">>":
            depth -= 1
            i += 2
            if depth == 0:
                return data[start + 2 : i - 2]
        else:
            i += 1
    return data[start + 2 :]


def _parse_objects(data: bytes) -> dict[int, tuple[bytes, bytes | None]]:
    """All indirect objects: {num: (dict bytes, raw stream body|None)}.
    Objects packed inside compressed object streams (``/Type /ObjStm``,
    PDF 1.5+ writers put pages/fonts there — spec 7.5.7) are expanded
    too: the decoded stream starts with N (objnum, offset) integer
    pairs, then the concatenated dict-only sub-objects at /First."""
    objs: dict[int, tuple[bytes, bytes | None]] = {}
    for m in _OBJ_RE.finditer(data):
        body = m.group(3)
        d = _balanced_dict(body)
        sm = re.search(rb"stream\r?\n", body)
        stream = None
        if sm:
            start = sm.end()
            # /Length is the spec's stream delimiter — honor it when it
            # parses (compressed bodies can coincidentally contain the
            # bytes 'endstream'/'endobj', which would truncate a purely
            # textual scan); fall back to the endstream marker for
            # writers that make /Length an indirect reference.
            lm = re.search(rb"/Length\s+(\d+)(?!\s+\d+\s+R)", d)
            if lm:
                stream = body[start : start + int(lm.group(1))]
            else:
                em = re.search(rb"(.*?)endstream", body[start:], re.DOTALL)
                stream = em.group(1) if em else body[start:]
                if stream.endswith(b"\r\n"):
                    stream = stream[:-2]
                elif stream.endswith(b"\n") or stream.endswith(b"\r"):
                    stream = stream[:-1]
        objs[int(m.group(1))] = (d, stream)
    for num in list(objs):
        d, stream = objs[num]
        if stream is None or not re.search(rb"/Type\s*/ObjStm\b", d):
            continue
        body = _apply_filters(d, stream)
        nm = re.search(rb"/N\s+(\d+)", d)
        fm = re.search(rb"/First\s+(\d+)", d)
        if body is None or not nm or not fm:
            continue
        first = int(fm.group(1))
        try:
            ints = [int(x) for x in body[:first].split()]
        except ValueError:
            continue
        pairs = list(zip(ints[0::2], ints[1::2]))[: int(nm.group(1))]
        for idx, (onum, off) in enumerate(pairs):
            end = (pairs[idx + 1][1] if idx + 1 < len(pairs)
                   else len(body) - first)
            span = body[first + off : first + end]
            # spec: no streams inside an object stream — dict only
            objs.setdefault(onum, (_balanced_dict(span) or span, None))
    return objs


def _refs(d: bytes, key: bytes) -> list[int]:
    """Object numbers referenced by ``/key`` — single ref or array."""
    m = re.search(re.escape(key) + rb"\s*(\[[^\]]*\]|" + _REF_RE + rb")", d)
    if not m:
        return []
    return [int(x) for x in re.findall(_REF_RE, m.group(1))]


def _resolve_dict(objs, d: bytes, key: bytes) -> bytes:
    """Value of ``/key`` as dict bytes: inline <<..>> or resolved ref."""
    m = re.search(re.escape(key) + rb"\s*<<", d)
    if m:
        return _balanced_dict(d[m.end() - 2 :])
    refs = _refs(d, key)
    if refs and refs[0] in objs:
        return objs[refs[0]][0]
    return b""


def _page_fonts(objs, page_dict: bytes):
    """{resource name -> parsed ToUnicode CMap} for one page."""
    res = _resolve_dict(objs, page_dict, b"/Resources")
    fdict = _resolve_dict(objs, res, b"/Font")
    fonts = {}
    for fm in re.finditer(rb"/([^\s/<>\[\]()]+)\s+" + _REF_RE, fdict):
        name, fref = fm.group(1).decode("latin-1"), int(fm.group(2))
        if fref not in objs:
            continue
        font_d = objs[fref][0]
        for tu in _refs(font_d, b"/ToUnicode"):
            if tu in objs and objs[tu][1] is not None:
                body = _apply_filters(objs[tu][0], objs[tu][1])
                if body:
                    fonts[name] = parse_tounicode(body)
    return fonts


def extract_pdf_text(data: bytes) -> str:
    """Extract plain text from raw PDF bytes.

    Structured path: parse the indirect objects, walk ``/Type /Page``
    objects in file order, decode each page's ``/Contents`` chain
    through the filter pipeline, and scan it with the page's fonts
    (ToUnicode CMaps applied per Tf selection) — the reference's
    per-page extract-and-join (loader_pdf_advanced.go:73-81).

    Fallback path (damaged xref / exotic structure): the r5 behavior —
    every decodable stream in the file whose body contains a BT block
    contributes, latin-1 strings only. Returns '' when nothing decodes
    — callers treat that as a parse failure."""
    objs = _parse_objects(data)
    pages: list[str] = []
    for num in objs:
        d, _ = objs[num]
        if not re.search(rb"/Type\s*/Page\b", d):
            continue
        fonts = _page_fonts(objs, d)
        parts: list[bytes] = []
        for cref in _refs(d, b"/Contents"):
            if cref in objs and objs[cref][1] is not None:
                body = _apply_filters(objs[cref][0], objs[cref][1])
                if body is not None:
                    parts.append(body)
        if not parts:
            continue
        text = _content_text(b"\n".join(parts), fonts)
        if text.strip():
            pages.append(text if text.endswith("\n") else text + "\n")
    if pages:
        return "".join(pages)
    # fallback: raw stream scan (r5 behavior)
    for m in _STREAM_RE.finditer(data):
        d, body = m.group("dict"), m.group("body")
        if body.endswith(b"\r\n"):
            body = body[:-2]
        elif body.endswith(b"\n") or body.endswith(b"\r"):
            body = body[:-1]
        decoded = _apply_filters(d, body)
        if decoded is None or b"BT" not in decoded:
            continue
        text = _content_text(decoded)
        if text.strip():
            pages.append(text if text.endswith("\n") else text + "\n")
    return "".join(pages)
