"""S10 loader chain: SmartLoader CLI-first fallback, AutoLoader
extension dispatch, stdlib DOCX parsing, directory scan rules, and the
distributed parse → chunk → embed → link pipeline
(reference pkg/rag/loader_smart.go / loader_auto.go / loader_cli.go /
loader_docx.go / pipeline.go:150-205)."""

from __future__ import annotations

import os
import sys
import zipfile

import pytest

from kektordb_spark.sources import loaders as L

DOCX_XML = """<?xml version="1.0"?>
<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">
 <w:body>
  <w:p><w:pPr><w:pStyle w:val="Heading1"/></w:pPr><w:r><w:t>Title</w:t></w:r></w:p>
  <w:p><w:r><w:t>First </w:t></w:r><w:r><w:t>paragraph.</w:t></w:r></w:p>
  <w:p><w:pPr><w:pStyle w:val="Heading2"/></w:pPr><w:r><w:t>Section</w:t></w:r></w:p>
  <w:p><w:r><w:t>   </w:t></w:r></w:p>
  <w:p><w:r><w:t>Body text.</w:t></w:r></w:p>
 </w:body>
</w:document>"""


def make_docx(path: str, xml: str = DOCX_XML) -> None:
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("[Content_Types].xml", "<Types/>")
        zf.writestr("word/document.xml", xml)


def make_pdf(path: str, content: bytes, compress: bool = False) -> None:
    """A minimal single-page PDF whose page content stream is
    ``content`` (optionally Flate-compressed) — real header, object
    structure, and stream framing, so the fixture exercises the actual
    file format rather than a mock."""
    import zlib

    body = zlib.compress(content) if compress else content
    filt = b" /Filter /FlateDecode" if compress else b""
    objs = [
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n",
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n",
        b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n",
        b"4 0 obj << /Length %d%s >> stream\n%s\nendstream endobj\n"
        % (len(body), filt, body),
    ]
    with open(path, "wb") as fh:
        fh.write(b"%PDF-1.4\n" + b"".join(objs) + b"%%EOF\n")


def test_docx_loader_headings_and_runs(tmp_path):
    p = str(tmp_path / "doc.docx")
    make_docx(p)
    doc = L.DocxLoader().load(p)
    # Heading styles render as markdown; runs concatenate; blank
    # paragraphs are dropped (loader_docx.go:112-131)
    assert doc.text == (
        "# Title\n\nFirst paragraph.\n\n## Section\n\nBody text.\n\n"
    )


def test_docx_loader_rejects_non_zip_and_missing_xml(tmp_path):
    bad = tmp_path / "bad.docx"
    bad.write_text("not a zip")
    with pytest.raises(L.LoaderError, match="zip"):
        L.DocxLoader().load(str(bad))
    nodoc = str(tmp_path / "nodoc.docx")
    with zipfile.ZipFile(nodoc, "w") as zf:
        zf.writestr("other.xml", "<x/>")
    with pytest.raises(L.LoaderError, match="document.xml"):
        L.DocxLoader().load(nodoc)


def test_auto_loader_dispatch(tmp_path):
    (tmp_path / "a.txt").write_text("plain")
    (tmp_path / "b.unknownext").write_text("fallback as text")
    docx = str(tmp_path / "c.docx")
    make_docx(docx)
    auto = L.AutoLoader()
    assert auto.load(str(tmp_path / "a.txt")).text == "plain"
    assert auto.load(str(tmp_path / "b.unknownext")).text == "fallback as text"
    assert auto.load(docx).loader == "docx"
    # a PDF the internal scanner recovers no text from: loud error,
    # never garbage (SmartLoader's CLI route handles these)
    (tmp_path / "d.pdf").write_bytes(b"%PDF-1.4 fake")
    with pytest.raises(L.LoaderError, match="CLI parser"):
        auto.load(str(tmp_path / "d.pdf"))


def test_cli_loader_success_failure_empty(tmp_path):
    f = tmp_path / "x.txt"
    f.write_text("file-content")
    py = sys.executable
    ok = L.CliLoader([py, "-c", "print(open('{{file_path}}').read().upper())"])
    assert ok.load(str(f)).text == "FILE-CONTENT"
    with pytest.raises(L.LoaderError, match="exit"):
        L.CliLoader([py, "-c", "import sys; sys.exit(3)"]).load(str(f))
    with pytest.raises(L.LoaderError, match="empty"):
        L.CliLoader([py, "-c", "pass"]).load(str(f))


def test_smart_loader_cli_first_then_fallback(tmp_path):
    f = tmp_path / "y.txt"
    f.write_text("internal text")
    py = sys.executable
    # CLI succeeds -> its output wins (loader_smart.go:63-70)
    smart = L.SmartLoader([py, "-c", "print('cli-parsed')"])
    assert smart.load(str(f)).text == "cli-parsed"
    # CLI fails -> silent fallback to AutoLoader (loader_smart.go:80-88)
    broken = L.SmartLoader([py, "-c", "import sys; sys.exit(1)"])
    doc = broken.load(str(f))
    assert doc.text == "internal text" and doc.loader == "text"
    # no CLI configured -> AutoLoader directly
    assert L.SmartLoader().load(str(f)).text == "internal text"


def test_scan_directory_rules(tmp_path):
    (tmp_path / "keep.md").write_text("x")
    (tmp_path / "note.txt").write_text("x")
    (tmp_path / ".hidden.txt").write_text("x")
    (tmp_path / "state.aof").write_text("x")
    sub = tmp_path / ".git"
    sub.mkdir()
    (sub / "config.txt").write_text("x")
    ok = tmp_path / "docs"
    ok.mkdir()
    (ok / "deep.txt").write_text("x")
    got = L.scan_directory(str(tmp_path))
    names = [os.path.basename(p) for p in got]
    assert names == ["deep.txt", "keep.md", "note.txt"]
    # include whitelist / exclude blacklist fnmatch the basename
    assert [os.path.basename(p) for p in L.scan_directory(str(tmp_path), include=["*.md"])] == ["keep.md"]
    assert [os.path.basename(p) for p in L.scan_directory(str(tmp_path), exclude=["*.txt"])] == ["keep.md"]


def test_ingest_directory_end_to_end(spark, tmp_path):
    """A non-plaintext file (docx) goes through the fallback chain and
    produces chunk rows + prev/next edges; an unparseable file becomes
    a failure ROW, not a job failure (r3 verdict item 3's 'done')."""
    (tmp_path / "plain.txt").write_text(
        "alpha beta gamma delta epsilon zeta eta theta " * 4
    )
    make_docx(str(tmp_path / "word.docx"))
    (tmp_path / "scan.pdf").write_bytes(b"%PDF-1.4 binary")
    vectors, edges, failures = L.ingest_directory(
        spark, str(tmp_path), now=100, chunk_size=40, overlap=5,
    )
    vrows = vectors.collect()
    by_doc = {}
    for r in vrows:
        by_doc.setdefault(os.path.basename(r["doc_id"]), []).append(r)
    assert set(by_doc) == {"plain.txt", "word.docx"}
    assert len(by_doc["plain.txt"]) > 1  # long text actually chunked
    # docx parsed through the zip/XML chain (markdown heading present)
    assert any("# Title" in r["chunk_text"] for r in by_doc["word.docx"])
    # embeddings: default hash embedder dim
    from kektordb_spark.functions.embedder import DEFAULT_DIM
    assert all(len(r["v"]) == DEFAULT_DIM for r in vrows)
    # prev/next edges exist for multi-chunk docs, both directions
    erows = edges.collect()
    rels = {r["rel"] for r in erows}
    assert rels == {"next_chunk", "prev_chunk"}
    # the PDF fell out as a failure row with the stub's guidance
    frows = failures.collect()
    assert len(frows) == 1 and frows[0]["path"].endswith("scan.pdf")
    assert "CLI parser" in frows[0]["error"]


def test_ingest_directory_cli_parser_handles_pdf(spark, tmp_path):
    """With a parser_command configured, the 'PDF' parses via the CLI
    route (the production path loader_smart.go documents)."""
    (tmp_path / "doc.pdf").write_bytes(b"%PDF fake")
    py = sys.executable
    vectors, edges, failures = L.ingest_directory(
        spark, str(tmp_path),
        parser_command=[py, "-c", "print('pdf text extracted by tool')"],
        chunk_size=100,
    )
    assert failures.count() == 0
    chunks = vectors.collect()
    assert len(chunks) == 1
    assert chunks[0]["chunk_text"] == "pdf text extracted by tool"


PDF_CONTENT = (
    b"BT /F1 12 Tf 72 720 Td (Hello \\(PDF\\) world) Tj ET\n"
    b"BT 72 700 Td [(kerned) -250 (array \\101\\102)] TJ "
    b"T* <48657820627974657321> Tj ET\n"
)


def test_pdf_text_extraction_uncompressed_and_flate(tmp_path):
    """Real .pdf fixtures through the pure-Python scanner: literal
    strings with escapes and nesting, TJ arrays (kerning ignored),
    octal escapes, hex strings, and Flate-compressed streams decode to
    the same text as uncompressed ones."""
    plain = str(tmp_path / "plain.pdf")
    flate = str(tmp_path / "flate.pdf")
    make_pdf(plain, PDF_CONTENT)
    make_pdf(flate, PDF_CONTENT, compress=True)
    loader = L.PdfLoader()
    t1 = loader.load(plain).text
    t2 = loader.load(flate).text
    assert t1 == t2
    assert "Hello (PDF) world" in t1
    assert "kernedarray AB" in t1  # TJ concatenation + octal escapes
    assert "Hex bytes!" in t1
    # positioning operators produced line breaks between shows
    assert t1.index("Hello (PDF) world") < t1.index("kerned")
    assert "\n" in t1.strip()
    # AutoLoader now routes .pdf to the internal scanner
    assert L.AutoLoader().load(plain).loader == "pdf"


def test_pdf_ingest_directory_end_to_end(spark, tmp_path):
    """A real PDF goes scan -> parse -> chunk -> embed with NO CLI
    parser configured (verdict r4 item 7's 'done' shape)."""
    long_content = b"BT " + b" ".join(
        b"(alpha beta gamma delta epsilon zeta) Tj T*" for _ in range(6)
    ) + b" ET"
    make_pdf(str(tmp_path / "doc.pdf"), long_content, compress=True)
    vectors, edges, failures = L.ingest_directory(
        spark, str(tmp_path), now=100, chunk_size=40, overlap=5,
    )
    vrows = vectors.collect()
    assert vrows and all(r["doc_id"].endswith("doc.pdf") for r in vrows)
    assert len(vrows) > 1  # long text actually chunked
    assert any("alpha beta gamma" in r["chunk_text"] for r in vrows)
    from kektordb_spark.functions.embedder import DEFAULT_DIM
    assert all(len(r["v"]) == DEFAULT_DIM for r in vrows)
    assert failures.collect() == []


def test_pdf_no_text_still_falls_back_loudly(tmp_path):
    """Image-only / filter-unsupported PDFs keep the loud-fallback
    contract: LoaderError with CLI-parser guidance (SmartLoader's CLI
    route stays the production path for those)."""
    p = str(tmp_path / "imgonly.pdf")
    make_pdf(p, b"<< /W 1 >> ID \x00\x01\x02 EI")  # no BT text block
    with pytest.raises(L.LoaderError, match="CLI parser"):
        L.PdfLoader().load(p)


def test_pdf_literal_escapes_roundtrip_property():
    """Hypothesis round-trip for the content-stream scanner: arbitrary
    latin-1 text shown via a properly-escaped literal string comes back
    byte-exact — covers the full escape table, nesting, and octal."""
    from hypothesis import given, settings, strategies as st

    from kektordb_spark.sources.pdf import _content_text

    def pdf_escape(s: str) -> bytes:
        out = []
        for ch in s:
            if ch in "()\\":
                out.append("\\" + ch)
            elif ch in "\n\r\t\b\f":
                out.append({"\n": "\\n", "\r": "\\r", "\t": "\\t",
                            "\b": "\\b", "\f": "\\f"}[ch])
            else:
                out.append(ch)
        return "".join(out).encode("latin-1")

    @given(st.text(
        alphabet=st.characters(min_codepoint=1, max_codepoint=255),
        min_size=0, max_size=80,
    ))
    @settings(max_examples=200, deadline=None)
    def check(s):
        cs = b"BT (" + pdf_escape(s) + b") Tj ET"
        got = _content_text(cs)
        # ET appends a trailing newline heuristic; strip exactly that
        assert got.rstrip("\n") == s.rstrip("\n") or got == s + "\n" or got == s
        # strict: text content must round-trip before the ET newline
        assert got[:len(s)] == s

    check()


def test_pdf_hex_strings_and_octal_property():
    """Hex strings decode pairwise with odd-digit zero padding; octal
    escapes cover the full byte range."""
    from hypothesis import given, settings, strategies as st

    from kektordb_spark.sources.pdf import _content_text

    @given(st.binary(min_size=0, max_size=40))
    @settings(max_examples=100, deadline=None)
    def check_hex(bs):
        cs = b"BT <" + bs.hex().encode() + b"> Tj ET"
        assert _content_text(cs).rstrip("\n") == bs.decode("latin-1").rstrip("\n")

    check_hex()

    @given(st.integers(min_value=0, max_value=255))
    @settings(max_examples=50, deadline=None)
    def check_octal(b):
        cs = ("BT (\\%03o) Tj ET" % b).encode()
        assert _content_text(cs)[:1] == chr(b)

    check_octal()


# ---------------------------------------------------------------------------
# r6: LZWDecode + ToUnicode CMaps (closes the r5 "CLI fallback" gaps)
# ---------------------------------------------------------------------------

def _lzw_encode(data: bytes, early: int = 1) -> bytes:
    """Reference LZW encoder (spec 7.4.4) used only to generate test
    vectors: 9-bit start, 256=clear, 257=EOD, EarlyChange-aware width
    bumps, clear-on-full-table. r7: the encoder bumps one code after
    the decoder's table-length trigger because the decoder's table
    lags the encoder's by exactly one entry (the decoder can only
    build entry N when it learns the first byte of code N+1) — so
    `next_code + early - 1 >= 2^width` here pairs with the decoder's
    `len(table) + early >= 2^width` (the pdfminer/pdf.js schedule:
    bump at decoder-table len 511/1023/2047 for EarlyChange=1)."""
    def fresh():
        return {bytes([i]): i for i in range(256)}

    table = fresh()
    next_code = 258
    width = 9
    out = bytearray()
    bitbuf = bitcnt = 0

    def emit(code):
        nonlocal bitbuf, bitcnt
        bitbuf = (bitbuf << width) | code
        bitcnt += width
        while bitcnt >= 8:
            out.append((bitbuf >> (bitcnt - 8)) & 0xFF)
            bitcnt -= 8

    emit(256)
    w = b""
    for b in data:
        wc = w + bytes([b])
        if wc in table:
            w = wc
            continue
        emit(table[w])
        if next_code < 4096:
            table[wc] = next_code
            next_code += 1
            if next_code + early - 1 >= (1 << width) and width < 12:
                width += 1
        else:
            emit(256)  # table full: clear and restart (spec 7.4.4.2)
            table = fresh()
            next_code = 258
            width = 9
        w = bytes([b])
    if w:
        emit(table[w])
    emit(257)
    if bitcnt:
        out.append((bitbuf << (8 - bitcnt)) & 0xFF)
    return bytes(out)


def _lzw_decode_pdfjs_style(data: bytes, early: int = 1) -> bytes:
    """Independent oracle decoder for the cross-check below, written
    to pdf.js's LZWStream structure (flat prev-code/last-byte arrays +
    an explicit nextCode counter, bump when nextCode + earlyChange
    reaches 512/1024/2048) rather than the byte-string table of
    sources/pdf._lzw_decode — so a shared off-by-one between our
    encoder and decoder (the r6 bug class) cannot hide: this decoder's
    width schedule is pinned to the published pdf.js semantics."""
    prev_codes = [0] * 4096
    last_bytes = list(range(256)) + [0, 0] + [0] * 3838
    lengths = [1] * 258 + [0] * 3838
    next_code = 258
    width = 9
    bitbuf = bitcnt = 0
    out = bytearray()
    prev_code = None
    first_byte = 0

    def expand(code):
        seq = bytearray()
        while lengths[code] > 1:
            seq.append(last_bytes[code])
            code = prev_codes[code]
        seq.append(last_bytes[code])
        seq.reverse()
        return bytes(seq)

    for byte in data:
        bitbuf = (bitbuf << 8) | byte
        bitcnt += 8
        while bitcnt >= width:
            code = (bitbuf >> (bitcnt - width)) & ((1 << width) - 1)
            bitcnt -= width
            if code == 256:
                next_code = 258
                width = 9
                prev_code = None
                continue
            if code == 257:
                return bytes(out)
            if code < next_code:
                seq = expand(code)
            elif code == next_code and prev_code is not None:
                seq = expand(prev_code) + bytes([first_byte])
            else:
                raise ValueError("pdfjs-style: bad code")
            if prev_code is not None and next_code < 4096:
                prev_codes[next_code] = prev_code
                last_bytes[next_code] = seq[0]
                lengths[next_code] = lengths[prev_code] + 1
                next_code += 1
            first_byte = seq[0]
            out += seq
            prev_code = code
            if next_code + early >= (1 << width) and width < 12:
                width += 1
    return bytes(out)


GOLDEN_LZW_SHA256 = (
    "55ad5856037cbc0a8e0bd650da6c4afa4c8d95b80aa00ad2a3133e69aaa83d3f")


def test_lzw_roundtrip_property():
    from hypothesis import given, settings, strategies as st

    from kektordb_spark.sources.pdf import _lzw_decode

    @given(st.binary(min_size=0, max_size=4000),
           st.sampled_from([0, 1]))
    @settings(max_examples=150, deadline=None)
    def check(bs, early):
        enc = _lzw_encode(bs, early)
        assert _lzw_decode(enc, early) == bs
        # the independent pdf.js-structured decoder must agree — this
        # is what catches an encoder/decoder SHARED off-by-one (r6's
        # bug class, invisible to round-trip alone)
        assert _lzw_decode_pdfjs_style(enc, early) == bs

    check()
    # long repetitive input crosses the 9->10->11 bit width bumps
    big = b"abcab" * 2000
    assert _lzw_decode(_lzw_encode(big)) == big
    assert _lzw_decode_pdfjs_style(_lzw_encode(big)) == big


def test_lzw_width_bump_and_full_table():
    """r6 ADVICE (high): the r6 decoder bumped the code width one
    table entry late (`len + early - 1`), desyncing from the
    pdfminer/pdf.js schedule (bump at table len 511/1023/2047 for
    EarlyChange=1) on any stream adding >~253 entries. Pin the fixed
    behavior with inputs that march straight through every bump and
    through a full-table clear, for both EarlyChange values, and
    cross-check our decoder against the independently-structured
    pdf.js-style decoder on the identical byte stream."""
    import hashlib
    import random

    from kektordb_spark.sources.pdf import _lzw_decode

    rng = random.Random(20260815)
    cases = [
        # ~20k random bytes: >4096 table adds -> clear-on-full path
        bytes(rng.randrange(256) for _ in range(20000)),
        # low-entropy: long entries, different add cadence
        bytes(rng.randrange(4) for _ in range(30000)),
        # exactly enough adds to straddle the 9->10 bump region
        bytes(rng.randrange(256) for _ in range(300)),
    ]
    for early in (0, 1):
        for data in cases:
            enc = _lzw_encode(data, early)
            assert _lzw_decode(enc, early) == data
            assert _lzw_decode_pdfjs_style(enc, early) == data
    # pinned golden: deterministic input + encoded-byte digest so a
    # future "fix" to either side of the mirror pair breaks loudly
    golden_in = bytes((i * 7 + (i >> 3)) & 0xFF for i in range(6000))
    enc = _lzw_encode(golden_in, 1)
    assert hashlib.sha256(enc).hexdigest() == GOLDEN_LZW_SHA256
    assert _lzw_decode(enc, 1) == golden_in
    assert _lzw_decode_pdfjs_style(enc, 1) == golden_in


def test_pdf_png_predictor_objstm():
    """r6 ADVICE: /DecodeParms /Predictor on FlateDecode (ubiquitous
    on /ObjStm in PDF 1.5+ writers) was ignored — the stream
    decompressed fine but yielded predictor-coded garbage. PNG Up
    (12), Sub (11), Paeth (15) and TIFF (2) must reverse exactly;
    an unsupported predictor config must skip the stream (None), not
    consume wrong bytes."""
    import zlib

    from kektordb_spark.sources.pdf import _apply_filters, _unpredict

    raw = bytes((i * 31 + 5) & 0xFF for i in range(400))  # 20 rows x 20
    cols = 20

    def png_encode(data, tag, bpp=1):
        out = bytearray()
        prior = bytearray(cols)
        for r in range(0, len(data), cols):
            row = bytearray(data[r : r + cols])
            enc = bytearray(row)
            if tag == 1:
                for i in range(cols - 1, bpp - 1, -1):
                    enc[i] = (row[i] - row[i - bpp]) & 0xFF
            elif tag == 2:
                for i in range(cols):
                    enc[i] = (row[i] - prior[i]) & 0xFF
            elif tag == 4:
                for i in range(cols):
                    a = row[i - bpp] if i >= bpp else 0
                    b = prior[i]
                    c = prior[i - bpp] if i >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pr = a if (pa <= pb and pa <= pc) else (
                        b if pb <= pc else c)
                    enc[i] = (row[i] - pr) & 0xFF
            out.append(tag)
            out += enc
            prior = row
        return bytes(out)

    for tag, pred in ((2, 12), (1, 11), (4, 15)):
        coded = png_encode(raw, tag)
        d = (b"/Filter /FlateDecode /DecodeParms << /Predictor %d "
             b"/Columns %d >>" % (pred, cols))
        got = _apply_filters(d, zlib.compress(coded))
        assert got == raw, f"predictor {pred} failed"
    # TIFF predictor 2 (8-bit): horizontal differencing, no tag bytes
    tiff = bytearray()
    for r in range(0, len(raw), cols):
        row = raw[r : r + cols]
        tiff.append(row[0])
        for i in range(1, cols):
            tiff.append((row[i] - row[i - 1]) & 0xFF)
    d2 = (b"/Filter /FlateDecode /DecodeParms << /Predictor 2 "
          b"/Columns %d >>" % cols)
    assert _apply_filters(d2, zlib.compress(bytes(tiff))) == raw
    # unsupported: TIFF predictor at bpc=4 -> loud skip
    assert _unpredict(b"\x00" * 10, 2, 20, 1, 4) is None
    d3 = (b"/Filter /FlateDecode /DecodeParms << /Predictor 2 "
          b"/Columns 20 /BitsPerComponent 4 >>")
    assert _apply_filters(d3, zlib.compress(bytes(tiff))) is None


def test_pdf_lzw_stream_extracts():
    """An /LZWDecode content stream now extracts in-process (was a
    documented skip-to-CLI-fallback in r5)."""
    from kektordb_spark.sources.pdf import extract_pdf_text

    content = b"BT (lzw compressed words) Tj ET"
    body = _lzw_encode(content)
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Page /Contents 2 0 R >> endobj\n"
        b"2 0 obj << /Length " + str(len(body)).encode()
        + b" /Filter /LZWDecode >> stream\n" + body
        + b"\nendstream endobj\n%%EOF\n"
    )
    assert "lzw compressed words" in extract_pdf_text(pdf)


def test_pdf_tounicode_cid_font_maps_hex_strings(tmp_path):
    """A CID-style font whose hex strings are 2-byte codes mapped
    through a /ToUnicode CMap (bfchar + both bfrange forms) extracts
    real text (was latin-1 garbage in r5). The CMap stream itself is
    Flate-compressed, covering filter handling on non-content
    streams."""
    import zlib

    from kektordb_spark.sources.pdf import extract_pdf_text

    cmap = (
        b"/CIDInit /ProcSet findresource begin\n"
        b"1 begincodespacerange <0000> <FFFF> endcodespacerange\n"
        b"3 beginbfchar\n"
        b"<0041> <0048>\n"          # 0x41 -> 'H'
        b"<0042> <0065>\n"          # 0x42 -> 'e'
        b"<0050> <00470021>\n"      # 0x50 -> 'G!' (multi-char dst)
        b"endbfchar\n"
        b"2 beginbfrange\n"
        b"<0060> <0062> <006C>\n"   # 0x60..0x62 -> 'l','m','n'
        b"<0070> <0071> [<006F> <0021>] \n"  # list form: 'o','!'
        b"endbfrange\nendcmap\n"
    )
    cz = zlib.compress(cmap)
    # content: select /F9 then show H e l l o via 2-byte codes
    content = b"BT /F9 12 Tf <00410042006000600070> Tj ET"
    objs = [
        b"1 0 obj << /Type /Page /Contents 2 0 R "
        b"/Resources << /Font << /F9 3 0 R >> >> >> endobj\n",
        b"2 0 obj << /Length %d >> stream\n%s\nendstream endobj\n"
        % (len(content), content),
        b"3 0 obj << /Type /Font /Subtype /Type0 /ToUnicode 4 0 R >>"
        b" endobj\n",
        b"4 0 obj << /Length %d /Filter /FlateDecode >> stream\n%s\n"
        b"endstream endobj\n" % (len(cz), cz),
    ]
    pdf = b"%PDF-1.5\n" + b"".join(objs) + b"%%EOF\n"
    got = extract_pdf_text(pdf)
    assert "Hello" in got
    # multi-char bfchar destination and the list-form range
    content2 = b"BT /F9 12 Tf <00500071> Tj ET"
    pdf2 = pdf.replace(content, content2.ljust(len(content)))
    assert "G!!" in extract_pdf_text(pdf2)


def test_pdf_tounicode_only_applies_to_selected_font(tmp_path):
    """A second font WITHOUT /ToUnicode falls back to latin-1 in the
    same page — the Tf operator scopes the mapping."""
    from kektordb_spark.sources.pdf import extract_pdf_text

    cmap = b"1 beginbfchar <0041> <005A> endbfchar\n"  # 0x41 -> 'Z'
    content = (b"BT /F1 12 Tf <0041> Tj ET\n"
               b"BT /F2 12 Tf (plain latin) Tj ET")
    objs = [
        b"1 0 obj << /Type /Page /Contents 2 0 R /Resources << /Font "
        b"<< /F1 3 0 R /F2 5 0 R >> >> >> endobj\n",
        b"2 0 obj << /Length %d >> stream\n%s\nendstream endobj\n"
        % (len(content), content),
        b"3 0 obj << /Type /Font /ToUnicode 4 0 R >> endobj\n",
        b"4 0 obj << /Length %d >> stream\n%s\nendstream endobj\n"
        % (len(cmap), cmap),
        b"5 0 obj << /Type /Font /Subtype /TrueType >> endobj\n",
    ]
    pdf = b"%PDF-1.5\n" + b"".join(objs) + b"%%EOF\n"
    got = extract_pdf_text(pdf)
    assert "Z" in got and "plain latin" in got


def test_pdf_chained_ascii85_flate_filter():
    from kektordb_spark.sources.pdf import extract_pdf_text
    import base64
    import zlib

    content = b"BT (chained filters work) Tj ET"
    body = base64.a85encode(zlib.compress(content)) + b"~>"
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Page /Contents 2 0 R >> endobj\n"
        b"2 0 obj << /Length " + str(len(body)).encode()
        + b" /Filter [/ASCII85Decode /FlateDecode] >> stream\n" + body
        + b"\nendstream endobj\n%%EOF\n"
    )
    assert "chained filters work" in extract_pdf_text(pdf)


def test_pdf_multipart_contents_array():
    """/Contents [a 0 R b 0 R]: parts join in array order."""
    from kektordb_spark.sources.pdf import extract_pdf_text

    c1, c2 = b"BT (part one) Tj ET", b"BT (part two) Tj ET"
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Page /Contents [2 0 R 3 0 R] >> endobj\n"
        + (b"2 0 obj << /Length %d >> stream\n%s\nendstream endobj\n"
           % (len(c1), c1))
        + (b"3 0 obj << /Length %d >> stream\n%s\nendstream endobj\n"
           % (len(c2), c2))
        + b"%%EOF\n"
    )
    got = extract_pdf_text(pdf)
    assert "part one" in got and "part two" in got
    assert got.index("part one") < got.index("part two")


def test_pdf_objstm_page_and_font_expand():
    """PDF 1.5+ writers pack page/font dicts into compressed object
    streams (/Type /ObjStm); the scanner expands them, so a modern PDF
    whose ONLY top-level objects are the content stream and the ObjStm
    still extracts — including the ToUnicode mapping of a font defined
    inside the ObjStm."""
    import zlib

    from kektordb_spark.sources.pdf import extract_pdf_text

    cmap = b"1 beginbfchar <0041> <0057> endbfchar\n"  # 0x41 -> 'W'
    page = (b"<< /Type /Page /Contents 2 0 R /Resources "
            b"<< /Font << /F1 5 0 R >> >> >>")
    font = b"<< /Type /Font /ToUnicode 4 0 R >>"
    sub = page + b" " + font
    header = b"1 0 5 %d " % (len(page) + 1)
    objstm_body = header + sub
    first = len(header)
    oz = zlib.compress(objstm_body)
    content = b"BT /F1 9 Tf <0041> Tj /F2 9 Tf (ord) Tj ET"
    objs = [
        b"3 0 obj << /Type /ObjStm /N 2 /First %d /Length %d "
        b"/Filter /FlateDecode >> stream\n%s\nendstream endobj\n"
        % (first, len(oz), oz),
        b"2 0 obj << /Length %d >> stream\n%s\nendstream endobj\n"
        % (len(content), content),
        b"4 0 obj << /Length %d >> stream\n%s\nendstream endobj\n"
        % (len(cmap), cmap),
    ]
    pdf = b"%PDF-1.5\n" + b"".join(objs) + b"%%EOF\n"
    got = extract_pdf_text(pdf)
    assert "W" in got and "ord" in got


def test_lzw_early_change_zero_honored():
    """/DecodeParms << /EarlyChange 0 >> switches the width-bump rule;
    the decoder must follow the dict, not assume the default."""
    from kektordb_spark.sources.pdf import _lzw_decode, extract_pdf_text

    big = b"xyzxy" * 1500
    enc0 = _lzw_encode(big, early=0)
    assert _lzw_decode(enc0, early=0) == big
    content = b"BT (early change zero) Tj ET"
    body = _lzw_encode(content, early=0)
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Page /Contents 2 0 R >> endobj\n"
        b"2 0 obj << /Length " + str(len(body)).encode()
        + b" /Filter /LZWDecode /DecodeParms << /EarlyChange 0 >> >>"
        b" stream\n" + body + b"\nendstream endobj\n%%EOF\n"
    )
    assert "early change zero" in extract_pdf_text(pdf)


def test_pdf_length_key_beats_textual_endstream_scan():
    """A stream body may CONTAIN the bytes 'endstream' (string data, or
    compressed bytes by coincidence); the spec's /Length key is the
    real delimiter and must win over the textual scan."""
    from kektordb_spark.sources.pdf import extract_pdf_text

    content = b"BT (before endstream after) Tj ET"
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Page /Contents 2 0 R >> endobj\n"
        + (b"2 0 obj << /Length %d >> stream\n%s\nendstream endobj\n"
           % (len(content), content))
        + b"%%EOF\n"
    )
    assert "before endstream after" in extract_pdf_text(pdf)
