"""Spark operator tests: staged element pipeline, streaming adapter,
multimodal plumbing, figure detection, export formats."""

from __future__ import annotations

import datetime as dt
import struct

import pytest
from pyspark.sql import Row, functions as F


# cc_docs fixture lives in conftest.py (shared with test_job_cli.py)


def test_parse_elements_relation(spark, cc_docs):
    from smoldocling_ocr_spark.operators.stages import parse_elements

    elements = parse_elements(cc_docs).cache()
    assert elements.count() > 100
    kinds = {r["type"] for r in elements.select("type").distinct().collect()}
    assert "text" in kinds and "table" in kinds
    # layout payloads carry full bboxes
    with_bbox = elements.filter(F.col("x0").isNotNull())
    assert with_bbox.count() > 0


def test_analyze_layout_grouped_map(spark, cc_docs):
    from smoldocling_ocr_spark.operators.stages import analyze_layout, parse_elements

    layout_docs = cc_docs.filter(F.col("url").contains("/layout/")).limit(3)
    elements = parse_elements(layout_docs)
    analyzed = analyze_layout(elements).cache()
    assert analyzed.count() == elements.count()
    roles = {r["semantic_role"] for r in analyzed.select("semantic_role").distinct().collect()}
    assert "paragraph" in roles
    # reading order is 1..N per page
    per_page = analyzed.groupBy("url", "page").agg(
        F.min("reading_order").alias("lo"), F.max("reading_order").alias("hi"), F.count("*").alias("n")
    )
    for r in per_page.collect():
        assert r["lo"] == 1
        assert r["hi"] <= r["n"] + 1  # low-conf postfix may share rank N+1


def test_table_membership_anti_join(spark, cc_docs):
    from smoldocling_ocr_spark.operators.stages import parse_elements, table_membership_filter

    elements = parse_elements(cc_docs.filter(F.col("url").contains("/layout/")))
    texts = elements.filter(F.col("type") == "text")
    kept = table_membership_filter(elements)
    assert kept.count() <= texts.count()


def test_streaming_foreachbatch(spark, cc_docs, tmp_path):
    from smoldocling_ocr_spark.streaming.adapter import start_extract_stream

    src = str(tmp_path / "src")
    cc_docs.limit(6).write.parquet(src)
    stream = spark.readStream.schema(cc_docs.schema).parquet(src)
    q = start_extract_stream(
        stream, str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    out = spark.read.parquet(str(tmp_path / "out"))
    assert out.count() == 6
    assert "markdown" in out.columns


def _png_bytes(width: int, height: int) -> bytes:
    return (
        b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\rIHDR" + struct.pack(">II", width, height) + b"\x08\x06" + b"\x00" * 100
    )


def test_multimodal_probe_and_features(spark):
    from smoldocling_ocr_spark.operators.multimodal import extract_features, frame_sample, probe_media

    rows = [
        Row(key="a", media=bytearray(_png_bytes(640, 480))),
        Row(key="b", media=bytearray(b"GIF89a" + struct.pack("<HH", 32, 16) + b"\0" * 50)),
        Row(key="c", media=bytearray(b"\x00\x01garbage" * 20)),
    ]
    df = spark.createDataFrame(rows)
    meta = {r["key"]: r for r in probe_media(df).collect()}
    assert meta["a"]["format"] == "png" and meta["a"]["width"] == 640 and meta["a"]["height"] == 480
    assert meta["b"]["format"] == "gif" and meta["b"]["width"] == 32
    assert meta["c"]["format"] == "unknown"

    feats = {r["key"]: r["features"] for r in extract_features(df).collect()}
    assert len(feats["a"]) == 64
    assert abs(sum(feats["a"]) - 1.0) < 1e-3  # normalized histogram

    frames = frame_sample(df, n_frames=4).collect()
    assert len(frames) == 12
    offsets = sorted(r["byte_offset"] for r in frames if r["key"] == "a")
    assert offsets[0] == 0 and offsets[-1] > 0


def test_decode_image_stub_and_fake():
    from smoldocling_ocr_spark.operators.multimodal import decode_image

    # truncated/markerless JPEG → decoder error, never a bogus array
    with pytest.raises(ValueError):
        decode_image(b"\xff\xd8\xff\xe0" + b"\x00" * 64)
    # arithmetic-coded JPEG (SOF10) → declared unsupported
    # (progressive SOF2 is a real decode path since r3 — test_imagedec.py)
    with pytest.raises(NotImplementedError):
        decode_image(
            b"\xff\xd8\xff\xca" + struct.pack(">H", 11)
            + struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
        )
    fake = decode_image(_png_bytes(8, 8), fake=True)
    assert fake.shape == (8, 8, 3)


def _encode_png(px, filters):
    """Minimal PNG encoder for test fixtures: 8-bit RGB, one chosen filter
    type per row (exercises every unfilter branch in the decoder)."""
    import struct
    import zlib

    import numpy as np

    h, w, ch = px.shape
    raw = bytearray()
    prev = np.zeros(w * ch, dtype=np.int16)
    for y, f in zip(range(h), filters):
        line = px[y].reshape(-1).astype(np.int16)
        out = line.copy()
        for x in range(w * ch):
            a = int(line[x - ch]) if x >= ch else 0
            b = int(prev[x])
            c = int(prev[x - ch]) if x >= ch else 0
            if f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            elif f == 4:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            else:
                pred = 0
            out[x] = (int(line[x]) - pred) & 0xFF
        raw += bytes([f]) + bytes(out.astype(np.uint8))
        prev = line

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_decode_png_real():
    """The PNG decode path is REAL (stdlib zlib + unfiltering): pixel-exact
    round-trip through an independently-written encoder, one row per filter
    type 0-4."""
    import numpy as np

    from smoldocling_ocr_spark.operators.multimodal import decode_image

    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
    for filters in ([0, 1, 2, 3, 4], [4, 4, 4, 4, 4], [0, 0, 0, 0, 0]):
        data = _encode_png(px, filters)
        got = decode_image(data)
        assert got.shape == (5, 7, 3)
        assert np.array_equal(got, px), f"filters={filters}"


def test_decode_bmp_real():
    import numpy as np
    import struct

    from smoldocling_ocr_spark.operators.multimodal import decode_image

    rng = np.random.default_rng(4)
    px = rng.integers(0, 256, size=(3, 5, 3), dtype=np.uint8)
    h, w, _ = px.shape
    stride = (w * 3 + 3) & ~3
    rows = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        line = px[y, :, ::-1].tobytes()  # RGB → BGR
        rows += line + b"\x00" * (stride - len(line))
    header = b"BM" + struct.pack("<IHHI", 54 + len(rows), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(rows), 2835, 2835, 0, 0)
    got = decode_image(header + dib + rows)
    assert np.array_equal(got, px)


def test_occupancy_grid_figures():
    from smoldocling_ocr_spark.functions.figures import detect_figure_regions

    # text fills the page except a 200x200 hole at (300..500, 300..500)
    boxes = []
    for y in range(0, 800, 50):
        for x in range(0, 800, 50):
            if 300 <= x < 500 and 300 <= y < 500:
                continue
            boxes.append((x, y, x + 50, y + 50))
    regions = detect_figure_regions(800, 800, boxes)
    assert len(regions) == 1
    assert regions[0]["bbox"] == (300, 300, 500, 500)
    assert regions[0]["content"] == "[Figure: 200x200px]"
    # no text at all → no regions (reference early-exit)
    assert detect_figure_regions(800, 800, []) == []


def test_export_formats():
    from smoldocling_ocr_spark.functions.formats import count_stats, estimate_quality_score, markdown_to_html, markdown_to_txt

    md = "## Title\n\nSome **bold** and `code`.\n\n| A | B |\n|---|---|\n| 1 | 2 |\n\n- item one\n"
    txt = markdown_to_txt(md)
    assert "Title" in txt and "#" not in txt and "**" not in txt
    html = markdown_to_html(md)
    assert "<h2>Title</h2>" in html
    assert "<table>" in html and "<th>A</th>" in html and "<td>1</td>" in html
    assert "<li>item one</li>" in html
    words, chars = count_stats(md)
    assert words > 0 and chars == len(md)
    assert estimate_quality_score(md, "layout_ocr") == 50 + 20 + 10 + 10


def test_resume_and_lineage(spark, cc_docs):
    from smoldocling_ocr_spark.operators.lineage import extraction_metrics, partition_lineage
    from smoldocling_ocr_spark.operators.pipeline import extract_documents

    extracted = extract_documents(cc_docs.limit(10), num_partitions=4).cache()
    metrics = extraction_metrics(extracted).collect()[0]
    assert metrics["docs"] == 10
    assert metrics["parse_failures"] == 0
    lineage = partition_lineage(cc_docs.limit(10)).collect()
    assert sum(r["doc_count"] for r in lineage) == 10
    assert all(r["bytes_processed"] > 0 for r in lineage if r["doc_count"])


def test_extraction_lineage_same_pass(spark, cc_docs):
    """north_rule lineage: the fused pass stamps partition_id/payload_bytes,
    so per-partition doc/parse-failure/byte counts come from a plain agg of
    the extracted table — including failure counts per split."""
    import datetime as dt
    from pyspark.sql import Row
    from smoldocling_ocr_spark.operators.lineage import extraction_lineage
    from smoldocling_ocr_spark.operators.pipeline import extract_documents

    bad = spark.createDataFrame(
        [Row(url="https://x/corrupt", warc_ts=dt.datetime(2024, 1, 1),
             html=bytearray(b"DOCLAYv1\n{oops"), text="", lang="en")]
    )
    docs = cc_docs.limit(9).unionByName(bad)
    extracted = extract_documents(docs, num_partitions=4).cache()
    rows = extraction_lineage(extracted).collect()
    assert sum(r["doc_count"] for r in rows) == 10
    assert sum(r["parse_failure_count"] for r in rows) == 1
    assert sum(r["bytes_processed"] for r in rows) > 0
    assert all(r["partition_id"] >= 0 for r in rows)
    assert all(r["min_url"] <= r["max_url"] for r in rows)


def test_pdf_parse_failure_counted_in_lineage(spark, cc_docs):
    """A corrupt %PDF- payload routes to the text fallback with the
    DISTINCT pdf_parse_failed method (extraction succeeds, parse_failed
    stays false) and lineage counts it separately from hard failures
    (VERDICT r3 task 5)."""
    import datetime as dt
    from pyspark.sql import Row
    from smoldocling_ocr_spark.operators.lineage import extraction_lineage, extraction_metrics
    from smoldocling_ocr_spark.operators.pipeline import extract_documents

    bad_pdf = spark.createDataFrame(
        [Row(url="https://x/corrupt.pdf", warc_ts=dt.datetime(2024, 1, 1),
             html=bytearray(b"%PDF-1.4\nnot a real pdf"), text="salvaged text body",
             lang="en")]
    )
    docs = cc_docs.limit(9).unionByName(bad_pdf)
    extracted = extract_documents(docs, num_partitions=4).cache()
    row = extracted.filter("url = 'https://x/corrupt.pdf'").collect()[0]
    assert row["method"] == "pdf_parse_failed"
    assert row["parse_failed"] is False  # routed, not lost
    assert "salvaged text body" in row["markdown"]
    rows = extraction_lineage(extracted).collect()
    assert sum(r["pdf_parse_failure_count"] for r in rows) == 1
    assert sum(r["parse_failure_count"] for r in rows) == 0
    metrics = extraction_metrics(extracted).collect()[0]
    assert metrics["pdf_parse_failures"] == 1 and metrics["parse_failures"] == 0


def test_corrupt_payload_captured(spark):
    from smoldocling_ocr_spark.operators.pipeline import extract_documents

    bad = spark.createDataFrame(
        [Row(url="https://x/bad", warc_ts=dt.datetime(2024, 1, 1), html=bytearray(b"DOCLAYv1\n{oops"), text="", lang="en")]
    )
    out = extract_documents(bad, salt=False).collect()
    assert out[0]["parse_failed"] is True


def test_oversized_payload_tier_routing(spark, cc_docs):
    """A >8MB payload must route to the oversized side of split_by_tier and
    still extract (text-fallback path) in the dedicated low-parallelism
    pass; normal docs are untouched."""
    import datetime as dt
    from pyspark.sql import Row
    from smoldocling_ocr_spark.operators.pipeline import extract_documents, split_by_tier

    giant = spark.createDataFrame(
        [
            Row(
                url="https://giant.example.com/big",
                warc_ts=dt.datetime(2024, 1, 1),
                html=bytearray(b"x" * (9 * 1024 * 1024)),
                text="fallback text for the oversized document. " * 8,
                lang="en",
            )
        ]
    )
    docs = cc_docs.limit(4).unionByName(giant)
    normal, oversized = split_by_tier(docs)
    assert normal.count() == 4
    big = oversized.collect()
    assert len(big) == 1 and big[0]["url"] == "https://giant.example.com/big"
    out = extract_documents(oversized, num_partitions=2, salt=False).collect()
    assert len(out) == 1 and out[0]["markdown"]


def test_empty_input_yields_empty_output(spark, cc_docs):
    from smoldocling_ocr_spark.operators.pipeline import extract_documents

    out = extract_documents(cc_docs.limit(0))
    assert out.count() == 0
    # schema survives the empty path (Arrow empty-batch handling)
    assert "markdown" in out.columns and "parse_failed" in out.columns


def test_streaming_windowed_watermark_agg(spark, tmp_path):
    """Event-time tumbling window + watermark over a streamed events table;
    the batch run of the same relation is the oracle (complete mode drains
    all windows under availableNow)."""
    from smoldocling_ocr_spark.streaming.windowed import windowed_event_counts

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src = str(tmp_path / "ev_src")
    events.write.parquet(src)

    stream = spark.readStream.schema(events.schema).parquet(src)
    q = (
        windowed_event_counts(stream)
        .writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["window_start"], r["event_type"]): (r["n"], r["value_sum"])
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    want = {
        (r["window_start"], r["event_type"]): (r["n"], r["value_sum"])
        for r in windowed_event_counts(events).collect()
    }
    assert got == want and len(got) > 1


def test_streaming_stateful_first_seen_dedup(spark, cc_docs, tmp_path):
    """applyInPandasWithState first-seen filter: duplicates split across two
    microbatches (maxFilesPerTrigger=1) must dedup ACROSS batches via the
    state store, not just within one batch."""
    import datetime as dt
    from pyspark.sql import functions as F
    from smoldocling_ocr_spark.streaming.stateful import first_seen_filter

    base = cc_docs.limit(4).cache()
    src = str(tmp_path / "dup_src")
    base.coalesce(1).write.parquet(src)  # batch 1: originals (one file)
    # batch 2: re-crawls of the same urls, later warc_ts
    base.withColumn(
        "warc_ts", F.col("warc_ts") + F.expr("INTERVAL 1 DAY")
    ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(base.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        first_seen_filter(stream)
        .writeStream.format("memory")
        .queryName("first_seen")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    out = spark.sql("SELECT url, warc_ts FROM first_seen").collect()
    assert len(out) == 4
    firsts = {r["url"]: r["warc_ts"] for r in base.select("url", "warc_ts").collect()}
    got = {r["url"]: r["warc_ts"] for r in out}
    assert set(got) == set(firsts)
    # every emitted row is the earliest crawl of its url
    assert all(got[u] == min(firsts[u], firsts[u] + dt.timedelta(days=1)) for u in got)


def test_extraction_lineage_run_pass_discriminators(spark, cc_docs):
    """TaskContext partition ids restart at 0 per pass/run; when the table
    carries (run_id, extract_pass) stamps the lineage groupBy must keep
    same-numbered partitions from different passes apart (ADVICE r01)."""
    from smoldocling_ocr_spark.operators.lineage import extraction_lineage
    from smoldocling_ocr_spark.operators.pipeline import extract_documents

    # cache so both union branches reuse the SAME materialized rows (a live
    # union would renumber the second branch's partitions stage-wide)
    base = extract_documents(cc_docs.limit(8), num_partitions=2).cache()
    base.count()
    both = (
        base.withColumn("run_id", F.lit("r1")).withColumn("extract_pass", F.lit("normal"))
        .unionByName(
            base.withColumn("run_id", F.lit("r1")).withColumn("extract_pass", F.lit("oversized"))
        )
    )
    rows = extraction_lineage(both).collect()
    assert {"run_id", "extract_pass", "partition_id"} <= set(rows[0].asDict())
    keys = [(r["run_id"], r["extract_pass"], r["partition_id"]) for r in rows]
    assert len(keys) == len(set(keys))
    # same partition_id appears once per pass, never merged
    passes_per_pid = {}
    for r in rows:
        passes_per_pid.setdefault(r["partition_id"], set()).add(r["extract_pass"])
    assert any(len(v) == 2 for v in passes_per_pid.values())
    assert sum(r["doc_count"] for r in rows) == 16


def test_scan_path_emits_grid_figures_in_flow():
    """Grid-detected figure regions reach the markdown on the scan path:
    appended AFTER layout analysis with no reading_order (structure_engine.py
    :384-411), so the (reading_order or 0, y) render sort places them first
    on their page, and text reading order / column count are unperturbed."""
    from smoldocling_ocr_spark.functions.extract import extract_document, decode_payload, run_layout_analysis
    from smoldocling_ocr_spark.sources.corpus import generate_rows
    from smoldocling_ocr_spark.functions import layoutcodec

    rows = [r for r in generate_rows(60) if layoutcodec.is_layout_payload(bytes(r["html"]))]
    assert rows
    r = rows[0]
    res = extract_document(r["url"], r["warc_ts"], bytes(r["html"]), r["text"])
    assert res["method"] == "layout_ocr"
    md = res["markdown"]
    assert "[Figure:" in md
    # the grid figure renders before the first reading-ordered element
    page1 = md.split("<!-- page:1 -->")[1].split("<!-- page:2 -->")[0]
    assert page1.index("role:figure") < page1.index("reading-order:1")

    # figure regions never perturb the analyzer: columns and text order are
    # identical with detection on and off
    pages, dims, _, _ = decode_payload(bytes(r["html"]), r["text"])
    on, ncol_on = run_layout_analysis([list(p) for p in pages], page_dims=dims, detect_figures=True)
    pages2, _, _, _ = decode_payload(bytes(r["html"]), r["text"])
    off, ncol_off = run_layout_analysis([list(p) for p in pages2], page_dims=dims, detect_figures=False)
    assert ncol_on == ncol_off
    texts_on = [[(e.get("content"), e.get("reading_order")) for e in p if "bbox" in e and e.get("type") == "text"] for p in on]
    texts_off = [[(e.get("content"), e.get("reading_order")) for e in p if "bbox" in e and e.get("type") == "text"] for p in off]
    assert texts_on == texts_off


def _exif_tiff(bo: str = "<") -> bytes:
    """Minimal TIFF stream: IFD0 with Make (ASCII, offset), Orientation
    (SHORT, inline), DateTime (ASCII, offset), ImageWidth/Length (SHORT),
    and an Exif sub-IFD holding DateTimeOriginal."""
    import struct

    def e(tag, typ, count, val4):
        return struct.pack(bo + "HHI", tag, typ, count) + val4

    make = b"Acme\x00"
    dt = b"2024:01:02 03:04:05\x00"
    dto = b"2023:12:31 23:59:58\x00"
    # layout: header(8) IFD0(2+6*12+4) make dt subIFD(2+1*12+4) dto
    ifd0_off = 8
    ifd0_size = 2 + 6 * 12 + 4
    make_off = ifd0_off + ifd0_size
    dt_off = make_off + len(make)
    sub_off = dt_off + len(dt)
    sub_size = 2 + 1 * 12 + 4
    dto_off = sub_off + sub_size
    hdr = (b"II*\x00" if bo == "<" else b"MM\x00*") + struct.pack(bo + "I", ifd0_off)
    ifd0 = struct.pack(bo + "H", 6)
    ifd0 += e(0x0100, 3, 1, struct.pack(bo + "HH", 640, 0))      # ImageWidth
    ifd0 += e(0x0101, 3, 1, struct.pack(bo + "HH", 480, 0))      # ImageLength
    ifd0 += e(0x010F, 2, len(make), struct.pack(bo + "I", make_off))
    ifd0 += e(0x0112, 3, 1, struct.pack(bo + "HH", 6, 0))        # Orientation
    ifd0 += e(0x0132, 2, len(dt), struct.pack(bo + "I", dt_off))
    ifd0 += e(0x8769, 4, 1, struct.pack(bo + "I", sub_off))      # Exif IFD
    ifd0 += struct.pack(bo + "I", 0)
    sub = struct.pack(bo + "H", 1)
    sub += e(0x9003, 2, len(dto), struct.pack(bo + "I", dto_off))
    sub += struct.pack(bo + "I", 0)
    return hdr + ifd0 + make + dt + sub + dto


def _jpeg_with_exif() -> bytes:
    import struct

    tiff = _exif_tiff("<")
    app1 = b"Exif\x00\x00" + tiff
    sof0 = b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" + struct.pack(">HH", 480, 640) + b"\x01\x01\x11\x00"
    return b"\xff\xd8" + b"\xff\xe1" + struct.pack(">H", len(app1) + 2) + app1 + sof0 + b"\xff\xd9"


def test_exif_ifd_parser(spark):
    """Pure-Python EXIF: JPEG APP1 and bare TIFF, both byte orders, values
    stringified like the reference's PIL TAGS loop
    (metadata_extractor.py:166-175)."""
    from smoldocling_ocr_spark.operators.multimodal import parse_exif, probe_media, sniff_media

    jpg = _jpeg_with_exif()
    exif = parse_exif(jpg)
    assert exif["Make"] == "Acme"
    assert exif["Orientation"] == "6"
    assert exif["DateTime"] == "2024:01:02 03:04:05"
    assert exif["DateTimeOriginal"] == "2023:12:31 23:59:58"

    # big-endian bare TIFF parses identically, and sniff reads its dims
    tiff_be = _exif_tiff(">")
    assert parse_exif(tiff_be)["Orientation"] == "6"
    assert sniff_media(tiff_be) == ("tiff", 640, 480)

    # no EXIF / garbage → empty dict, never raises
    assert parse_exif(b"\xff\xd8\xff\xdb" + b"\x00" * 40) == {}
    assert parse_exif(b"garbage") == {}

    meta = probe_media(spark.createDataFrame([Row(key="j", media=bytearray(jpg))])).collect()[0]
    assert meta["format"] == "jpeg" and meta["width"] == 640 and meta["height"] == 480
    assert meta["orientation"] == 6
    assert meta["datetime"] == "2023:12:31 23:59:58"
    assert meta["exif"]["Make"] == "Acme"


def test_markdown_to_docx_pure_stdlib():
    """DOCX export (reference app.py:167-183 line-based conversion) as a
    pure-stdlib OOXML zip: headings 1-3, List Bullet, plain paragraphs,
    blanks skipped; deterministic bytes."""
    import io
    import xml.etree.ElementTree as ET
    import zipfile

    from smoldocling_ocr_spark.functions.formats import markdown_to_docx

    md = "# Title\n\nBody text.\n\n## Section\n\n- item one\n* item two\n\n### Sub\nplain"
    data = markdown_to_docx(md)
    zf = zipfile.ZipFile(io.BytesIO(data))
    assert set(zf.namelist()) == {
        "[Content_Types].xml", "_rels/.rels", "word/_rels/document.xml.rels",
        "word/styles.xml", "word/document.xml",
    }
    W = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"
    root = ET.fromstring(zf.read("word/document.xml"))
    got = []
    for p in root.findall(f".//{W}p"):
        style = p.find(f"{W}pPr/{W}pStyle")
        text = "".join(t.text or "" for t in p.findall(f".//{W}t"))
        got.append((style.get(f"{W}val") if style is not None else None, text))
    assert got == [
        ("Heading1", "Title"), (None, "Body text."), ("Heading2", "Section"),
        ("ListBullet", "item one"), ("ListBullet", "item two"),
        ("Heading3", "Sub"), (None, "plain"),
    ]
    assert markdown_to_docx(md) == data  # deterministic zip


def test_register_views_sql_surface(spark):
    """Raw spark.sql() over every registered table — the SQL entry point a
    reference user expects alongside the DataFrame API."""
    from smoldocling_ocr_spark.sources.documents import register_views

    names = register_views(spark, "/root/testdata/sf0.001")
    assert "documents" in names and "cc_documents" in names
    row = spark.sql(
        "SELECT count(*) AS docs, count(DISTINCT lang) AS langs FROM documents"
    ).collect()[0]
    assert row["docs"] > 0 and row["langs"] >= 1
    assert spark.sql("SELECT count(*) AS n FROM cc_documents").collect()[0]["n"] == 60


def test_cluster_conf_profile():
    from smoldocling_ocr_spark.session import cluster_conf

    conf = cluster_conf(executors=1000, executor_cores=8)
    assert conf["spark.sql.shuffle.partitions"] == str(2 * 1000 * 8)
    assert conf["spark.sql.adaptive.enabled"] == "true"
    assert conf["spark.speculation"] == "true"
    # every value must be a string (spark-submit --conf k=v form)
    assert all(isinstance(v, str) for v in conf.values())


def test_extract_doc_udtf_sql_surface(spark, cc_docs):
    """The extractor as a SQL lateral table function (Spark 4 Python UDTF):
    markdown from plain SQL matches the mapInPandas pipeline byte-for-byte."""
    from smoldocling_ocr_spark.operators.pipeline import extract_documents
    from smoldocling_ocr_spark.plans.udtf import register_extract_udtf

    register_extract_udtf(spark)
    cc_docs.limit(6).createOrReplaceTempView("udtf_docs")
    got = {
        r["url"]: (r["markdown"], r["method"])
        for r in spark.sql(
            "SELECT e.* FROM udtf_docs AS t, "
            "LATERAL extract_doc(t.url, t.warc_ts, t.html, t.text) AS e"
        ).collect()
    }
    want = {
        r["url"]: (r["markdown"], r["method"])
        for r in extract_documents(cc_docs.limit(6), salt=False).collect()
    }
    assert got == want and len(got) == 6


def test_streaming_restart_exactly_once(spark, cc_docs, tmp_path):
    """Checkpointed restart: a second availableNow run over the same
    checkpoint processes ONLY files that arrived after the first run —
    no re-extraction, no duplicate urls in the sink (the streaming form of
    the north-rule checkpoint-resume contract)."""
    import os

    from smoldocling_ocr_spark.streaming.adapter import start_extract_stream

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    rows = cc_docs.limit(10).collect()
    first, second = rows[:6], rows[6:]
    spark.createDataFrame(first).coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(cc_docs.schema).parquet(src)
    q = start_extract_stream(stream, out, ckpt)
    q.awaitTermination(120)
    assert spark.read.parquet(out).count() == 6

    # late arrivals land in the same source directory
    spark.createDataFrame(second).coalesce(1).write.mode("append").parquet(src)
    stream2 = spark.readStream.schema(cc_docs.schema).parquet(src)
    q2 = start_extract_stream(stream2, out, ckpt)
    q2.awaitTermination(120)

    got = spark.read.parquet(out)
    assert got.count() == 10, "restart must process only the new files"
    assert got.select("url").distinct().count() == 10


def test_span_dedup_owner_encoding_overflow_raises(spark):
    """A document with pos >= owner_enc would silently collide owner keys
    (doc_id*enc+pos) and corrupt keep/drop decisions — the encoding must
    fail loudly instead (ADVICE r5)."""
    from smoldocling_ocr_spark.operators.dedup import span_dedup_frame

    docs = spark.createDataFrame(
        [(1, "a b c d e f g h i j k l m n o")], ["doc_id", "text"]
    )
    # 15 words -> 5 spans at span=3; owner_enc=4 overflows at pos 4
    with pytest.raises(Exception) as ei:
        span_dedup_frame(docs, span=3, owner_enc=4).collect()
    assert "overflows owner encoding" in str(ei.value)
    # within bounds the same corpus dedups fine
    ok = span_dedup_frame(docs, span=3, owner_enc=8).collect()
    assert ok[0]["kept_spans"] == 5 and ok[0]["removed_spans"] == 0
