"""Golden byte-parity: Spark pipeline output must hash-match the frozen
goldens per url (the north_rule per-row invariant)."""

from __future__ import annotations

import hashlib
import json
import os

import pytest

GOLDENS_PATH = os.path.join(os.path.dirname(__file__), "..", "fixtures", "goldens_sha256.json")


@pytest.fixture(scope="module")
def goldens():
    with open(GOLDENS_PATH) as f:
        return json.load(f)


def test_canonical_pipeline_matches_goldens(goldens):
    """Pure-Python canonical pipeline reproduces every frozen hash."""
    from smoldocling_ocr_spark.functions.extract import extract_document
    from smoldocling_ocr_spark.sources.corpus import generate_rows

    rows = generate_rows(len(goldens))
    mismatches = []
    for r in rows:
        res = extract_document(r["url"], r["warc_ts"], r["html"], r["text"])
        h = hashlib.sha256(res["markdown"].encode("utf-8")).hexdigest()
        if goldens[r["url"]] != h:
            mismatches.append(r["url"])
    assert not mismatches, f"golden drift on {len(mismatches)} urls: {mismatches[:5]}"


def test_spark_pipeline_byte_identical(spark, goldens):
    """The Arrow-batched Spark pipeline emits byte-identical markdown per url."""
    from pyspark.sql import functions as F

    from smoldocling_ocr_spark.operators.pipeline import extract_documents
    from smoldocling_ocr_spark.sources.documents import read_cc_documents

    docs = read_cc_documents(spark, "/root/testdata/sf0.001")
    extracted = extract_documents(docs, num_partitions=8)
    out = {
        r["url"]: r["md_sha"]
        for r in extracted.select("url", F.sha2(F.col("markdown"), 256).alias("md_sha")).collect()
    }
    assert len(out) == len(goldens)
    mismatches = [u for u, h in goldens.items() if out.get(u) != h]
    assert not mismatches, f"spark output diverges from goldens: {mismatches[:5]}"
