"""blocked_cosine_pairs sizing contract: blocking-invariant results, and
B derived without any extra Spark action when the caller supplies N
(VERDICT r01 item 5 — at 10^9 vectors a per-call count() is a real job)."""

from __future__ import annotations

import pytest
from pyspark.sql import DataFrame

from smoldocling_ocr_spark.operators.simsearch import (
    NEARDUP_THRESHOLD,
    blocked_cosine_pairs,
    parquet_row_count,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_blocking_invariance(spark, emb):
    """Pair set must not depend on the block count."""
    a = sorted(map(tuple, blocked_cosine_pairs(emb, NEARDUP_THRESHOLD, n_blocks=8).collect()))
    b = sorted(map(tuple, blocked_cosine_pairs(emb, NEARDUP_THRESHOLD, n_blocks=13).collect()))
    assert a == b
    assert len(a) > 0
    assert all(x < y for x, y in a)


def test_parquet_row_count_matches_scan(spark, emb):
    assert parquet_row_count(SF_DIR, "embeddings") == emb.count()


def test_no_count_action_when_n_rows_given(spark, emb, monkeypatch):
    """With n_rows supplied, sizing B must not trigger DataFrame.count()."""

    def boom(self):  # pragma: no cover - failure path
        raise AssertionError("blocked_cosine_pairs ran an extra count() action")

    monkeypatch.setattr(DataFrame, "count", boom)
    n = parquet_row_count(SF_DIR, "embeddings")
    pairs = blocked_cosine_pairs(emb, NEARDUP_THRESHOLD, n_rows=n).collect()
    assert len(pairs) > 0
