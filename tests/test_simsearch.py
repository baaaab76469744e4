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


def test_lsh_verified_neardup_recall_and_reduction(spark, emb, capsys):
    """The composed LSH→verify near-dup: every emitted pair must be a true
    pair (precision 1.0 by construction — exact verify), and the measured
    candidate-stage recall vs the exact all-pairs form is asserted and
    logged (VERDICT r2 item 5). The synthetic vectors are near-uniform (max
    pairwise cosine ≈0.51), the hardest regime for sign-LSH; real near-dups
    at cosine ≥0.9 collide far more often."""
    from smoldocling_ocr_spark.operators.simsearch import lsh_verified_pairs

    exact = {
        (r.vec_a, r.vec_b)
        for r in blocked_cosine_pairs(emb, NEARDUP_THRESHOLD, n_blocks=8).collect()
    }
    got = {(r.vec_a, r.vec_b) for r in lsh_verified_pairs(emb).collect()}
    assert got <= exact  # exact verify ⇒ no false positives
    recall = len(got) / len(exact)
    n = emb.count()
    print(
        f"lsh_verified_neardup: recall={recall:.3f} ({len(got)}/{len(exact)} pairs), "
        f"corpus={n} vectors"
    )
    assert recall >= 0.8


def test_ivf_recall_sweep_and_exhaustive_invariant(spark):
    """IVF recall@3 vs brute force, swept over nprobe (VERDICT r2 item 6).

    Two assertions: (a) recall is monotone non-decreasing in nprobe — more
    probed lists can only add candidates; (b) nprobe = IVF_N_LISTS probes
    every list, so IVF MUST reproduce brute force exactly (the algebraic
    invariant that certifies the pruning is the only approximation). The
    absolute recall at small nprobe on this data is low by construction —
    near-uniform synthetic vectors make label lists weak clusters — and the
    measured sweep is recorded in BENCH/BASELINE.md."""
    from smoldocling_ocr_spark.plans.catalog import spark_queries
    from smoldocling_ocr_spark.operators.simsearch import IVF_N_LISTS, ivf_topk

    brute: dict[int, set[int]] = {}
    for r in spark_queries()["ann_cosine_topk"](spark, SF_DIR).collect():
        brute.setdefault(r.query_id, set()).add(r.neighbor_id)
    total = sum(len(v) for v in brute.values())

    recalls = []
    for nprobe in (1, 3, IVF_N_LISTS):
        ivf: dict[int, set[int]] = {}
        for r in ivf_topk(spark, SF_DIR, nprobe).collect():
            ivf.setdefault(r.query_id, set()).add(r.neighbor_id)
        hits = sum(len(brute[q] & ivf.get(q, set())) for q in brute)
        recalls.append(hits / total)
        print(f"ivf recall@3 nprobe={nprobe}: {hits}/{total} = {hits / total:.3f}")
    assert recalls == sorted(recalls)  # monotone in nprobe
    assert recalls[-1] == 1.0  # exhaustive probe == brute force


def test_kmeans_ivf_invariants(spark):
    """Learned-quantizer IVF (kmeans_fit + ivf_kmeans_topk), three
    invariants replacing a data-dependent recall number:
    (a) Lloyd inertia is monotone non-increasing across iterations (small
        float tolerance for the mean-vs-cosine renormalization);
    (b) probing ALL k lists reproduces brute-force top-k exactly;
    (c) on cleanly separable clusters the fit recovers the partition."""
    from pyspark.sql import Row
    from smoldocling_ocr_spark.operators.simsearch import (
        DIM,
        IVF_N_LISTS,
        _assign_expr,
        ivf_kmeans_topk,
        kmeans_fit,
    )
    from smoldocling_ocr_spark.plans.catalog import spark_queries

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    _, history = kmeans_fit(emb, k=IVF_N_LISTS, iters=4)
    assert len(history) == 4
    for prev, cur in zip(history, history[1:]):
        assert cur <= prev + 1e-6, f"inertia rose: {history}"

    brute: dict[int, set[int]] = {}
    for r in spark_queries()["ann_cosine_topk"](spark, SF_DIR).collect():
        brute.setdefault(r.query_id, set()).add(r.neighbor_id)
    exhaustive: dict[int, set[int]] = {}
    for r in ivf_kmeans_topk(spark, SF_DIR, nprobe=IVF_N_LISTS).collect():
        exhaustive.setdefault(r.query_id, set()).add(r.neighbor_id)
    assert exhaustive == brute  # nprobe = k degenerates to brute force

    # separable clusters: 3 orthogonal directions, tight noise
    import numpy as np

    rng = np.random.default_rng(3)
    rows = []
    for i in range(60):
        c = i % 3
        v = np.zeros(DIM)
        v[c] = 10.0
        v += rng.normal(0, 0.05, DIM)
        rows.append(Row(vec_id=i, label=c, embedding=[float(x) for x in v]))
    toy = spark.createDataFrame(rows)
    centroids, hist = kmeans_fit(toy, k=3, iters=3)
    assigned = toy.select(
        "label", _assign_expr(centroids).alias("list_id")
    ).collect()
    # every true cluster maps to exactly one learned list
    mapping: dict[int, set[int]] = {}
    for r in assigned:
        mapping.setdefault(r.label, set()).add(r.list_id)
    assert all(len(v) == 1 for v in mapping.values())
    assert len({next(iter(v)) for v in mapping.values()}) == 3
