"""Distributed BPE tokenizer training (operators/bpe.py).

The fit is verified against an INDEPENDENT reference implementation — the
original Sennrich et al. (2016) string-based algorithm (space-joined symbol
strings, regex merging) — run on the same word-frequency table, so a bug in
the tuple-based production code cannot self-confirm."""

from __future__ import annotations

import re

import pytest

from smoldocling_ocr_spark.operators.bpe import (
    END,
    apply_merges,
    bpe_fit,
    word_frequencies,
)

SF_DIR = "/root/testdata/sf0.001"


def sennrich_reference(word_freqs, n_merges):
    """Sennrich et al. 2016 Algorithm 1, as published (string/regex form)."""
    vocab = {}
    for w, f in word_freqs:
        key = " ".join(list(w) + [END])
        vocab[key] = vocab.get(key, 0) + f
    merges = []
    for _ in range(n_merges):
        pairs = {}
        for word, freq in vocab.items():
            symbols = word.split()
            for i in range(len(symbols) - 1):
                pairs[(symbols[i], symbols[i + 1])] = (
                    pairs.get((symbols[i], symbols[i + 1]), 0) + freq
                )
        if not pairs:
            break
        best, count = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if count < 2:
            break
        merges.append((best[0], best[1], count))
        pattern = re.compile(
            r"(?<!\S)" + re.escape(best[0] + " " + best[1]) + r"(?!\S)"
        )
        vocab = {
            pattern.sub(best[0] + best[1], word): freq for word, freq in vocab.items()
        }
    return merges


def test_known_answer_toy():
    wf = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = bpe_fit(wf, 4)
    # hand-derivable: 'es' (9) then 'est' (9) then 'est</w>' (9) then 'lo' (7)
    assert merges[0] == ("e", "s", 9)
    assert merges[1] == ("es", "t", 9)
    assert merges[2] == ("est", END, 9)
    assert merges[3] == ("l", "o", 7)


def test_matches_independent_reference_on_corpus(spark):
    from smoldocling_ocr_spark.sources.documents import read_table

    docs = read_table(spark, SF_DIR, "documents")
    wf = [(r.word, r.freq) for r in word_frequencies(docs).collect()]
    assert len(wf) > 10
    got = bpe_fit(wf, 24)
    ref = sennrich_reference(wf, 24)
    assert got == ref
    assert len(got) == 24
    # counts are monotone non-increasing is NOT required by BPE (merges can
    # create new frequent pairs), but every count must be >= 2 and positive
    assert all(c >= 2 for _, _, c in got)


def test_apply_merges_tokenizes_and_reduces():
    wf = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = bpe_fit(wf, 8)
    for w, _ in wf:
        toks = apply_merges(w, merges)
        assert "".join(toks) == w + END  # lossless
        assert len(toks) < len(w) + 1  # learned merges actually compress
    assert apply_merges("zzz", merges) == ["z", "z", "z", END]  # OOV intact


def test_catalog_entry_runs(spark):
    from smoldocling_ocr_spark.plans.catalog import spark_queries

    df = spark_queries()["bpe_train_merges"](spark, SF_DIR)
    rows = df.collect()
    assert len(rows) == 24
    assert [r.merge_rank for r in rows] == list(range(24))
    assert all(r.pair_count >= 2 for r in rows)


def test_bpe_encode_corpus_invariants(spark):
    """Distributed tokenization invariants: per-doc BPE token count is
    bounded by [ws_tokens, total chars + ws_tokens] (END markers add one
    per word; merges only shrink), the stream fingerprint matches a local
    re-tokenization, and counts agree with apply_merges word-by-word."""
    import hashlib

    from smoldocling_ocr_spark.operators.bpe import (
        apply_merges,
        bpe_encode_corpus,
        bpe_fit,
        word_frequencies,
    )

    docs = spark.createDataFrame(
        [
            (1, "low low low lower lowest"),
            (2, "new newer newest low"),
            (3, "widest wide wider new"),
        ],
        ["doc_id", "text"],
    )
    wf = [(r.word, r.freq) for r in word_frequencies(docs).collect()]
    merges = bpe_fit(wf, n_merges=12)
    assert merges  # the tiny corpus must learn something
    rows = {r.doc_id: r for r in bpe_encode_corpus(docs, merges).collect()}
    for did, text in [(1, "low low low lower lowest"), (2, "new newer newest low"), (3, "widest wide wider new")]:
        words = text.split(" ")
        expect_toks = []
        for w in words:
            expect_toks.extend(apply_merges(w, merges))
        r = rows[did]
        assert r.ws_tokens == len(words)
        assert r.bpe_tokens == len(expect_toks)
        assert r.ws_tokens <= r.bpe_tokens <= sum(len(w) for w in words) + len(words)
        assert r.stream_fp == hashlib.md5(" ".join(expect_toks).encode()).hexdigest()[:16]
