"""Round-6 optimization harness (bench.py is FROZEN — this file holds the
extra measurement the optimization work needs; cited in OPTIMIZATION_r06.md).

Modes:
  python bench_extra.py time [query ...]   min/median-of-N per-query timing
                                           (count(), same methodology as the
                                           frozen bench loop) at $SPARK_GRAFT_SF_DIR
  python bench_extra.py plans [query ...]  dump .explain("formatted") for each
                                           query to plans/r06/<q>_<tag>.txt
  python bench_extra.py profile            cProfile extract_document over the
                                           generated corpus (the headline path)

Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32),
     BENCH_EXTRA_REPEATS (default 3), BENCH_EXTRA_TAG (plan-file suffix,
     default "before").
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
REPEATS = int(os.environ.get("BENCH_EXTRA_REPEATS", "3"))
TAG = os.environ.get("BENCH_EXTRA_TAG", "before")

DEFAULT_QUERIES = [
    "ann_lsh_verified_neardup",
    "ann_ivf_kmeans_topk",
    "dedup_connected_components",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "global_span_dedup",
    "ann_ivf_topk",
    "ann_cosine_topk",
    "caption_proximity_join",
    "dedup_simhash",
    "unigram_freq_score",
    "embedding_cosine_neardup",
    "bpe_encode_corpus",
    "exact_substring_dedup",
]


def _spark():
    from smoldocling_ocr_spark.session import get_spark

    return get_spark(app_name="bench_extra", cores=CPUS)


def time_queries(names: list[str]) -> None:
    from smoldocling_ocr_spark.plans.catalog import spark_queries
    from smoldocling_ocr_spark.sources.documents import corpus_parquet_path

    corpus_parquet_path(SF_DIR)
    spark = _spark()
    catalog = spark_queries()
    warm_dir = "/root/testdata/sf0.001" if SF_DIR != "/root/testdata/sf0.001" else SF_DIR
    out: dict[str, dict] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"warm:{name}")
        catalog[name](spark, warm_dir).count()
        samples = []
        for i in range(REPEATS):
            spark.sparkContext.setJobDescription(f"time:{name}:{i}")
            t0 = time.time()
            catalog[name](spark, SF_DIR).count()
            samples.append(round(time.time() - t0, 3))
        out[name] = {
            "min": min(samples),
            "median": sorted(samples)[len(samples) // 2],
            "samples": samples,
            "load1": round(os.getloadavg()[0], 2),
        }
        print(json.dumps({name: out[name]}), flush=True)
    spark.stop()
    print(json.dumps({"sf_dir": SF_DIR, "repeats": REPEATS, "results": out}))


def dump_plans(names: list[str]) -> None:
    from smoldocling_ocr_spark.plans.catalog import spark_queries
    from smoldocling_ocr_spark.sources.documents import corpus_parquet_path

    corpus_parquet_path(SF_DIR)
    spark = _spark()
    catalog = spark_queries()
    os.makedirs("plans/r06", exist_ok=True)
    for name in names:
        df = catalog[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = f"plans/r06/{name}_{TAG}.txt"
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")
    spark.stop()


def profile_extract(n_docs: int = 600) -> None:
    import cProfile
    import pstats

    from smoldocling_ocr_spark.functions.extract import extract_document
    from smoldocling_ocr_spark.sources.corpus import generate_rows

    rows = generate_rows(n_docs)

    def run():
        for r in rows:
            extract_document(r["url"], r["warc_ts"], bytes(r["html"]), r["text"])

    run()  # warm (imports, regex compiles)
    prof = cProfile.Profile()
    t0 = time.time()
    prof.enable()
    run()
    prof.disable()
    wall = time.time() - t0
    print(f"extract_document x{n_docs}: {wall:.3f}s = {n_docs / wall:.1f} docs/s/core")
    stats = pstats.Stats(prof)
    stats.sort_stats("cumulative").print_stats(45)


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "time"
    names = sys.argv[2:] or DEFAULT_QUERIES
    if mode == "time":
        time_queries(names)
    elif mode == "plans":
        dump_plans(names)
    elif mode == "profile":
        profile_extract()
    else:
        raise SystemExit(f"unknown mode {mode}")


if __name__ == "__main__":
    main()
