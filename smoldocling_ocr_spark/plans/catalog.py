"""Operator catalog: Spark queries + DuckDB oracle twins.

Every relationally-expressible operator from SURVEY.md §2 gets a Spark
DataFrame formulation here and a semantically identical ANSI-SQL oracle the
driver runs through DuckDB on the same parquet tables (region nation customer
supplier part orders lineitem events documents embeddings). Column names are
aliased identically on both sides (the driver hashes values after sorting
columns by name).

Non-SQL-expressible ops (the fused extraction UDF itself, flood-fill figure
detection, the full multi-signal classifier) are exposed as rows-only checks
(present in ``spark_queries`` with no oracle entry).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..sources.documents import read_table

_SPARK: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
_ORACLE: dict[str, str] = {}


def query(name: str, sql: str | None = None):
    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        _SPARK[name] = fn
        if sql is not None:
            _ORACLE[name] = sql
        return fn
    return wrap


# The driver's correctness gate checks only the FIRST 50 entries of
# queries() per round (observed in CORRECTNESS_r01/r02). The catalog has
# grown past 50, so coverage ROTATES: entries that have never had a driver
# row go first this round; queries already hash-certified in BOTH earlier
# rounds rotate past the cap. Every displaced query keeps an automated
# value-hash check each pytest run — tests/test_queries_oracle.py hash-
# checks ALL oracle queries at sf0.001, and
# tests/test_driver_gate_overflow.py re-checks the displaced ones with the
# driver's exact pandas-fetch normalization at sf0.001. Rotation history is
# documented in COVERAGE.md.
GATE_ROTATION_FIRST = [
    # r6 rotation (VERDICT r5 task 2): (a) the r4-certified set displaced in
    # r5 rotates back into the gate so CORRECTNESS_r06 ∪ r05 covers the full
    # catalog again, (b) every query whose EXECUTION PLAN changed in the r6
    # optimization round (spread/width-pin/norm-hoist/checkpoint/root-edge
    # rewrites) is pinned in so the driver re-certifies it at sf0.01.
    "unicode_dash_normalize",
    "hyphen_merge_strict",
    "pdf_date_parse_relational",
    "document_id_sha256",
    "token_counting",
    "doc_fingerprint",
    "payload_size_tiers",
    "confidence_statistics",
    "quality_tiers",
    "langid_histogram_relational",
    "pii_scan_redact",
    "bpe_train_merges",  # rows-only (iterative Sennrich fit)
    "ann_pq_topk",  # rows-only; CHANGED r6 (matrix-literal build, spread+persist fit)
    "ann_ivf_pq_topk",  # rows-only; CHANGED r6 (same)
    "multimodal_decode_stats",
    "ann_lsh_verified_neardup",  # CHANGED r6: spread + width-pinned dedup + norm hoist
    "ann_lsh_buckets",
    "ann_lsh_candidate_pairs",
    "defragment_line_merge",
    "ann_ivf_kmeans_topk",  # rows-only; CHANGED r6 (fit parallelized, literal build)
    "text_quality_scoring",
    "langid_script_heuristic",
    "ann_ivf_topk",  # CHANGED r6: spread on the list-scan side
    "embedding_label_centroids",
    "ann_cosine_topk",  # CHANGED r6: spread on the corpus side
    "embedding_cosine_neardup",
    "dedup_simhash",
    # changed in r6 but seated in FIRST/middle during r5 — pinned here so the
    # driver re-certifies the new plans:
    "dedup_minhash_lsh",  # CHANGED r6: signature localCheckpoint + spread
    "dedup_ngram_jaccard",  # CHANGED r6: sh/docsets localCheckpoints + spread
    "dedup_connected_components",  # CHANGED r6: root-edge contraction rewrite
    "ann_pq_topk_fixed_books",  # CHANGED r6: parsed matrix literal + spread encode
    "bpe_encode_corpus",  # rows-only; CHANGED r6: rank-table hoist + spread
]
GATE_ROTATION_LAST = [
    # hash-certified in r5 (CORRECTNESS_r05 green rows), implementation
    # UNCHANGED in r6 — rotated past the cap; every oracle-backed one is
    # still strict-checked each pytest run by
    # tests/test_driver_gate_overflow.py with the driver's own comparison.
    # 27 entries exactly: 77 − 32 FIRST − 27 LAST = 18 middle, so the
    # 50-slot window is FIRST + middle exactly;
    # test_rotation_is_complete_and_consistent guards the arithmetic.
    "dedup_exact",
    "gopher_quality_filters",
    "gopher_repetition_filters",
    "c4_quality_filters",
    "pricing_summary",
    "shipping_priority",
    "revenue_forecast",
    "regional_supplier_volume",
    "noise_page_number_tagging",
    "garbled_text_predicate",
    "hallucination_scan",
    "interval_containment_join",
    "caption_proximity_join",
    "extract_pipeline_full",  # rows-only
    "role_distribution",  # rows-only
    "extract_method_routing",  # rows-only
    "extract_language_detection",  # rows-only
    "bpe_word_frequencies",
    "global_span_dedup",  # unchanged in r6 (spread/ckpt measured slower, reverted)
    "exact_substring_dedup",  # unchanged in r6 (same)
    "decontamination_scan",
    "stratified_sample_by_lang",
    "unigram_freq_score",  # unchanged in r6 (ckpt/spread measured slower, reverted)
    "training_chunks",
    "sequence_packing",
    "order_priority_check",
    "small_quantity_revenue",
]


def spark_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    pinned = set(GATE_ROTATION_FIRST) | set(GATE_ROTATION_LAST)
    ordered = {n: _SPARK[n] for n in GATE_ROTATION_FIRST if n in _SPARK}
    ordered.update({n: f for n, f in _SPARK.items() if n not in pinned})
    ordered.update({n: _SPARK[n] for n in GATE_ROTATION_LAST if n in _SPARK})
    return ordered


def oracle_queries() -> dict[str, str]:
    return dict(_ORACLE)


def _with_global_agg(df: DataFrame, agg_expr, name: str) -> DataFrame:
    """Attach a global scalar aggregate as a column via a broadcast 1-row
    cross join. Equivalent to ``expr OVER ()`` but scale-safe: a window with
    no PARTITION BY moves every row to a single partition, while this form
    is a partial+final agg plus a BroadcastNestedLoopJoin of one row."""
    one_row = df.agg(agg_expr.alias(name))
    return df.crossJoin(F.broadcast(one_row))


# ---------------------------------------------------------------------------
# §2.2 predicates / noise tagging (rlike banks over documents.text)
# ---------------------------------------------------------------------------

# Java-regex-safe subsets of the noise predicate banks (full Python-re banks
# run in-UDF; these relational twins are the oracle-checkable projections).
_PAGE_NUM_SQLRE = r"^(Page ?[0-9]+( of [0-9]+)?|[0-9]+ ?/ ?[0-9]+|- ?[0-9]+ ?-|[0-9]+)$"
_WM_WORDS = r"^(CONFIDENTIAL|DRAFT|SAMPLE|PREVIEW|WATERMARK)$"


@query(
    "noise_page_number_tagging",
    sql=f"""
    SELECT source, count(*) AS docs,
           CAST(sum(CASE WHEN regexp_matches(trim(text), '{_PAGE_NUM_SQLRE}') THEN 1 ELSE 0 END) AS BIGINT) AS page_number_docs
    FROM documents GROUP BY source ORDER BY source
    """,
)
def q_noise_page_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    """noise_filter.py:28-35 page-number predicate as an rlike disjunction."""
    docs = read_table(spark, sf_dir, "documents")
    is_pn = F.trim(F.col("text")).rlike(_PAGE_NUM_SQLRE)
    return (
        docs.groupBy("source")
        .agg(
            F.count("*").alias("docs"),
            F.sum(F.when(is_pn, 1).otherwise(0)).alias("page_number_docs"),
        )
        .orderBy("source")
    )


@query(
    "garbled_text_predicate",
    sql=r"""
    SELECT count(*) AS garbled_docs FROM documents
    WHERE regexp_matches(text, '[bcdfghjklmnpqrstvwxzBCDFGHJKLMNPQRSTVWXZ]{5,}')
       OR length(regexp_replace(text, '[a-zA-Z0-9 \t\n]', '', 'g')) * 2 > length(text)
    """,
)
def q_garbled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """noise_filter.py:244-262 garbled-text check, relational form."""
    docs = read_table(spark, sf_dir, "documents")
    consonant_run = F.col("text").rlike(r"[bcdfghjklmnpqrstvwxzBCDFGHJKLMNPQRSTVWXZ]{5,}")
    specials = F.length(F.regexp_replace(F.col("text"), r"[a-zA-Z0-9 \t\n]", ""))
    high_special = specials * 2 > F.length(F.col("text"))
    return docs.filter(consonant_run | high_special).agg(F.count("*").alias("garbled_docs"))


@query(
    "hallucination_scan",
    sql=r"""
    SELECT count(*) AS flagged_docs FROM documents
    WHERE regexp_matches(lower(text), 'based on (the|this) (image|document|page)')
       OR regexp_matches(lower(text), 'it (appears|seems) that')
       OR regexp_matches(lower(text), 'as (shown|seen|visible) in')
    """,
)
def q_hallucination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """validation_framework.py:34-43 hallucination phrases over documents."""
    docs = read_table(spark, sf_dir, "documents")
    t = F.lower(F.col("text"))
    flagged = (
        t.rlike(r"based on (the|this) (image|document|page)")
        | t.rlike(r"it (appears|seems) that")
        | t.rlike(r"as (shown|seen|visible) in")
    )
    return docs.filter(flagged).agg(F.count("*").alias("flagged_docs"))


# ---------------------------------------------------------------------------
# §2.4 aggregations
# ---------------------------------------------------------------------------


@query(
    "repeater_detection",
    sql=r"""
    SELECT normalized, occurrences FROM (
      SELECT regexp_extract(regexp_replace(lower(trim(text)), '[0-9]+', '[NUM]', 'g'),
                            '^(\S+ \S+)', 1) AS normalized,
             count(*) AS occurrences
      FROM documents GROUP BY 1
    ) WHERE occurrences >= 2 ORDER BY occurrences DESC, normalized
    """,
)
def q_repeater(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Header/footer repeater detection (noise_filter.py:143-190): digit-mask
    normalize the header zone (leading tokens — the top-of-page analog on the
    flat documents table) → count across docs → threshold ≥2. Partial+final
    hash agg."""
    docs = read_table(spark, sf_dir, "documents")
    normalized = F.regexp_extract(
        F.regexp_replace(F.lower(F.trim(F.col("text"))), r"[0-9]+", "[NUM]"), r"^(\S+ \S+)", 1
    )
    return (
        docs.groupBy(normalized.alias("normalized"))
        .agg(F.count("*").alias("occurrences"))
        .filter(F.col("occurrences") >= 2)
        .orderBy(F.desc("occurrences"), "normalized")
    )


@query(
    "confidence_statistics",
    sql="""
    SELECT event_type,
           round(avg(value), 4) AS avg_conf,
           round(min(value), 4) AS min_conf,
           round(max(value), 4) AS max_conf,
           round(stddev_samp(value), 4) AS std_dev,
           count(*) AS total_elements,
           CAST(sum(CASE WHEN value < 0.7 THEN 1 ELSE 0 END) AS BIGINT) AS uncertain_count,
           CAST(sum(CASE WHEN value < 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS low_confidence_count
    FROM (SELECT event_type, value / (max(value) OVER ()) AS value FROM events)
    GROUP BY event_type ORDER BY event_type
    """,
)
def q_confidence_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """confidence_tracker.py:103-144 statistics as groupBy aggregates
    (events.value normalized to [0,1] plays the confidence column)."""
    events = read_table(spark, sf_dir, "events")
    scored = _with_global_agg(events, F.max("value"), "_gmax").select(
        "event_type", (F.col("value") / F.col("_gmax")).alias("conf")
    )
    return (
        scored.groupBy("event_type")
        .agg(
            F.round(F.avg("conf"), 4).alias("avg_conf"),
            F.round(F.min("conf"), 4).alias("min_conf"),
            F.round(F.max("conf"), 4).alias("max_conf"),
            F.round(F.stddev_samp("conf"), 4).alias("std_dev"),
            F.count("*").alias("total_elements"),
            F.sum(F.when(F.col("conf") < 0.7, 1).otherwise(0)).alias("uncertain_count"),
            F.sum(F.when(F.col("conf") < 0.5, 1).otherwise(0)).alias("low_confidence_count"),
        )
        .orderBy("event_type")
    )


@query(
    "quality_score_rubric",
    sql="""
    SELECT user_id,
           round(0.6 * avg(conf) + 0.2 * min(conf)
                 + 0.2 * (1.0 - sum(CASE WHEN conf < 0.7 THEN 1 ELSE 0 END) * 1.0 / count(*)), 4) AS quality_score
    FROM (SELECT user_id, value / (max(value) OVER ()) AS conf FROM events)
    GROUP BY user_id ORDER BY user_id
    """,
)
def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """confidence_tracker.py:277-306 overall score 0.6*avg+0.2*min+0.2*(1-unc%)."""
    events = read_table(spark, sf_dir, "events")
    scored = _with_global_agg(events, F.max("value"), "_gmax").select(
        "user_id", (F.col("value") / F.col("_gmax")).alias("conf")
    )
    unc_frac = F.sum(F.when(F.col("conf") < 0.7, 1).otherwise(0)) / F.count("*")
    return (
        scored.groupBy("user_id")
        .agg(F.round(0.6 * F.avg("conf") + 0.2 * F.min("conf") + 0.2 * (1.0 - unc_frac), 4).alias("quality_score"))
        .orderBy("user_id")
    )


@query(
    "quality_tiers",
    sql="""
    SELECT CASE WHEN avg_conf >= 0.9 THEN 'excellent' WHEN avg_conf >= 0.8 THEN 'good'
                WHEN avg_conf >= 0.7 THEN 'acceptable' WHEN avg_conf >= 0.5 THEN 'poor'
                ELSE 'very_poor' END AS quality, count(*) AS pages
    FROM (SELECT user_id, avg(conf) AS avg_conf
          FROM (SELECT user_id, value / (max(value) OVER ()) AS conf FROM events)
          GROUP BY user_id)
    GROUP BY 1 ORDER BY 1
    """,
)
def q_quality_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """confidence_tracker.py:241-275 page-quality tier ladder."""
    events = read_table(spark, sf_dir, "events")
    scored = _with_global_agg(events, F.max("value"), "_gmax").select(
        "user_id", (F.col("value") / F.col("_gmax")).alias("conf")
    )
    per_page = scored.groupBy("user_id").agg(F.avg("conf").alias("avg_conf"))
    tier = (
        F.when(F.col("avg_conf") >= 0.9, "excellent")
        .when(F.col("avg_conf") >= 0.8, "good")
        .when(F.col("avg_conf") >= 0.7, "acceptable")
        .when(F.col("avg_conf") >= 0.5, "poor")
        .otherwise("very_poor")
    )
    return per_page.groupBy(tier.alias("quality")).agg(F.count("*").alias("pages")).orderBy("quality")


@query(
    "word_char_counts",
    sql="""
    SELECT lang, CAST(sum(length(regexp_split_to_array(trim(text), '\\s+'))) AS BIGINT) AS words,
           CAST(sum(length(text)) AS BIGINT) AS chars, count(*) AS docs
    FROM documents GROUP BY lang ORDER BY lang
    """,
)
def q_word_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """metadata_extractor.py:102-107 word/char counting as size(split(...))."""
    docs = read_table(spark, sf_dir, "documents")
    words = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    return (
        docs.groupBy("lang")
        .agg(F.sum(words).alias("words"), F.sum(F.length("text")).alias("chars"), F.count("*").alias("docs"))
        .orderBy("lang")
    )


@query(
    "body_font_mode",
    sql="""
    SELECT l_returnflag AS grp, max_by(l_quantity, cnt * 1000000 + l_quantity) AS mode_value FROM (
      SELECT l_returnflag, l_quantity, count(*) AS cnt FROM lineitem GROUP BY 1, 2
    ) GROUP BY 1 ORDER BY 1
    """,
)
def q_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fast_converter.py:6-15 body-font-size mode via max_by(value, count);
    count ties break deterministically toward the larger value."""
    li = read_table(spark, sf_dir, "lineitem")
    counted = li.groupBy("l_returnflag", "l_quantity").agg(F.count("*").alias("cnt"))
    tie_safe = F.col("cnt") * 1000000 + F.col("l_quantity")
    return (
        counted.groupBy(F.col("l_returnflag").alias("grp"))
        .agg(F.max_by("l_quantity", tie_safe).alias("mode_value"))
        .orderBy("grp")
    )


@query(
    "completeness_estimate",
    sql="""
    SELECT doc_id, n_chars,
           CASE WHEN length(text) BETWEEN n_chars * 0.8 AND n_chars * 1.5 THEN 'complete'
                WHEN length(text) < n_chars * 0.8 THEN 'truncated' ELSE 'padded' END AS completeness
    FROM documents ORDER BY doc_id
    """,
)
def q_completeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """openrouter_validator.py:160-213 ground-truth ±(0.8,1.5)× completeness."""
    docs = read_table(spark, sf_dir, "documents")
    n = F.length("text")
    label = (
        F.when((n >= F.col("n_chars") * 0.8) & (n <= F.col("n_chars") * 1.5), "complete")
        .when(n < F.col("n_chars") * 0.8, "truncated")
        .otherwise("padded")
    )
    return docs.select("doc_id", "n_chars", label.alias("completeness")).orderBy("doc_id")


# ---------------------------------------------------------------------------
# §2.5 windows / ordering
# ---------------------------------------------------------------------------


@query(
    "column_gap_clustering",
    sql="""
    WITH ordered AS (
      SELECT user_id, ts, value,
             lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value
      FROM events
    ), flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN prev_value IS NULL OR value - prev_value > 50 THEN 1 ELSE 0 END AS new_col
      FROM ordered
    )
    SELECT user_id, count(*) AS n_events,
           CAST(sum(new_col) AS BIGINT) AS column_count
    FROM flagged GROUP BY user_id ORDER BY user_id
    """,
)
def q_gap_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """layout_analyzer.py:24-75 gap clustering as lag + flag + running sum —
    the classic session-gap window pattern (threshold 50)."""
    events = read_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = events.withColumn(
        "new_col",
        F.when(
            F.lag("value").over(w).isNull() | (F.col("value") - F.lag("value").over(w) > 50), 1
        ).otherwise(0),
    )
    return (
        flagged.groupBy("user_id")
        .agg(F.count("*").alias("n_events"), F.sum("new_col").alias("column_count"))
        .orderBy("user_id")
    )


@query(
    "xycut_reading_order",
    sql="""
    SELECT event_id, user_id,
           row_number() OVER (PARTITION BY user_id ORDER BY event_type, ts, event_id) AS reading_order
    FROM events ORDER BY user_id, reading_order
    """,
)
def q_xycut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """layout_analyzer.py:112-151 XY-cut as row_number over (column, y) —
    event_type plays column_id, ts plays the y coordinate."""
    events = read_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("event_type", "ts", "event_id")
    return events.select("event_id", "user_id", F.row_number().over(w).alias("reading_order")).orderBy(
        "user_id", "reading_order"
    )


@query(
    "top_bottom_candidates",
    sql="""
    SELECT user_id, event_id, pos FROM (
      SELECT user_id, event_id,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn_top,
             row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn_bot,
             CASE WHEN row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) <= 3 THEN 'top' ELSE 'bottom' END AS pos
      FROM events
    ) WHERE rn_top <= 3 OR rn_bot <= 3 ORDER BY user_id, event_id, pos
    """,
)
def q_top_bottom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """noise_filter.py:157-179 top/bottom-3 header/footer candidates."""
    events = read_table(spark, sf_dir, "events")
    w_top = W.partitionBy("user_id").orderBy("ts", "event_id")
    w_bot = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    ranked = events.select(
        "user_id",
        "event_id",
        F.row_number().over(w_top).alias("rn_top"),
        F.row_number().over(w_bot).alias("rn_bot"),
    )
    return (
        ranked.filter((F.col("rn_top") <= 3) | (F.col("rn_bot") <= 3))
        .select("user_id", "event_id", F.when(F.col("rn_top") <= 3, "top").otherwise("bottom").alias("pos"))
        .orderBy("user_id", "event_id", "pos")
    )


@query(
    "prev_next_gap_context",
    sql="""
    SELECT event_id, user_id,
           round(coalesce(value - lag(value)  OVER (PARTITION BY user_id ORDER BY ts, event_id), 0.0), 6) AS gap_before,
           round(coalesce(lead(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) - value, 0.0), 6) AS gap_after
    FROM events ORDER BY user_id, event_id
    """,
)
def q_prev_next(spark: SparkSession, sf_dir: str) -> DataFrame:
    """layout_analyzer.py:210-222 prev/next whitespace gaps via lag/lead."""
    events = read_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        "event_id",
        "user_id",
        F.round(F.coalesce(F.col("value") - F.lag("value").over(w), F.lit(0.0)), 6).alias("gap_before"),
        F.round(F.coalesce(F.lead("value").over(w) - F.col("value"), F.lit(0.0)), 6).alias("gap_after"),
    ).orderBy("user_id", "event_id")


@query(
    "heading_promotion",
    sql="""
    SELECT o_orderkey, o_custkey - min_key + 1 AS normalized_level FROM (
      SELECT o_orderkey, o_custkey, min(o_custkey) OVER () AS min_key FROM orders
    ) ORDER BY o_orderkey
    """,
)
def q_heading_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """schema_enforcer.py:136-147 min-level promotion: global min via a
    broadcast 1-row agg (scale-safe OVER ()), subtract (min-1) everywhere."""
    orders = read_table(spark, sf_dir, "orders")
    return _with_global_agg(orders, F.min("o_custkey"), "_min_key").select(
        "o_orderkey", (F.col("o_custkey") - F.col("_min_key") + 1).alias("normalized_level")
    ).orderBy("o_orderkey")


@query(
    "median_confidence",
    sql="""
    SELECT event_type, round(median(value), 4) AS median_value, count(*) AS n
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def q_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """confidence_tracker.py:130 exact median via percentile (not approx —
    parity with statistics.median requires the exact interpolated value)."""
    events = read_table(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(F.round(F.median("value"), 4).alias("median_value"), F.count("*").alias("n"))
        .orderBy("event_type")
    )


@query(
    "history_topk",
    sql="""
    SELECT event_id, ts FROM events ORDER BY ts DESC, event_id DESC LIMIT 10
    """,
)
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """history_manager.py:30-48 rolling display window as sort+limit (TopK)."""
    events = read_table(spark, sf_dir, "events")
    return events.select("event_id", "ts").orderBy(F.desc("ts"), F.desc("event_id")).limit(10)


@query(
    "sequentiality_check",
    sql="""
    SELECT o_orderkey AS doc, count(*) AS markers,
           CASE WHEN count(*) = max(l_linenumber) THEN true ELSE false END AS is_sequential
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderkey ORDER BY doc
    """,
)
def q_sequentiality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """validation_framework.py:124-141 page-marker 1..N sequence check."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey)
    return (
        joined.groupBy(F.col("o_orderkey").alias("doc"))
        .agg(
            F.count("*").alias("markers"),
            (F.count("*") == F.max("l_linenumber")).alias("is_sequential"),
        )
        .orderBy("doc")
    )


# ---------------------------------------------------------------------------
# §2.3 joins
# ---------------------------------------------------------------------------


@query(
    "caption_proximity_join",
    sql="""
    WITH captions AS (SELECT event_id AS caption_id, user_id, value AS y FROM events WHERE event_type = 'click'),
         targets  AS (SELECT event_id AS target_id,  user_id, value AS y FROM events WHERE event_type = 'view')
    SELECT caption_id, target_id, round(dist, 6) AS dist FROM (
      SELECT c.caption_id, t.target_id, abs(t.y - c.y) AS dist,
             row_number() OVER (PARTITION BY c.caption_id ORDER BY abs(t.y - c.y), t.target_id) AS rn
      FROM captions c JOIN targets t ON c.user_id = t.user_id AND abs(t.y - c.y) < 100
    ) WHERE rn = 1 ORDER BY caption_id
    """,
)
def q_caption_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """caption_extractor.py:132-152 nearest-target-within-100 as a range join
    + min-by-distance window; equi key (user_id ~ url,page) → hash join."""
    events = read_table(spark, sf_dir, "events")
    captions = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("caption_id"), "user_id", F.col("value").alias("cy")
    )
    targets = events.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("target_id"), "user_id", F.col("value").alias("ty")
    )
    dist = F.abs(F.col("ty") - F.col("cy"))
    joined = captions.join(targets, on="user_id").where(dist < 100).withColumn("dist", dist)
    w = W.partitionBy("caption_id").orderBy("dist", "target_id")
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("caption_id", "target_id", F.round("dist", 6).alias("dist"))
        .orderBy("caption_id")
    )


@query(
    "repeater_semi_join",
    sql=r"""
    SELECT count(*) AS tagged FROM documents d
    WHERE EXISTS (
      SELECT 1 FROM (
        SELECT regexp_extract(regexp_replace(lower(trim(text)), '[0-9]+', '[NUM]', 'g'),
                              '^(\S+ \S+)', 1) AS norm, count(*) AS c
        FROM documents GROUP BY 1 HAVING count(*) >= 2
      ) r WHERE regexp_extract(regexp_replace(lower(trim(d.text)), '[0-9]+', '[NUM]', 'g'),
                               '^(\S+ \S+)', 1) = r.norm
    )
    """,
)
def q_repeater_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cleaner.py:126-152 repeater tagging as a broadcast semi join back onto
    the element relation (same header-zone key as repeater_detection)."""
    docs = read_table(spark, sf_dir, "documents")
    norm = F.regexp_extract(
        F.regexp_replace(F.lower(F.trim(F.col("text"))), r"[0-9]+", "[NUM]"), r"^(\S+ \S+)", 1
    )
    normalized = docs.select(norm.alias("norm"))
    repeaters = normalized.groupBy("norm").agg(F.count("*").alias("c")).filter(F.col("c") >= 2)
    return (
        normalized.join(F.broadcast(repeaters.select("norm")), on="norm", how="left_semi")
        .agg(F.count("*").alias("tagged"))
    )


@query(
    "interval_containment_join",
    sql="""
    SELECT count(*) AS contained FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_quantity BETWEEN p.p_size * 0.5 AND p.p_size * 2.0
    """,
)
def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """layout_analyzer.py:89-110 element→column interval containment as a
    range-predicate join (x_min <= cx <= x_max analog)."""
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    joined = li.join(part, li.l_partkey == part.p_partkey).where(
        (F.col("l_quantity") >= F.col("p_size") * 0.5) & (F.col("l_quantity") <= F.col("p_size") * 2.0)
    )
    return joined.agg(F.count("*").alias("contained"))


@query(
    "cache_resume_anti_join",
    sql="""
    SELECT count(*) AS pending FROM documents
    WHERE doc_id NOT IN (SELECT doc_id FROM documents WHERE doc_id % 3 = 0)
    """,
)
def q_resume_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """app.py:242-249 cache-hit short-circuit as a left_anti join (the
    checkpoint-resume primitive)."""
    docs = read_table(spark, sf_dir, "documents")
    done = docs.filter(F.col("doc_id") % 3 == 0).select("doc_id")
    return docs.join(done, on="doc_id", how="left_anti").agg(F.count("*").alias("pending"))


# ---------------------------------------------------------------------------
# §2.7 scalar string / normalization twins
# ---------------------------------------------------------------------------


@query(
    "unicode_dash_normalize",
    sql="""
    SELECT CAST(sum(CASE WHEN text LIKE '%—%' OR text LIKE '%–%' OR text LIKE '%−%' THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_dashes,
           CAST(sum(length(replace(replace(replace(replace(text, '—', '-'), '–', '-'), '−', '-'), '―', '-'))) AS BIGINT) AS normalized_chars
    FROM documents
    """,
)
def q_dash_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cleaner.py:237-244 unicode-dash normalization via translate/replace."""
    docs = read_table(spark, sf_dir, "documents")
    has_dash = (
        F.col("text").contains("—") | F.col("text").contains("–") | F.col("text").contains("−")
    )
    normalized = F.translate(F.col("text"), "—–−―", "----")
    return docs.agg(
        F.sum(F.when(has_dash, 1).otherwise(0)).alias("docs_with_dashes"),
        F.sum(F.length(normalized)).alias("normalized_chars"),
    )


@query(
    "collapse_whitespace_normalize",
    sql="""
    SELECT doc_id, lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS normalized
    FROM documents ORDER BY doc_id LIMIT 50
    """,
)
def q_ws_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cleaner.py:95 lowercase + whitespace-collapse normalization."""
    docs = read_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.lower(F.trim(F.regexp_replace("text", r"\s+", " "))).alias("normalized"))
        .orderBy("doc_id")
        .limit(50)
    )


@query(
    "document_id_sha256",
    sql="""
    SELECT doc_id, substring(sha256(text), 1, 16) AS document_id FROM documents ORDER BY doc_id
    """,
)
def q_document_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """metadata_extractor.py:58-75 sha256[:16] document id — built-in sha2."""
    docs = read_table(spark, sf_dir, "documents")
    return docs.select("doc_id", F.substring(F.sha2(F.col("text"), 256), 1, 16).alias("document_id")).orderBy(
        "doc_id"
    )


# ---------------------------------------------------------------------------
# scan/agg/join anchors (TPC-H-shaped; engine-capability baselines for bench)
# ---------------------------------------------------------------------------


@query(
    "pricing_summary",
    sql="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(avg(l_quantity), 4) AS avg_qty,
           round(avg(l_discount), 6) AS avg_disc,
           count(*) AS count_order
    FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus
    """,
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-q1-shaped pricing summary: full scan + partial/final hash agg
    with the ship-date filter pushed to the parquet scan."""
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "shipping_priority",
    sql="""
    SELECT l_orderkey AS orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l_orderkey ORDER BY revenue DESC, orderkey LIMIT 10
    """,
)
def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-q3-shaped 3-way join + agg + TopK; customer broadcast, the
    orders↔lineitem equi-join shuffles on the order key under AQE."""
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1995-03-15")
    li = read_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1995-03-15")
    return (
        F.broadcast(cust)
        .join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.col("l_orderkey").alias("orderkey"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), "orderkey")
        .limit(10)
    )


@query(
    "revenue_forecast",
    sql="""
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
    """,
)
def q_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-q6-shaped selective scan: every predicate reaches the parquet
    reader (PushedFilters), single partial+final agg, no shuffle of data."""
    li = read_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))


@query(
    "regional_supplier_volume",
    sql="""
    SELECT n_name AS nation,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer JOIN orders   ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
                  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
                  JOIN nation   ON s_nationkey = n_nationkey
                  JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name ORDER BY revenue DESC, nation
    """,
)
def q_regional_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-q5-shaped 6-way join: the region→nation dim chain and supplier/
    customer broadcast; only the orders↔lineitem fact join shuffles. The
    region filter prunes the dim chain before it reaches the facts —
    Catalyst pushes r_name to the region scan and the broadcast chain keeps
    the big-side pipeline in one stage."""
    region = read_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = read_table(spark, sf_dir, "nation")
    cust = read_table(spark, sf_dir, "customer")
    supp = read_table(spark, sf_dir, "supplier")
    orders = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = read_table(spark, sf_dir, "lineitem")
    dims = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    return (
        orders.join(li, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), cust.c_custkey == orders.o_custkey)
        .join(
            F.broadcast(dims),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), "nation")
    )


@query(
    "order_priority_check",
    sql="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def q_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-q4-shaped EXISTS decorrelated to a left-semi join: the
    correlated subquery becomes lineitems filtered by the correlation
    predicate joined semi onto orders — one pass over each table, the semi
    join short-circuits on first match and never widens the row."""
    orders = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-07-01") & (F.col("o_orderdate") < "1996-10-01")
    )
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    matched = orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey")) & (F.col("l_shipdate") > F.col("o_orderdate")),
        "left_semi",
    )
    return (
        matched.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "sql_api_reading_order",
    sql="""
    SELECT event_id, user_id,
           row_number() OVER (PARTITION BY user_id ORDER BY value, event_id) AS reading_order
    FROM events ORDER BY user_id, reading_order LIMIT 500
    """,
)
def q_sql_api(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The spark.sql() surface: the XY-cut reading-order window expressed as
    a SQL string over a registered temp view — same Catalyst plan as the
    DataFrame form (xycut_reading_order), proving both API layers hit
    identical semantics."""
    read_table(spark, sf_dir, "events").createOrReplaceTempView("events_v")
    return spark.sql(
        """
        SELECT event_id, user_id,
               row_number() OVER (PARTITION BY user_id ORDER BY value, event_id) AS reading_order
        FROM events_v ORDER BY user_id, reading_order LIMIT 500
        """
    )


@query(
    "pdf_date_parse_relational",
    sql="""
    SELECT iso_date, count(*) AS orders FROM (
      SELECT substr(d, 3, 4) || '-' || substr(d, 7, 2) || '-' || substr(d, 9, 2)
             || 'T' || substr(d, 11, 2) || ':' || substr(d, 13, 2) || ':' || substr(d, 15, 2) AS iso_date
      FROM (SELECT strftime(o_orderdate, 'D:%Y%m%d%H%M%S') AS d FROM orders)
    ) GROUP BY iso_date ORDER BY iso_date LIMIT 20
    """,
)
def q_pdf_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """metadata_extractor.py:18-55 PDF date parse (D:YYYYMMDDHHmmSS → ISO
    8601) as the relational twin: build the D:-format string from a real
    timestamp column, then re-extract the components — exercises the exact
    positional slicing the in-UDF parser uses."""
    orders = read_table(spark, sf_dir, "orders")
    d = F.date_format("o_orderdate", "'D:'yyyyMMddHHmmss")
    iso = F.concat(
        F.substring(d, 3, 4), F.lit("-"), F.substring(d, 7, 2), F.lit("-"), F.substring(d, 9, 2),
        F.lit("T"), F.substring(d, 11, 2), F.lit(":"), F.substring(d, 13, 2), F.lit(":"), F.substring(d, 15, 2),
    )
    return (
        orders.select(iso.alias("iso_date"))
        .groupBy("iso_date")
        .agg(F.count("*").alias("orders"))
        .orderBy("iso_date")
        .limit(20)
    )


@query(
    "hyphen_merge_strict",
    sql=r"""
    SELECT count(DISTINCT merged) AS variants, CAST(sum(length(merged)) AS BIGINT) AS total_len FROM (
      SELECT regexp_replace(
               substr(text, 1, 20) || '-' || chr(10) || lower(substr(text, 22, 10)),
               '([a-zA-Z]+)-\s*\n\s*([a-z]+)', '\1\2', 'g') AS merged
      FROM documents
    )
    """,
)
def q_hyphen_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cleaner.py:5-13 strict hyphen merge as a relational twin: synthesize a
    hyphen-newline break inside each document's text, merge with the strict
    pattern (continuation must be lowercase), and compare aggregate shape —
    a cross-engine backreference-dialect check ($1$2 in Spark, \\1\\2 in
    DuckDB) for the §4.2 parity trap."""
    docs = read_table(spark, sf_dir, "documents")
    broken = F.concat(
        F.substring("text", 1, 20), F.lit("-\n"), F.lower(F.substring("text", 22, 10))
    )
    merged = F.regexp_replace(broken, r"([a-zA-Z]+)-\s*\n\s*([a-z]+)", "$1$2")
    return docs.select(merged.alias("merged")).agg(
        F.count_distinct("merged").alias("variants"),
        F.sum(F.length("merged")).alias("total_len"),
    )


@query(
    "small_quantity_revenue",
    sql="""
    SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#9'
      AND l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                        FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    """,
)
def q_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-q17-shaped correlated subquery, hand-decorrelated: the per-part
    avg(quantity) threshold becomes a groupBy-agg relation broadcast back
    onto the fact join — one scan of lineitem for thresholds, one for facts,
    no per-row subquery execution. The oracle runs the CORRELATED form, so
    the compare also proves decorrelation equivalence."""
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#9")
    thresholds = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (0.2 * F.avg("l_quantity")).alias("qty_threshold")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(thresholds), li.l_partkey == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


# ---------------------------------------------------------------------------
# training-data ops: dedup / similarity / text analysis (delegated modules)
# ---------------------------------------------------------------------------

from ..operators import dedup as _dedup          # noqa: E402
from ..operators import multimodal as _multimodal  # noqa: E402
from ..operators import simsearch as _simsearch  # noqa: E402
from ..operators import textstats as _textstats  # noqa: E402

from ..operators import bpe as _bpe  # noqa: E402
from ..operators import corpusops as _corpusops  # noqa: E402
_dedup.register(query)
_dedup.register_span_dedup(query)
_dedup.register_substring_dedup(query)
_corpusops.register(query)
_corpusops.register_training(query)
_bpe.register(query)
_bpe.register_encode(query)
_simsearch.register(query)
_simsearch.register_pq(query)
_simsearch.register_ivf_pq(query)
_textstats.register(query)
_textstats.register_unigram(query)
_multimodal.register(query)


# ---------------------------------------------------------------------------
# non-SQL-expressible rows-only checks (fused UDF pipeline)
# ---------------------------------------------------------------------------


@query("extract_pipeline_full")  # rows-only: markdown render is not SQL-expressible
def q_extract_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship fused pipeline over the CC-style corpus (per-url markdown
    + quality metrics). Byte parity is enforced by tests/test_golden.py."""
    from ..sources.documents import read_cc_documents
    from ..operators.pipeline import extract_documents

    docs = read_cc_documents(spark, sf_dir)
    return extract_documents(docs).orderBy("url")


@query("role_distribution")  # rows-only: multi-signal classifier is a 30-branch tree
def q_role_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rapidocr_validator.py:110-113 role distribution over the staged
    element pipeline (parse → grouped-map layout analysis → groupBy role)."""
    from ..operators.stages import analyze_layout, parse_elements
    from ..sources.documents import read_cc_documents

    docs = read_cc_documents(spark, sf_dir).filter(F.col("url").contains("/layout/"))
    analyzed = analyze_layout(parse_elements(docs))
    return analyzed.groupBy("semantic_role").agg(F.count("*").alias("n")).orderBy("semantic_role")


@query("extract_method_routing")  # rows-only: router runs inside the parse UDF
def q_method_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """structure_engine.py:902-934 engine routing outcome counts per method."""
    from ..operators.pipeline import extract_documents
    from ..sources.documents import read_cc_documents

    docs = read_cc_documents(spark, sf_dir)
    return (
        extract_documents(docs)
        .groupBy("method")
        .agg(F.count("*").alias("docs"), F.round(F.avg("quality_score"), 4).alias("avg_quality"))
        .orderBy("method")
    )


@query("extract_language_detection")  # rows-only: char-level scripts loop
def q_extract_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """langid over the CC corpus (language_detector.py semantics in-UDF)."""
    from pyspark.sql import types as T

    from ..functions.langid import detect_language
    from ..sources.documents import read_cc_documents

    docs = read_cc_documents(spark, sf_dir)
    lang_of = F.pandas_udf(
        lambda texts: texts.map(lambda t: detect_language(t or "")["language"]),
        T.StringType(),
    )
    return (
        docs.select("url", "lang", lang_of(F.col("text")).alias("detected"))
        .groupBy("lang", "detected")
        .agg(F.count("*").alias("docs"))
        .orderBy("lang", "detected")
    )
