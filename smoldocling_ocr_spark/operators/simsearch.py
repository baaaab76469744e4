"""Similarity search over the embeddings table (array<float> column).

* brute-force cosine top-k — the correctness baseline: cross join queries ×
  corpus, double-precision dot product via ``F.aggregate``/``zip_with``,
  rank by rounded similarity with id tiebreak (rounding makes the ranking
  stable across engines' float accumulation orders)
* sign-LSH bucketed variant — the scale path: bucket on the sign pattern of
  the first 8 components (a fixed random-hyperplane sketch); candidate pairs
  only form within a bucket, turning the O(n²) cross join into a bucket-local
  join. At 10^9 vectors the bucket key is the shuffle key and per-bucket
  cardinality stays bounded.
* embedding-cosine near-dup — threshold pair scan (dedup family's fifth
  member; BASELINE task list)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..sources.documents import read_table

TOPK = 3
N_QUERIES = 5
NEARDUP_THRESHOLD = 0.40
SIGN_BITS = 8


def _cosine(a, b):
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))
    return dot / (na * nb)


def register(query) -> None:
    @query(
        "ann_cosine_topk",
        sql=f"""
        SELECT query_id, neighbor_id, rank FROM (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY round(list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 5) DESC,
                            c.vec_id
                 ) AS rank
          FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
          WHERE q.vec_id < {N_QUERIES}
        ) WHERE rank <= {TOPK} ORDER BY query_id, rank
        """,
    )
    def ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
        emb = read_table(spark, sf_dir, "embeddings")
        q = emb.filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
        )
        c = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ce"))
        sim = F.round(_cosine(F.col("qe"), F.col("ce")), 5)
        scored = (
            q.join(c, F.col("query_id") != F.col("neighbor_id"))
            .select("query_id", "neighbor_id", sim.alias("sim"))
        )
        w = W.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= TOPK)
            .select("query_id", "neighbor_id", "rank")
            .orderBy("query_id", "rank")
        )

    @query(
        "embedding_cosine_neardup",
        sql=f"""
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) > {NEARDUP_THRESHOLD}
        ORDER BY vec_a, vec_b
        """,
    )
    def neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
        emb = read_table(spark, sf_dir, "embeddings")
        a = emb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"))
        b = emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"))
        sim = _cosine(F.col("ea"), F.col("eb"))
        return (
            a.join(b, F.col("vec_a") < F.col("vec_b"))
            .filter(sim > NEARDUP_THRESHOLD)
            .select("vec_a", "vec_b")
            .orderBy("vec_a", "vec_b")
        )

    sign_sql = " || ".join(
        f"(CASE WHEN embedding[{i + 1}] > 0 THEN '1' ELSE '0' END)" for i in range(SIGN_BITS)
    )

    @query(
        "ann_lsh_buckets",
        sql=f"""
        SELECT bucket, count(*) AS vectors FROM (
          SELECT vec_id, {sign_sql} AS bucket FROM embeddings
        ) GROUP BY bucket HAVING count(*) >= 2 ORDER BY bucket
        """,
    )
    def lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
        emb = read_table(spark, sf_dir, "embeddings")
        bucket = F.concat(
            *[
                F.when(F.element_at(F.col("embedding"), i + 1) > 0, "1").otherwise("0")
                for i in range(SIGN_BITS)
            ]
        ).alias("bucket")
        return (
            emb.select(bucket)
            .groupBy("bucket")
            .agg(F.count("*").alias("vectors"))
            .filter(F.col("vectors") >= 2)
            .orderBy("bucket")
        )

    @query(
        "ann_lsh_candidate_pairs",
        sql=f"""
        WITH b AS (SELECT vec_id, {sign_sql} AS bucket FROM embeddings)
        SELECT a.vec_id AS vec_a, c.vec_id AS vec_b
        FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
        ORDER BY vec_a, vec_b
        """,
    )
    def lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
        emb = read_table(spark, sf_dir, "embeddings")
        bucket = F.concat(
            *[
                F.when(F.element_at(F.col("embedding"), i + 1) > 0, "1").otherwise("0")
                for i in range(SIGN_BITS)
            ]
        )
        b = emb.select("vec_id", bucket.alias("bucket"))
        a = b.alias("a")
        c = b.alias("c")
        return (
            a.join(c, (F.col("a.bucket") == F.col("c.bucket")) & (F.col("a.vec_id") < F.col("c.vec_id")))
            .select(F.col("a.vec_id").alias("vec_a"), F.col("c.vec_id").alias("vec_b"))
            .orderBy("vec_a", "vec_b")
        )

    @query(
        "embedding_label_centroids",
        sql="""
        SELECT label, count(*) AS members,
               round(avg(embedding[1]::DOUBLE), 5) AS c0,
               round(avg(embedding[2]::DOUBLE), 5) AS c1
        FROM embeddings GROUP BY label ORDER BY label
        """,
    )
    def centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
        """IVF coarse-quantizer building block: per-label centroid components."""
        emb = read_table(spark, sf_dir, "embeddings")
        return (
            emb.groupBy("label")
            .agg(
                F.count("*").alias("members"),
                F.round(F.avg(F.element_at("embedding", 1).cast("double")), 5).alias("c0"),
                F.round(F.avg(F.element_at("embedding", 2).cast("double")), 5).alias("c1"),
            )
            .orderBy("label")
        )
