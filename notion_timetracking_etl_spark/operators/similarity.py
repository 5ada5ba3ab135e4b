"""Similarity search over embedding columns (engine extension).

- **Brute-force cosine top-k** — the exact baseline: query-set × corpus join,
  FP-exact cosine, window top-k. Scales as |Q|·|C|; fine for small query sets,
  and the corpus side stays fully partition-parallel (queries broadcast).
- **IVF top-k** — the scale path: corpus pre-bucketed by ``label`` (the
  testdata's cluster id; in production, a KMeans assignment), one deterministic
  representative per bucket; a query probes only its nearest bucket. Search
  cost drops to |Q|·(buckets + bucket_size).

Cosine uses a strict left-to-right IEEE double fold over the array (order
fixed per row → deterministic under any partitioning), matching DuckDB's
``list_reduce`` bit-for-bit; final sqrt/divide are single IEEE ops.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F
from pyspark.sql.window import Window


def _seq_fold(arr: Column) -> Column:
    """Strict left-to-right IEEE double sum of an array.

    Array order is fixed per row, so this is deterministic regardless of
    partitioning — and it is bit-identical to DuckDB's ``list_reduce`` fold
    (decimal rounding of arbitrary doubles is NOT cross-engine stable, so the
    helpers.dsum convention doesn't apply to embeddings).
    """
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def dot(a: Column, b: Column) -> Column:
    return _seq_fold(F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")))


def norm_sq(a: Column) -> Column:
    return _seq_fold(F.transform(a, lambda x: x.cast("double") * x.cast("double")))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(norm_sq(a)) * F.sqrt(norm_sq(b)))


def cosine_prenormed(a: Column, b: Column, norm_a: Column, norm_b: Column) -> Column:
    """Cosine with per-row norms hoisted out of the pair loop.

    ``norm_a``/``norm_b`` must be ``sqrt(norm_sq(v))`` of the same vectors —
    the value is then bit-identical to :func:`cosine` (same fold, same
    multiply/divide order) while the O(pairs) work drops from three array
    folds to one."""
    return dot(a, b) / (norm_a * norm_b)


def topk_bruteforce(
    corpus: DataFrame, queries: DataFrame, k: int = 10
) -> DataFrame:
    """Exact cosine top-k per query vector.

    ``queries``: (query_id, query_vec); ``corpus``: (vec_id, embedding).
    Ties break on vec_id ascending for determinism.
    """
    queries = queries.withColumn("q_norm", F.sqrt(norm_sq(F.col("query_vec"))))
    corpus = corpus.withColumn("c_norm", F.sqrt(norm_sq(F.col("embedding"))))
    scored = corpus.crossJoin(F.broadcast(queries)).select(
        "query_id",
        "vec_id",
        cosine_prenormed(
            F.col("query_vec"), F.col("embedding"), F.col("q_norm"), F.col("c_norm")
        ).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cos")
    )


def bucket_representatives(corpus: DataFrame) -> DataFrame:
    """One deterministic representative vector per label bucket (min vec_id).

    A production IVF uses centroids; the min-id representative keeps the
    operator FP-exact and oracle-checkable while exercising the same plan
    shape (tiny broadcastable routing table).
    """
    w = Window.partitionBy("label").orderBy("vec_id")
    return (
        corpus.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("label", F.col("embedding").alias("rep_vec"))
    )


def topk_ivf(corpus: DataFrame, queries: DataFrame, k: int = 10) -> DataFrame:
    """IVF-style top-k: route each query to its nearest bucket representative,
    then exact top-k within that bucket only."""
    reps = bucket_representatives(corpus)
    queries = queries.withColumn("q_norm", F.sqrt(norm_sq(F.col("query_vec"))))
    routed = (
        queries.crossJoin(F.broadcast(reps))
        .select(
            "query_id",
            "query_vec",
            "q_norm",
            "label",
            cosine(F.col("query_vec"), F.col("rep_vec")).alias("rep_cos"),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.col("rep_cos").desc(), F.col("label").asc()
                )
            ),
        )
        .filter(F.col("rn") == 1)
        .select("query_id", "query_vec", "q_norm", "label")
    )
    scored = (
        corpus.withColumn("c_norm", F.sqrt(norm_sq(F.col("embedding"))))
        .join(F.broadcast(routed), "label")
        .select(
            "query_id",
            "label",
            "vec_id",
            cosine_prenormed(
                F.col("query_vec"), F.col("embedding"), F.col("q_norm"), F.col("c_norm")
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "label", "rank", "vec_id", "cos")
    )


def embedding_near_dup_pairs(
    corpus: DataFrame, threshold: float = 0.95, salts: int = 16
) -> DataFrame:
    """Embedding-cosine near-dup pairs, blocked by label bucket (a < b).

    Blocking bounds the pair space to within-bucket; at scale the label comes
    from LSH/KMeans so buckets stay small and the self-join shuffles per
    bucket, never the full O(n²).

    Two scale levers beyond the blocking itself:
    - per-row norms are hoisted out of the pair loop (one array fold per
      candidate pair instead of three);
    - the left side is salted on ``a % salts`` and the right side replicated
      per salt, so parallelism is labels×salts instead of being capped at the
      (typically tiny) label cardinality. Each (a, b) pair still appears in
      exactly one salt bucket."""
    normed = corpus.withColumn("nrm", F.sqrt(norm_sq(F.col("embedding"))))
    left = normed.select(
        F.col("label"),
        F.pmod(F.col("vec_id"), F.lit(salts)).alias("salt"),
        F.col("vec_id").alias("a"),
        F.col("embedding").alias("va"),
        F.col("nrm").alias("na"),
    )
    right = normed.select(
        F.col("label"),
        F.explode(F.sequence(F.lit(0), F.lit(salts - 1))).alias("salt"),
        F.col("vec_id").alias("b"),
        F.col("embedding").alias("vb"),
        F.col("nrm").alias("nb"),
    )
    return (
        left.join(right, ["label", "salt"])
        .filter(F.col("a") < F.col("b"))
        .select(
            "label",
            "a",
            "b",
            cosine_prenormed(
                F.col("va"), F.col("vb"), F.col("na"), F.col("nb")
            ).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )
