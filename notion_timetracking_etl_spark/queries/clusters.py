"""Dedup cluster assignment (engine extension): near-dup pairs → connected
components → one kept representative per cluster.

The oracle reproduces the exact pipeline in DuckDB: same MinHash pair CTEs
(queries/dedup.py::MINHASH_PAIRS_CTES), then a recursive-CTE transitive
closure instead of the iterative label propagation — different algorithm,
identical fixpoint, which is exactly what a cross-engine check should pin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from ..operators.cluster import connected_components
from ..operators.dedup import minhash_near_dup_pairs
from ..sources.tpch import load_table
from .dedup import MINHASH_PAIRS_CTES
from .registry import register


@register(
    "dedup_clusters",
    "A6,J8,F20",
    "Near-dup cluster assignment: MinHash+LSH verified pairs → min-label "
    "connected components → every document labeled with its cluster "
    "representative (smallest doc id) and cluster size. The full "
    "dedup-and-keep-one decision for a training corpus: keep doc_id == "
    "cluster_rep, drop the rest.",
    oracle=f"""
        WITH RECURSIVE {MINHASH_PAIRS_CTES},
        edges AS (
          SELECT a AS x, b AS y FROM pairs
          UNION
          SELECT b AS x, a AS y FROM pairs
        ),
        reach AS (
          SELECT x, y FROM edges
          UNION
          SELECT r.x, e.y FROM reach r JOIN edges e ON r.y = e.x
        ),
        rep AS (
          SELECT x, least(x, min(y)) AS component FROM reach GROUP BY x
        ),
        assign AS (
          SELECT d.doc_id,
                 CAST(COALESCE(r.component, d.doc_id) AS BIGINT) AS cluster_rep
          FROM documents d LEFT JOIN rep r ON r.x = d.doc_id
        ),
        csizes AS (
          SELECT cluster_rep, CAST(count(*) AS BIGINT) AS cluster_size
          FROM assign GROUP BY cluster_rep
        )
        SELECT assign.doc_id, assign.cluster_rep, csizes.cluster_size,
               CAST(assign.doc_id = assign.cluster_rep AS BOOLEAN) AS keep
        FROM assign JOIN csizes USING (cluster_rep)
        ORDER BY doc_id
    """,
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_near_dup_pairs(
        docs, "doc_id", "text", num_hashes=12, bands=3, threshold=0.5, shingle_n=3
    )
    cc = connected_components(pairs, "a", "b")
    assign = docs.select("doc_id").join(
        cc, docs.doc_id == cc.node, "left"
    ).select(
        "doc_id",
        F.coalesce(F.col("component"), F.col("doc_id")).alias("cluster_rep"),
    )
    sizes = assign.groupBy("cluster_rep").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    # O(corpus) output → distributed orderBy
    return (
        assign.join(sizes, "cluster_rep")
        .select(
            "doc_id",
            "cluster_rep",
            "cluster_size",
            (F.col("doc_id") == F.col("cluster_rep")).alias("keep"),
        )
        .orderBy("doc_id")
    )
