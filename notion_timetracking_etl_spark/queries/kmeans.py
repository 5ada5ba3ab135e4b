"""Registered k-means query (engine extension): Lloyd's over the embeddings
table, fully oracle-replayed — the DuckDB SQL regenerates every iteration
(assign → update → assign …) with the same deterministic init and the same
exact-decimal distance convention, so the cross-engine hash pins the entire
iterative computation, not just summary statistics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from ..operators.kmeans import kmeans
from ..sources.tpch import load_table
from .helpers import ordered_small
from .registry import register

K = 8
ITERS = 3


def _oracle_sql(k: int, iters: int) -> str:
    ctes = [
        f"cd0 AS (SELECT vec_id AS cid, generate_subscripts(embedding,1) AS pos,"
        f" CAST(unnest(embedding) AS DOUBLE) AS val FROM"
        f" (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT {k}))",
        "vdims AS (SELECT vec_id, generate_subscripts(embedding,1) AS pos,"
        " CAST(unnest(embedding) AS DOUBLE) AS val FROM embeddings)",
    ]
    for i in range(iters):
        ctes.append(
            f"d{i} AS (SELECT v.vec_id, c.cid,"
            f" SUM(CAST(floor((v.val-c.val)*(v.val-c.val)*1e12 + 0.5)"
            f" AS DECIMAL(38,0))) AS dist"
            f" FROM vdims v JOIN cd{i} c USING (pos) GROUP BY 1, 2)"
        )
        ctes.append(
            f"a{i} AS (SELECT vec_id, cid, dist FROM"
            f" (SELECT vec_id, cid, dist, row_number() OVER"
            f" (PARTITION BY vec_id ORDER BY dist, cid) AS rn FROM d{i})"
            f" WHERE rn = 1)"
        )
        if i < iters - 1:
            ctes.append(
                f"m{i + 1} AS (SELECT a.cid, v.pos,"
                f" CAST(SUM(CAST(floor(v.val * 1e12 + 0.5) AS DECIMAL(38,0)))"
                f" AS DOUBLE) / (CAST(count(*) AS DOUBLE) * 1e12)"
                f" AS val FROM vdims v JOIN a{i} a USING (vec_id) GROUP BY 1, 2)"
            )
            ctes.append(
                f"cd{i + 1} AS (SELECT cd.cid, cd.pos,"
                f" COALESCE(m.val, cd.val) AS val FROM cd{i} cd"
                f" LEFT JOIN m{i + 1} m ON m.cid = cd.cid AND m.pos = cd.pos)"
            )
    last = iters - 1
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
        SELECT cid AS cluster_id,
               CAST(count(*) AS BIGINT) AS n_members,
               CAST(sum(vec_id) AS BIGINT) AS vec_id_checksum,
               CAST(SUM(dist) AS DOUBLE) / 1e12 AS inertia
        FROM a{last}
        GROUP BY cid
        ORDER BY cluster_id
    """
    )


@register(
    "kmeans_embeddings",
    "A3-ext,J4-analog",
    f"Distributed Lloyd's k-means (k={K}, {ITERS} iterations, deterministic "
    "min-id init) over the 64-dim embeddings: shuffle-free assignment via a "
    "broadcast centroid array + row-local argmin fold, k×dims-row update "
    "shuffles via map-side partial aggregation, per-iteration centroid "
    "checkpoints. Exact-decimal distances make the whole iterative "
    "computation cross-engine replayable; the oracle regenerates every "
    "iteration in SQL. Output: per-cluster size, member checksum, inertia.",
    oracle=_oracle_sql(K, ITERS),
)
def kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    asg = kmeans(emb, "vec_id", "embedding", k=K, iters=ITERS)
    return ordered_small(
        asg.groupBy("cid")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.sum("vec_id").cast("bigint").alias("vec_id_checksum"),
            (F.sum("dist").cast("double") / F.lit(1e12)).alias("inertia"),
        )
        .select(
            F.col("cid").alias("cluster_id"),
            "n_members",
            "vec_id_checksum",
            "inertia",
        ),
        "cluster_id",
    )
