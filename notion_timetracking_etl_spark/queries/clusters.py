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
from ..sources.tpch import load_table
from .dedup import MINHASH_PAIRS_CTES, near_dup_pairs_cached
from .registry import register
from .text import _QUALITY_SCORE_SQL


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
    # session-materialized pair list shared with dedup_minhash_lsh/pagerank
    pairs = near_dup_pairs_cached(spark, sf_dir)
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


_PR_ITERS = 3


def _pagerank_oracle() -> str:
    # base_num must be BIT-IDENTICAL to the Spark side's teleport constant:
    # operators/pagerank.py computes `1.0 - DAMPING` in Python double
    # arithmetic = 0.15000000000000002, one ulp above CAST(0.15 AS DOUBLE).
    # Writing the same subtraction here makes both engines start from the
    # same double instead of relying on final-addition rounding to absorb
    # the difference (ADVICE r3: ~12-37% of (n, contrib) combinations would
    # NOT absorb it).
    damping = "CAST(0.85 AS DOUBLE)"
    base_num = "(CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE))"
    ctes = [
        "und AS (SELECT a AS src, b AS dst FROM pairs"
        " UNION ALL SELECT b AS src, a AS dst FROM pairs)",
        "deg AS (SELECT src, count(*) AS deg FROM und GROUP BY src)",
        "nodes AS (SELECT DISTINCT src AS node FROM und)",
        "nn AS (SELECT count(*) AS n FROM nodes)",
        "p0 AS (SELECT node, CAST(1.0 AS DOUBLE) / nn.n AS p FROM nodes, nn)",
    ]
    for i in range(_PR_ITERS):
        ctes.append(
            f"c{i} AS (SELECT e.dst,"
            f" CAST(SUM(CAST(floor(p.p / d.deg * 1e12 + 0.5)"
            f" AS DECIMAL(38,0))) AS DOUBLE) / 1e12 AS contrib"
            f" FROM und e JOIN p{i} p ON p.node = e.src"
            f" JOIN deg d ON d.src = e.src GROUP BY e.dst)"
        )
        ctes.append(
            f"p{i + 1} AS (SELECT nodes.node,"
            f" ({base_num} / nn.n) + {damping} * COALESCE(c.contrib,"
            f" CAST(0.0 AS DOUBLE)) AS p"
            f" FROM nodes CROSS JOIN nn LEFT JOIN c{i} c ON c.dst = nodes.node)"
        )
    return (
        ",\n".join(ctes)
        + f"""
        SELECT p.node, CAST(d.deg AS BIGINT) AS degree, p.p AS pagerank
        FROM p{_PR_ITERS} p JOIN deg d ON d.src = p.node
        ORDER BY pagerank DESC, node ASC
        LIMIT 20
    """
    )


@register(
    "pagerank_dup_graph",
    "A3-ext,J8",
    f"PageRank ({_PR_ITERS} power iterations, damping 0.85) over the "
    "MinHash near-dup graph: top-20 duplication hubs — the documents most "
    "central to template/boilerplate/mirror structure, the triage signal "
    "after clustering. One keyed shuffle per iteration (messages p/deg "
    "along edges, map-side partial sums), per-round checkpoints, fixed-"
    "point exact accumulation; the oracle regenerates the full power "
    "iteration in SQL off the same pair CTEs as dedup_clusters.",
    oracle=f"""
        WITH {MINHASH_PAIRS_CTES},
        {_pagerank_oracle()}
    """,
)
def pagerank_dup_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.pagerank import pagerank

    # session-materialized pair list shared with the other dup-graph queries
    pairs = near_dup_pairs_cached(spark, sf_dir)
    pr = pagerank(pairs, "a", "b", iters=_PR_ITERS)
    # bounded top-20 → TakeOrdered, no full sort
    return pr.orderBy(F.col("pagerank").desc(), F.col("node").asc()).limit(20)


@register(
    "graph_triangle_participation",
    "A-ext-graph,J8",
    "Per-document triangle participation in the near-dup graph — the "
    "clustering-coefficient numerator that separates tight dup cliques "
    "from chain-shaped false-positive paths. Node-iterator enumeration "
    "with ID orientation (each triangle counted once as an x<y<z wedge "
    "closed by a semi-join; three keyed shuffles, fan-out bounded by "
    "oriented adjacency — operators/cluster.py::triangle_participation). "
    "The oracle replays the same oriented wedge closure off the shared "
    "MinHash pair CTEs.",
    oracle=f"""
        WITH {MINHASH_PAIRS_CTES},
        e AS (SELECT a, b FROM pairs),
        tri AS (
          SELECT e1.a AS x, e1.b AS y, e2.b AS z
          FROM e e1
          JOIN e e2 ON e2.a = e1.b
          WHERE EXISTS (
            SELECT 1 FROM e e3 WHERE e3.a = e1.a AND e3.b = e2.b)
        )
        SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
        FROM (
          SELECT x AS node FROM tri
          UNION ALL SELECT y FROM tri
          UNION ALL SELECT z FROM tri
        ) participants
        GROUP BY node
        ORDER BY node
    """,
)
def graph_triangle_participation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.cluster import triangle_participation

    pairs = near_dup_pairs_cached(spark, sf_dir)
    return triangle_participation(pairs).orderBy("node")


@register(
    "dedup_keep_best_quality",
    "A6,J8,O3-analog",
    "Quality-aware canonical selection — the step between cluster "
    "assignment and the final corpus: within each multi-document near-dup "
    "cluster, KEEP the highest-quality member (exact integer-micro quality "
    "argmax, doc id tiebreak) instead of the arbitrary min-id, and report "
    "what deduplication saves (dropped docs/bytes per cluster). Quality is "
    "computed map-side per document; the argmax is one struct-min groupBy "
    "(no window), so the plan is two keyed shuffles past the shared pair "
    "list at any corpus size. The oracle replays the same closure and "
    "picks the representative with a per-cluster ROW_NUMBER.",
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
          SELECT d.doc_id, d.n_chars,
                 CAST(COALESCE(r.component, d.doc_id) AS BIGINT)
                   AS cluster_rep,
                 CAST(COALESCE(floor(({_QUALITY_SCORE_SQL}) * 1000000.0), 0)
                      AS BIGINT) AS q_micro
          FROM documents d LEFT JOIN rep r ON r.x = d.doc_id
        ),
        best AS (
          SELECT cluster_rep, doc_id, q_micro, n_chars,
                 ROW_NUMBER() OVER (PARTITION BY cluster_rep
                     ORDER BY q_micro DESC, doc_id) AS rk
          FROM assign
        ),
        agg AS (
          SELECT cluster_rep,
                 CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(SUM(n_chars) AS BIGINT) AS total_bytes
          FROM assign GROUP BY cluster_rep
        )
        SELECT a.cluster_rep, a.n_docs,
               b.doc_id AS kept_doc_id,
               b.q_micro AS kept_q_micro,
               CAST(a.n_docs - 1 AS BIGINT) AS dropped_docs,
               CAST(a.total_bytes - b.n_chars AS BIGINT) AS dropped_bytes
        FROM agg a
        JOIN best b ON b.cluster_rep = a.cluster_rep AND b.rk = 1
        WHERE a.n_docs > 1
        ORDER BY a.cluster_rep
    """,
)
def dedup_keep_best_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import quality_score

    docs = load_table(spark, sf_dir, "documents")
    pairs = near_dup_pairs_cached(spark, sf_dir)
    cc = connected_components(pairs, "a", "b")
    assign = docs.select(
        "doc_id",
        "n_chars",
        # NULL text scores 0 (worst) on BOTH engines — a NULL q_micro would
        # otherwise ride each engine's divergent NULL ordering into the argmax
        F.coalesce(
            F.floor(quality_score(F.col("text")) * 1000000.0), F.lit(0)
        )
        .cast("bigint")
        .alias("q_micro"),
    ).join(cc, docs.doc_id == cc.node, "left").select(
        "doc_id",
        "n_chars",
        "q_micro",
        F.coalesce(F.col("component"), F.col("doc_id")).alias("cluster_rep"),
    )
    # exact argmax without a window: struct-min on (-quality, doc_id); the
    # kept doc's n_chars rides along in the struct (never compared — the
    # (q, id) prefix is already unique)
    picked = assign.groupBy("cluster_rep").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_bytes"),
        F.min(
            F.struct(
                (-F.col("q_micro")).alias("nq"),
                F.col("doc_id").alias("d"),
                F.col("n_chars").alias("nc"),
            )
        ).alias("m"),
    )
    return (
        picked.filter(F.col("n_docs") > 1)
        .select(
            "cluster_rep",
            "n_docs",
            F.col("m.d").alias("kept_doc_id"),
            (-F.col("m.nq")).cast("bigint").alias("kept_q_micro"),
            (F.col("n_docs") - 1).cast("bigint").alias("dropped_docs"),
            (F.col("total_bytes") - F.col("m.nc")).cast("bigint")
            .alias("dropped_bytes"),
        )
        .orderBy("cluster_rep")
    )
