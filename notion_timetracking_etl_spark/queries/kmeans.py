"""Registered k-means query (engine extension): Lloyd's over the embeddings
table, fully oracle-replayed — the DuckDB SQL regenerates every iteration
(assign → update → assign …) with the same deterministic init and the same
exact-decimal distance convention, so the cross-engine hash pins the entire
iterative computation, not just summary statistics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from ..operators.kmeans import kmeans_fit
from ..sources.tpch import load_table
from .helpers import ordered_small
from .registry import register
from .similarity import load_embeddings

K = 8
ITERS = 3

# Fitted quantizer cached per (session, sf_dir) — the train-once/serve-many
# shape: kmeans_embeddings and similarity_topk_ivf_kmeans share one model,
# exactly like the pipeline family's canon/derived session caches. The
# cached centroid table is k rows (a localCheckpoint NOT registered for
# scoped release, so bench/parity harnesses can't evict it between
# queries); assignments rebuild from it as a cheap shuffle-free plan.
_MODEL_CACHE: dict[tuple[str, str], tuple[DataFrame, DataFrame]] = {}


def fitted_model(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """(assignments, centroids) for the session-shared (k=K, ITERS) model."""
    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _MODEL_CACHE.get(key)
    if cached is None:
        emb = load_embeddings(spark, sf_dir)
        cached = kmeans_fit(
            emb, "vec_id", "embedding", k=K, iters=ITERS, scoped=False
        )
        _MODEL_CACHE[key] = cached
    return cached


def kmeans_ctes(k: int, iters: int) -> tuple[list[str], str, str]:
    """The k-means iterations as DuckDB CTEs. Returns (cte_list,
    final_assignment_cte, final_centroid_dims_cte) — the last two name the
    CTEs holding (vec_id, cid, dist) and (cid, pos, val) after ``iters``
    iterations, for oracles that consume the fitted model (e.g. IVF)."""
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
    return ctes, f"a{iters - 1}", f"cd{iters - 1}"


def _oracle_sql(k: int, iters: int) -> str:
    ctes, a_last, _cd_last = kmeans_ctes(k, iters)
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
        SELECT cid AS cluster_id,
               CAST(count(*) AS BIGINT) AS n_members,
               CAST(sum(vec_id) AS BIGINT) AS vec_id_checksum,
               CAST(SUM(dist) AS DOUBLE) / 1e12 AS inertia
        FROM {a_last}
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
    asg, _cent = fitted_model(spark, sf_dir)
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


SEMDEDUP_T = 0.3


def _semdedup_oracle_sql(k: int, iters: int, threshold: float) -> str:
    from .similarity import _cosine_sql

    ctes, a_last, _cd_last = kmeans_ctes(k, iters)
    ctes = ctes + [
        f"mem AS (SELECT a.cid, a.vec_id, e.embedding"
        f" FROM {a_last} a JOIN embeddings e USING (vec_id))",
        f"pairs AS (SELECT l.cid, r.vec_id AS b"
        f" FROM mem l JOIN mem r ON l.cid = r.cid AND l.vec_id < r.vec_id"
        f" WHERE {_cosine_sql('l.embedding', 'r.embedding')} >= {threshold})",
        "removed AS (SELECT DISTINCT cid, b FROM pairs)",
        "rm AS (SELECT cid, CAST(COUNT(*) AS BIGINT) AS n_removed,"
        " CAST(SUM(b) AS BIGINT) AS removed_checksum FROM removed GROUP BY 1)",
        f"sizes AS (SELECT cid, CAST(COUNT(*) AS BIGINT) AS n_members"
        f" FROM {a_last} GROUP BY 1)",
    ]
    return (
        "WITH "
        + ",\n".join(ctes)
        + """
        SELECT sizes.cid AS cluster_id,
               n_members,
               CAST(COALESCE(rm.n_removed, 0) AS BIGINT) AS n_removed,
               CAST(n_members - COALESCE(rm.n_removed, 0) AS BIGINT) AS n_kept,
               CAST(COALESCE(rm.removed_checksum, 0) AS BIGINT)
                 AS removed_checksum
        FROM sizes LEFT JOIN rm USING (cid)
        ORDER BY cluster_id
    """
    )


@register(
    "semdedup_embeddings",
    "A6-ext-sem,J4-analog",
    f"SemDeDup (Abbas et al. 2023): semantic dedup via the learned k-means "
    f"partition — cluster the embedding space (k={K}, {ITERS} Lloyd's "
    f"iterations, the session-shared quantizer), compare pairs ONLY within "
    f"a cluster, and remove every vector with cosine >= {SEMDEDUP_T} to a "
    "lower-id cluster-mate (deterministic keep-lowest-id). The pair space "
    "is (n/k)^2 per cluster, never corpus^2 — k grows with the corpus so "
    "cluster size stays bounded; the within-cluster self-join is salted "
    "16x for parallelism beyond the cluster count. Output: per-cluster "
    "members/removed/kept + removed-id checksum. The oracle replays "
    "training, pairing, and the prune end-to-end in SQL.",
    oracle=_semdedup_oracle_sql(K, ITERS, SEMDEDUP_T),
)
def semdedup_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import embedding_near_dup_pairs

    asg, _cent = fitted_model(spark, sf_dir)
    emb = load_embeddings(spark, sf_dir)
    mem = asg.select("vec_id", "cid").join(
        emb.select("vec_id", "embedding"), "vec_id"
    )
    pairs = embedding_near_dup_pairs(
        mem.select(F.col("cid").alias("label"), "vec_id", "embedding"),
        threshold=SEMDEDUP_T,
    )
    rm = (
        pairs.select(F.col("label").alias("cid"), "b")
        .distinct()
        .groupBy("cid")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_removed"),
            F.sum("b").cast("bigint").alias("removed_checksum"),
        )
    )
    sizes = asg.groupBy("cid").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members")
    )
    return ordered_small(
        sizes.join(rm, "cid", "left").select(
            F.col("cid").alias("cluster_id"),
            "n_members",
            F.coalesce(F.col("n_removed"), F.lit(0)).cast("bigint")
            .alias("n_removed"),
            (
                F.col("n_members") - F.coalesce(F.col("n_removed"), F.lit(0))
            ).cast("bigint").alias("n_kept"),
            F.coalesce(F.col("removed_checksum"), F.lit(0)).cast("bigint")
            .alias("removed_checksum"),
        ),
        "cluster_id",
    )


def _semdedup_incr_oracle_sql(k: int, iters: int, threshold: float) -> str:
    from .similarity import _cosine_sql

    ctes, a_last, _cd_last = kmeans_ctes(k, iters)
    ctes = ctes + [
        f"mem AS (SELECT a.cid, a.vec_id, e.embedding"
        f" FROM {a_last} a JOIN embeddings e USING (vec_id))",
        f"xp AS (SELECT b.cid, b.vec_id, c.vec_id AS matched_vec,"
        f" {_cosine_sql('b.embedding', 'c.embedding')} AS cos"
        f" FROM mem b JOIN mem c ON b.cid = c.cid"
        f" WHERE b.vec_id % 10 = 9 AND c.vec_id % 10 <> 9"
        f" AND {_cosine_sql('b.embedding', 'c.embedding')} >= {threshold})",
    ]
    return (
        "WITH "
        + ",\n".join(ctes)
        + """
        SELECT vec_id, CAST(cid AS BIGINT) AS cell, matched_vec, cos
        FROM (
          SELECT vec_id, cid, matched_vec, cos,
                 row_number() OVER (
                   PARTITION BY vec_id ORDER BY cos DESC, matched_vec
                 ) AS rn
          FROM xp
        )
        WHERE rn = 1
        ORDER BY vec_id
    """
    )


@register(
    "semdedup_incremental",
    "A6-ext-sem,J8-analog",
    "Incremental-ingest SEMANTIC dedup gate — the embedding twin of "
    "dedup_incremental_batch: the arriving batch (vec_id % 10 = 9) routes "
    "through the frozen quantizer (broadcast centroids, shuffle-free) and "
    f"compares ONLY against corpus vectors in its own cell, cosine >= "
    f"{SEMDEDUP_T}. Per flagged batch vector: its best corpus match "
    "(highest cosine, tie to the smallest corpus id) — the row an ingest "
    "pipeline uses to drop or link the arrival. Cost is O(batch x "
    "cell-size) per ingest; the corpus pair space is never generated. In "
    "production the quantizer comes from operators/model_store.py; here "
    "it is the session-shared fit so the oracle can replay it.",
    oracle=_semdedup_incr_oracle_sql(K, ITERS, SEMDEDUP_T),
)
def semdedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import cosine_prenormed, norm_sq

    asg, _cent = fitted_model(spark, sf_dir)
    emb = load_embeddings(spark, sf_dir)
    mem = (
        asg.select("vec_id", "cid")
        .join(emb.select("vec_id", "embedding"), "vec_id")
        .withColumn("nrm", F.sqrt(norm_sq(F.col("embedding"))))
    )
    is_new = F.col("vec_id") % 10 == 9
    batch = mem.filter(is_new).select(
        "cid",
        F.col("vec_id"),
        F.col("embedding").alias("vb"),
        F.col("nrm").alias("nb"),
    )
    corpus = mem.filter(~is_new).select(
        "cid",
        F.col("vec_id").alias("matched_vec"),
        F.col("embedding").alias("vc"),
        F.col("nrm").alias("nc"),
    )
    pairs = (
        batch.join(corpus, "cid")
        .select(
            "cid",
            "vec_id",
            "matched_vec",
            cosine_prenormed(
                F.col("vb"), F.col("vc"), F.col("nb"), F.col("nc")
            ).alias("cos"),
        )
        .filter(F.col("cos") >= SEMDEDUP_T)
    )
    # best corpus match per arriving vector via MAX over a comparison
    # struct (map-side combine, no per-key window sort); cosine ties break
    # to the SMALLEST corpus id, hence the negated id inside the struct.
    best = (
        pairs.groupBy("vec_id")
        .agg(
            F.max(
                F.struct(
                    F.col("cos"),
                    (-F.col("matched_vec")).alias("nm"),
                    F.col("cid").alias("cell"),
                )
            ).alias("m")
        )
        .select(
            "vec_id",
            F.col("m.cell").cast("bigint").alias("cell"),
            (-F.col("m.nm")).alias("matched_vec"),
            F.col("m.cos").alias("cos"),
        )
    )
    return best.orderBy("vec_id")


N_PROBE = 2


def _ivf_oracle_sql(k: int, iters: int, n_probe: int, topk: int) -> str:
    from .similarity import _cosine_sql, _QUERY_PRED

    ctes, a_last, cd_last = kmeans_ctes(k, iters)
    ctes = ctes + [
        f"q AS (SELECT vec_id AS query_id, embedding AS query_vec"
        f" FROM embeddings WHERE {_QUERY_PRED})",
        # routing distance = the training metric (fixed-point sq dist)
        f"dq AS (SELECT v.vec_id AS query_id, c.cid,"
        f" SUM(CAST(floor((v.val-c.val)*(v.val-c.val)*1e12 + 0.5)"
        f" AS DECIMAL(38,0))) AS dist"
        f" FROM vdims v JOIN {cd_last} c USING (pos)"
        f" WHERE v.vec_id IN (SELECT query_id FROM q) GROUP BY 1, 2)",
        f"probes AS (SELECT query_id, cid FROM"
        f" (SELECT query_id, cid, row_number() OVER"
        f" (PARTITION BY query_id ORDER BY dist, cid) AS rn FROM dq)"
        f" WHERE rn <= {n_probe})",
        f"cells AS (SELECT a.cid, a.vec_id, e.embedding"
        f" FROM {a_last} a JOIN embeddings e USING (vec_id))",
        f"scored AS (SELECT p.query_id, cl.cid AS cell, cl.vec_id,"
        f" {_cosine_sql('q.query_vec', 'cl.embedding')} AS cos"
        f" FROM probes p JOIN q USING (query_id)"
        f" JOIN cells cl ON cl.cid = p.cid)",
        "ranked AS (SELECT query_id, cell, vec_id, cos,"
        " row_number() OVER (PARTITION BY query_id"
        " ORDER BY cos DESC, vec_id ASC) AS rank FROM scored)",
    ]
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
        SELECT query_id, rank, cell, vec_id, cos
        FROM ranked WHERE rank <= {topk}
        ORDER BY query_id, rank
    """
    )


@register(
    "similarity_topk_ivf_kmeans",
    "J4-analog,A1,O3",
    f"True IVF ANN: k-means coarse quantizer (k={K}, {ITERS} iterations) "
    f"trained on the corpus, each query probes its {N_PROBE} nearest cells "
    "(fixed-point routing metric = the training metric), exact cosine "
    "re-rank inside the probed cells only. The production composition of "
    "kmeans_embeddings + similarity_topk_ivf: centroids broadcast for both "
    "routing and cell fan-out; the oracle replays training, routing and "
    "re-rank end-to-end in SQL.",
    oracle=_ivf_oracle_sql(K, ITERS, N_PROBE, 10),
)
def similarity_topk_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import topk_ivf_kmeans
    from .similarity import _query_set

    emb = load_embeddings(spark, sf_dir)
    corpus = emb.select("vec_id", "embedding")
    out = topk_ivf_kmeans(
        corpus,
        _query_set(spark, sf_dir),
        k=10,
        n_probe=N_PROBE,
        model=fitted_model(spark, sf_dir),
    )
    return ordered_small(
        out.select("query_id", "rank", F.col("cell").cast("bigint"), "vec_id", "cos"),
        "query_id",
        "rank",
    )
