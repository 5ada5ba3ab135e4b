"""Product quantization (PQ) for ANN search (engine extension).

The production memory/compute trade for billion-vector ANN: split each
vector into M subspaces, k-means each subspace independently (codebooks of
k centroids), store every vector as M small codes, and answer queries with
ADC (asymmetric distance computation) — the query stays full-precision,
its distance to each codebook centroid is precomputed (M×k entries, a
broadcastable lookup table), and a vector's approximate distance is the
SUM of its codes' table entries. At 100 TB the corpus never moves: codes
are M bytes/vector, the per-query work is one broadcast-join + grouped sum
over the code table — no vector arithmetic on the corpus side at query
time.

Everything reuses the k-means operator's fixed-point distance convention
(floor(x*1e12+0.5) → DECIMAL(38,0) sums), so ADC distances are exact
integers in pico-units, order-independent, and bit-replayable in the
DuckDB oracle (queries/pq.py regenerates the per-subspace trainings, the
code assignments, the query distance tables, and the ADC ranking in SQL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

from .kmeans import _SQDIST, kmeans_fit

PqModel = list[tuple[int, DataFrame, DataFrame]]  # (sub, assignments, centroids)


def pq_fit(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 4,
    k: int = 8,
    iters: int = 2,
    dims: int = 64,
    scoped: bool = True,
) -> PqModel:
    """Train M independent subspace codebooks (Lloyd's, deterministic
    min-id init per subspace — kmeans_fit conventions). Returns
    [(sub, assignments, centroids)]; the assignments ARE the PQ codes
    (vec_id -> nearest codebook centroid per subspace). ``scoped=False``
    hands checkpoint lifetime to the caller (a session-cached model reused
    across queries — the production fit-once shape)."""
    per = dims // m
    models: PqModel = []
    for j in range(m):
        sub = emb.select(
            F.col(id_col), F.slice(F.col(vec_col), j * per + 1, per).alias("sub")
        )
        asg, cent = kmeans_fit(sub, id_col, "sub", k=k, iters=iters, scoped=scoped)
        models.append((j, asg, cent))
    return models


def pq_codes(models: PqModel) -> DataFrame:
    """(vec_id, sub, code, dist) — the encoded corpus, M rows per vector."""
    if not models:
        # honor load_pq_model's zero-subspace contract with a diagnosable
        # error instead of an IndexError (r11 review): there is nothing to
        # encode against
        raise ValueError(
            "pq_codes: PQ model has zero subspaces (trained on an empty "
            "corpus?) — nothing to encode against"
        )
    parts = [
        asg.select(
            "vec_id",
            F.lit(j).alias("sub"),
            F.col("cid").alias("code"),
            "dist",
        )
        for j, asg, _ in models
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def pq_adc_topk(
    models: PqModel,
    queries: DataFrame,
    k_top: int = 10,
    m: int = 4,
    dims: int = 64,
) -> DataFrame:
    """ADC top-k: per query, distance to every codebook centroid is
    computed once (M×k rows, broadcast); corpus codes join that table and
    a grouped DECIMAL sum yields each vector's approximate distance. The
    only corpus-sized work is one broadcast join + one combinable
    aggregation on (query, vector) — vectors themselves never move. The
    top-k itself goes through the salted two-phase ``topk_per_group``, never
    a per-query ``row_number`` window: a query's ADC partition is
    corpus-sized, and one task sorting the corpus is exactly the
    single-partition funnel operators/rank.py exists to prevent."""
    from .sampling import topk_per_group

    per = dims // m
    qd_parts = []
    for j, _, cent in models:
        qsub = queries.select(
            "query_id",
            F.expr(
                f"transform(slice(query_vec, {j * per + 1}, {per}),"
                " x -> cast(x as double))"
            ).alias("dvec"),
        )
        cent_row = cent.agg(
            F.array_sort(F.collect_list(F.struct("cid", "cvec"))).alias("cents")
        )
        qd_parts.append(
            qsub.crossJoin(F.broadcast(cent_row))
            .select(
                "query_id",
                F.explode(
                    F.expr(
                        "transform(cents, c -> "
                        f"struct(c.cid as code, {_SQDIST} as dist))"
                    )
                ).alias("s"),
            )
            .select(
                "query_id",
                F.lit(j).alias("sub"),
                F.col("s.code").alias("code"),
                F.col("s.dist").alias("dist"),
            )
        )
    qd = qd_parts[0]
    for p in qd_parts[1:]:
        qd = qd.unionAll(p)

    codes = pq_codes(models).select("vec_id", "sub", "code")
    adc = (
        codes.join(F.broadcast(qd), ["sub", "code"])
        .groupBy("query_id", "vec_id")
        .agg(F.sum("dist").alias("adc"))
    )
    return topk_per_group(
        adc, ["query_id"], [F.col("adc"), F.col("vec_id")], k_top, rank_col="rank"
    ).select(
        "query_id",
        F.col("rank").cast("bigint").alias("rank"),
        "vec_id",
        (F.col("adc").cast("double") / F.lit(1e12)).alias("adc_dist"),
    )


_EXACT_SQDIST = (
    "cast(aggregate(zip_with(dvec, qdvec, "
    "(a, b) -> floor((a - b) * (a - b) * 1e12 + 0.5)), "
    "cast(0 as decimal(38,0)), "
    "(acc, x) -> cast(acc + cast(x as decimal(38,0)) as decimal(38,0))) "
    "as decimal(38,0))"
)


def exact_rerank(
    short: DataFrame,
    queries: DataFrame,
    corpus: DataFrame,
    k_top: int = 10,
) -> DataFrame:
    """Exact fixed-point re-rank of (query_id, vec_id) shortlist pairs —
    full vectors touched for the shortlist only."""
    from pyspark.sql import Window

    qvec = queries.select(
        "query_id",
        F.expr("transform(query_vec, x -> cast(x as double))").alias("qdvec"),
    )
    cvec = corpus.select(
        "vec_id",
        F.expr("transform(embedding, x -> cast(x as double))").alias("dvec"),
    )
    exact = (
        short.join(F.broadcast(qvec), "query_id")
        .join(cvec, "vec_id")
        .select("query_id", "vec_id", F.expr(_EXACT_SQDIST).alias("dist"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("dist").asc(), F.col("vec_id"))
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k_top)
        .select(
            "query_id",
            F.col("rank").cast("bigint").alias("rank"),
            "vec_id",
            (F.col("dist").cast("double") / F.lit(1e12)).alias("dist"),
        )
    )


def pq_search(
    models: PqModel,
    queries: DataFrame,
    corpus: DataFrame,
    shortlist: int = 100,
    k_top: int = 10,
    m: int = 4,
    dims: int = 64,
) -> DataFrame:
    """Production PQ search: ADC shortlist (cheap, codes only) then EXACT
    re-rank of the shortlist (full vectors touched for |Q|·shortlist rows
    only). Same fixed-point distance convention end-to-end, so the final
    ranking is deterministic and oracle-replayable. Measured on the
    isotropic testdata (the hard case): recall@10 ≈ 0.88 at k=16,
    shortlist=100 vs 0.42 for ADC-only top-10 — the re-rank stage is where
    PQ earns its keep."""
    from pyspark.sql import Window

    short = pq_adc_topk(models, queries, k_top=shortlist, m=m, dims=dims).select(
        "query_id", "vec_id"
    )
    return exact_rerank(short, queries, corpus, k_top=k_top)


def ivfpq_search(
    coarse_asg: DataFrame,
    coarse_cent: DataFrame,
    models: PqModel,
    queries: DataFrame,
    corpus: DataFrame,
    n_probe: int = 2,
    shortlist: int = 50,
    k_top: int = 10,
    m: int = 4,
    dims: int = 64,
) -> DataFrame:
    """IVF-PQ: the coarse k-means quantizer routes each query to its
    n_probe nearest cells, and PQ ADC + exact re-rank run over the probed
    cells' members only. The full production stack: cells prune the corpus
    (cost drops by ~n_probe/k_cells), codes make the surviving candidates
    M bytes each, the re-rank touches |Q|·shortlist full vectors. Every
    stage keeps the fixed-point convention, so the composite is
    oracle-replayable end-to-end. (Codebooks here are global, FAISS's
    by_residual=false configuration — residual codebooks would break the
    clean per-stage SQL replay for a modest recall gain.)"""
    from pyspark.sql import Window

    from .sampling import topk_per_group

    # route: distance from each query's FULL vector to every coarse centroid
    qfull = queries.select(
        "query_id",
        F.expr("transform(query_vec, x -> cast(x as double))").alias("dvec"),
    )
    cent_row = coarse_cent.agg(
        F.array_sort(F.collect_list(F.struct("cid", "cvec"))).alias("cents")
    )
    dq = (
        qfull.crossJoin(F.broadcast(cent_row))
        .select(
            "query_id",
            F.explode(
                F.expr(
                    "transform(cents, c -> "
                    f"struct(c.cid as cid, {_SQDIST} as dist))"
                )
            ).alias("s"),
        )
        .select("query_id", F.col("s.cid").alias("cid"), F.col("s.dist").alias("dist"))
    )
    wp = Window.partitionBy("query_id").orderBy(F.col("dist").asc(), F.col("cid"))
    probes = (
        dq.withColumn("rn", F.row_number().over(wp))
        .filter(F.col("rn") <= n_probe)
        .select("query_id", "cid")
    )
    # candidates: members of the probed cells (each vector lives in exactly
    # one cell, so (query, vec) pairs are unique)
    cand = coarse_asg.select("vec_id", "cid").join(
        F.broadcast(probes), "cid"
    ).select("query_id", "vec_id")

    # ADC restricted to candidates: expand to (candidate, sub) rows, then
    # the broadcast code-distance lookup
    per = dims // m
    qd_parts = []
    for j, _, cent in models:
        qsub = queries.select(
            "query_id",
            F.expr(
                f"transform(slice(query_vec, {j * per + 1}, {per}),"
                " x -> cast(x as double))"
            ).alias("dvec"),
        )
        crow = cent.agg(
            F.array_sort(F.collect_list(F.struct("cid", "cvec"))).alias("cents")
        )
        qd_parts.append(
            qsub.crossJoin(F.broadcast(crow))
            .select(
                "query_id",
                F.explode(
                    F.expr(
                        "transform(cents, c -> "
                        f"struct(c.cid as code, {_SQDIST} as dist))"
                    )
                ).alias("s"),
            )
            .select(
                "query_id",
                F.lit(j).alias("sub"),
                F.col("s.code").alias("code"),
                F.col("s.dist").alias("dist"),
            )
        )
    qd = qd_parts[0]
    for p in qd_parts[1:]:
        qd = qd.unionAll(p)

    codes = pq_codes(models).select("vec_id", "sub", "code")
    adc = (
        cand.join(codes, "vec_id")
        .join(F.broadcast(qd), ["query_id", "sub", "code"])
        .groupBy("query_id", "vec_id")
        .agg(F.sum("dist").alias("adc"))
    )
    # Salted two-phase top-k, not a per-query row_number window: a probed
    # cell can hold a large corpus fraction, and its (query, candidate) ADC
    # rows would otherwise sort through a single task.
    short = topk_per_group(
        adc, ["query_id"], [F.col("adc"), F.col("vec_id")], shortlist
    ).select("query_id", "vec_id")
    return exact_rerank(short, queries, corpus, k_top=k_top)
