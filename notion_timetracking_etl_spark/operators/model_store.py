"""Persistence for fitted ANN models — the train-once / serve-forever seam.

The session caches in queries/kmeans.py and queries/pq.py amortize a fit
across one session; at production scale the model outlives the session: the
coarse quantizer and PQ codebooks are trained on one (sampled) corpus pass,
frozen, and every later ingest batch is ENCODED against the frozen model —
retraining per job would both waste the training pass and silently shift
cell/code assignments under existing indexes. This module freezes a model
to parquet and rebuilds the serving-side structures from it:

- a k-means model persists as its centroid table (k rows, (cid, cvec)) —
  assignments are NOT persisted: they are corpus-sized, derivable by one
  shuffle-free broadcast-argmin pass, and the whole point of the frozen
  model is encoding NEW corpora the fit never saw;
- a PQ model persists as the union of its M subspace codebooks (M x k
  rows) with a ``sub`` discriminator column.

Loading reads k (or M x k) rows — driver-trivial at any corpus scale — and
re-encoding runs the exact fixed-point assignment the fit used
(operators/kmeans._assign), so codes for vectors the fit DID see are
bit-identical to the fit's own assignments (pinned in tests/test_kmeans.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .kmeans import _as_double_vec, _assign
from .pq import PqModel


def save_kmeans_model(centroids: DataFrame, path: str) -> None:
    """Freeze a fitted quantizer: (cid, cvec array<double>) -> parquet."""
    centroids.select("cid", "cvec").write.mode("overwrite").parquet(path)


def load_kmeans_model(
    spark: SparkSession,
    emb: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """(assignments, centroids) against a frozen quantizer — the same tuple
    shape ``kmeans_fit`` returns, so every consumer (IVF routing, SemDeDup
    partitioning, per-cluster rollups) accepts a loaded model unchanged.
    ``emb`` is the corpus to encode — typically NEW data, not the training
    corpus."""
    cent = spark.read.parquet(path).select("cid", "cvec")
    vec = _as_double_vec(emb, id_col, vec_col)
    return _assign(vec, cent), cent


def save_pq_model(models: PqModel, path: str) -> None:
    """Freeze PQ codebooks: M subspace centroid tables union to one parquet
    of (sub, cid, cvec) — M x k rows."""
    if not models:
        raise ValueError(
            "save_pq_model: refusing to persist a zero-subspace PQ model"
        )
    parts = [
        cent.select(F.lit(j).alias("sub"), "cid", "cvec")
        for j, _asg, cent in models
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    out.write.mode("overwrite").parquet(path)


def load_pq_model(
    spark: SparkSession,
    emb: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int = 64,
) -> PqModel:
    """Rebuild [(sub, assignments, centroids)] from frozen codebooks by
    re-encoding ``emb`` (one broadcast-argmin pass per subspace, shuffle-
    free). The ``m`` is read off the stored ``sub`` column, and each
    subspace slices the same ranges ``pq_fit`` used."""
    stored = spark.read.parquet(path).select("sub", "cid", "cvec")
    subs = sorted(r["sub"] for r in stored.select("sub").distinct().collect())
    if not subs:
        # an empty persisted model (trained on a filtered-to-zero corpus)
        # loads as zero subspaces, not a ZeroDivisionError
        return []
    m = len(subs)
    per = dims // m
    models: PqModel = []
    for j in subs:
        cent = stored.filter(F.col("sub") == j).select("cid", "cvec")
        sub = emb.select(
            F.col(id_col),
            F.slice(F.col(vec_col), j * per + 1, per).alias("sub"),
        )
        vec = _as_double_vec(sub, id_col, "sub")
        models.append((j, _assign(vec, cent), cent))
    return models
