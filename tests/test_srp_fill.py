"""Property tests for the round-4 extension operators: SRP cosine LSH and
per-user forward fill."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import Window

from notion_timetracking_etl_spark.operators.similarity import (
    srp_near_dup_pairs,
    srp_planes,
)


def _mk_corpus(spark, n=60, dims=8, dup_every=10):
    """Deterministic synthetic embeddings; every dup_every-th vector is an
    exact copy of its predecessor (guaranteed SRP collisions, cosine = 1)."""
    rows = []
    for i in range(n):
        src = i - 1 if (i % dup_every == 0 and i > 0) else i
        vec = [math.sin(0.7 * src + 1.3 * j) for j in range(dims)]
        rows.append((i, vec))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_srp_planes_deterministic_and_rademacher():
    p1 = srp_planes(16, 8)
    p2 = srp_planes(16, 8)
    assert p1 == p2
    assert all(v in (1.0, -1.0) for row in p1 for v in row)
    # not degenerate: both signs appear
    flat = [v for row in p1 for v in row]
    assert 0 < flat.count(1.0) < len(flat)


def test_srp_pairs_are_sound_and_exact_dups_always_recalled(spark):
    corpus = _mk_corpus(spark, n=60, dims=8)
    pairs = srp_near_dup_pairs(
        corpus, bits=16, bands=4, threshold=0.3, dims=8
    ).collect()
    # soundness: every reported cosine really is >= threshold, recomputed
    # in plain Python
    vecs = {r["vec_id"]: r["embedding"] for r in corpus.collect()}

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b)))

    for r in pairs:
        assert cos(vecs[r["a"]], vecs[r["b"]]) >= 0.3 - 1e-9, (r["a"], r["b"])
    # recall on exact duplicates is guaranteed: identical vectors share every
    # band bucket, so each planted dup pair MUST be present
    got = {(r["a"], r["b"]) for r in pairs}
    for i in range(10, 60, 10):
        assert (i - 1, i) in got
    # sanity: LSH pruned something (not an all-pairs join)
    assert len(got) < 60 * 59 / 2


def test_forward_fill_matches_python_model(spark):
    rows = [
        # (event_id, user_id, ts_offset, event_type, value)
        (1, 1, 1, "view", 10.0),
        (2, 1, 2, "purchase", 5.0),
        (3, 1, 3, "click", 7.0),
        (4, 1, 4, "purchase", 9.0),
        (5, 1, 5, "view", 1.0),
        (6, 2, 1, "click", 2.0),
        (7, 2, 2, "view", 3.0),
    ]
    df = spark.createDataFrame(
        [(e, u, float(t), et, v) for e, u, t, et, v in rows],
        "event_id long, user_id long, t double, event_type string, value double",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = {
        r["event_id"]: r["fill"]
        for r in df.select(
            "event_id",
            F.last(
                F.when(F.col("event_type") == "purchase", F.col("value")),
                ignorenulls=True,
            ).over(w).alias("fill"),
        ).collect()
    }
    # running last-purchase per user, computed by hand
    assert out == {1: None, 2: 5.0, 3: 5.0, 4: 9.0, 5: 9.0, 6: None, 7: None}
