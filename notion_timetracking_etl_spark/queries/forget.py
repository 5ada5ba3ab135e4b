"""Deletion propagation — right-to-be-forgotten sweeps (engine extension,
r9 verdict task #5).

The most-requested real-pipeline operation the surface lacked: prove that a
tombstoned entity's removal reaches EVERY derived surface, with hashed
before/after evidence and the touched-partition bound that makes the sweep
affordable at 100 TB.

Two sweeps, two entity kinds:

- **Documents** (``deletion_propagation_docs``): tombstoned doc_ids leave
  the corpus; the near-dup CLUSTER graph re-canonicalizes (clusters whose
  representative died elect a new surviving rep; zero surviving doc may
  still reference a dead rep) and the SHARD MANIFEST re-routes (tombstones
  hold no shard slot; the re-rank moves only boundary-crossing docs). The
  pair list is NOT recomputed — MinHash LSH candidacy and Jaccard verify
  are strictly pairwise, so the surviving pair graph IS the full graph
  filtered to surviving endpoints (the production sweep filters the
  materialized pair lake, never re-shingles the corpus).
- **Events / sketch lake** (``deletion_propagation_sketch_lake``): a GDPR
  user-delete rebuilds KMV partials ONLY for the date partitions the user
  appears in; untouched partitions are REUSED from the lake as-is, and the
  stitched lake (reused + rebuilt) must merge hash-EQUAL to a from-scratch
  sketch of the post-delete corpus — the partition bound is the efficiency
  claim (touched/total counts are output columns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from ..operators.cluster import connected_components
from ..sources.tpch import load_table
from .dedup import MINHASH_PAIRS_CTES, near_dup_pairs_cached
from .helpers import ordered_small
from .layout import N_SHARDS, SHARD_TARGET_BYTES
from .registry import register

# deterministic tombstone sets, present at every scale factor
DELETED_DOC_PRED = "doc_id % 100 = 7"
DELETED_USER_PRED = "user_id = 3"


def _count1(df: DataFrame, alias: str) -> DataFrame:
    return df.agg(F.count(F.lit(1)).cast("bigint").alias(alias))


def _cluster_assign(universe: DataFrame, pairs: DataFrame) -> DataFrame:
    """(doc_id, cluster_rep) over ``universe`` given verified pairs."""
    cc = connected_components(pairs, "a", "b")
    return universe.join(cc, universe.doc_id == cc.node, "left").select(
        "doc_id",
        F.coalesce(F.col("component"), F.col("doc_id")).alias("cluster_rep"),
    )


def _shard_assign(docs: DataFrame) -> DataFrame:
    """(doc_id, shard_id) — the one shared shard convention
    (queries/layout.py::shard_perm/shard_assignments), so the sweep audits
    the SAME permutation the manifest and router produce."""
    from .layout import shard_assignments, shard_perm

    keyed = docs.select(
        "doc_id", "n_chars", shard_perm(F.col("doc_id")).alias("perm")
    )
    return shard_assignments(keyed).select("doc_id", "shard_id")


_FORGET_DOCS_ORACLE = f"""
        WITH RECURSIVE {MINHASH_PAIRS_CTES},
        dead AS (SELECT doc_id FROM documents WHERE {DELETED_DOC_PRED}),
        alive AS (SELECT doc_id, n_chars FROM documents
                  WHERE NOT ({DELETED_DOC_PRED})),
        edges_b AS (
          SELECT a AS x, b AS y FROM pairs
          UNION SELECT b AS x, a AS y FROM pairs
        ),
        reach_b AS (
          SELECT x, y FROM edges_b
          UNION
          SELECT r.x, e.y FROM reach_b r JOIN edges_b e ON r.y = e.x
        ),
        rep_b AS (SELECT x, least(x, min(y)) AS component
                  FROM reach_b GROUP BY x),
        assign_b AS (
          SELECT d.doc_id,
                 CAST(COALESCE(r.component, d.doc_id) AS BIGINT) AS rep
          FROM documents d LEFT JOIN rep_b r ON r.x = d.doc_id
        ),
        pairs_a AS (
          SELECT a, b FROM pairs
          WHERE a NOT IN (SELECT doc_id FROM dead)
            AND b NOT IN (SELECT doc_id FROM dead)
        ),
        edges_a AS (
          SELECT a AS x, b AS y FROM pairs_a
          UNION SELECT b AS x, a AS y FROM pairs_a
        ),
        reach_a AS (
          SELECT x, y FROM edges_a
          UNION
          SELECT r.x, e.y FROM reach_a r JOIN edges_a e ON r.y = e.x
        ),
        rep_a AS (SELECT x, least(x, min(y)) AS component
                  FROM reach_a GROUP BY x),
        assign_a AS (
          SELECT d.doc_id,
                 CAST(COALESCE(r.component, d.doc_id) AS BIGINT) AS rep
          FROM alive d LEFT JOIN rep_a r ON r.x = d.doc_id
        ),
        shard_b AS (
          SELECT doc_id,
                 CAST(NTILE((SELECT GREATEST({N_SHARDS},
                        CAST(COALESCE(SUM(n_chars), 0) AS BIGINT)
                        // {SHARD_TARGET_BYTES}) FROM documents)) OVER
                      (ORDER BY sha256(CAST(doc_id AS VARCHAR))) - 1
                      AS BIGINT) AS shard_id
          FROM documents
        ),
        shard_a AS (
          SELECT doc_id,
                 CAST(NTILE((SELECT GREATEST({N_SHARDS},
                        CAST(COALESCE(SUM(n_chars), 0) AS BIGINT)
                        // {SHARD_TARGET_BYTES}) FROM alive)) OVER
                      (ORDER BY sha256(CAST(doc_id AS VARCHAR))) - 1
                      AS BIGINT) AS shard_id
          FROM alive
        ),
        m AS (
          SELECT
            (SELECT CAST(COUNT(*) AS BIGINT) FROM dead) AS n_tombstones,
            (SELECT CAST(COALESCE(SUM(n_chars), 0) AS BIGINT)
             FROM documents WHERE {DELETED_DOC_PRED}) AS bytes_removed,
            (SELECT CAST(COUNT(*) AS BIGINT) FROM alive) AS n_docs_after,
            (SELECT CAST(COUNT(DISTINCT rep) AS BIGINT) FROM assign_b)
              AS n_clusters_before,
            (SELECT CAST(COUNT(DISTINCT rep) AS BIGINT) FROM assign_a)
              AS n_clusters_after,
            (SELECT CAST(COUNT(*) AS BIGINT) FROM
               (SELECT DISTINCT rep FROM assign_b) rb
             WHERE rb.rep IN (SELECT doc_id FROM dead))
              AS n_reps_deleted,
            (SELECT CAST(COUNT(*) AS BIGINT)
             FROM assign_a a JOIN assign_b b USING (doc_id)
             WHERE a.rep <> b.rep) AS n_rerooted_docs,
            (SELECT CAST(COUNT(*) AS BIGINT) FROM assign_a
             WHERE rep IN (SELECT doc_id FROM dead))
              AS n_orphan_refs_after,
            (SELECT CAST(COUNT(*) AS BIGINT)
             FROM shard_a a JOIN shard_b b USING (doc_id)
             WHERE a.shard_id <> b.shard_id) AS n_resharded,
            (SELECT CAST(COUNT(*) AS BIGINT) FROM shard_a
             WHERE doc_id IN (SELECT doc_id FROM dead))
              AS n_tombstones_in_shards_after
        )
        SELECT * FROM m
    """


@register(
    "deletion_propagation_docs",
    "A6-ext,J7-analog,V4-analog",
    "Right-to-be-forgotten sweep over the DOCUMENT surfaces (r9 verdict "
    f"task #5): tombstones ({DELETED_DOC_PRED}) leave the corpus and the "
    "query proves the removal reached every derived surface — near-dup "
    "CLUSTERS re-canonicalize (n_reps_deleted clusters elect a new "
    "surviving representative; n_orphan_refs_after counts surviving docs "
    "still pointing at a dead rep and MUST be 0 — the propagation proof), "
    "and the SHARD MANIFEST re-routes under the corpus-size-adaptive "
    "shard count (tombstones hold no slot — "
    "n_tombstones_in_shards_after MUST be 0; n_resharded counts the "
    "boundary-crossing moves of the re-rank). The pair graph is FILTERED, "
    "never recomputed: MinHash LSH candidacy and Jaccard verify are "
    "strictly pairwise, so surviving-pairs == full-pairs restricted to "
    "surviving endpoints (the production sweep filters the materialized "
    "pair lake instead of re-shingling 100 TB). The oracle replays both "
    "cluster closures (before/after), both shard permutations and every "
    "count end-to-end.",
    oracle=_FORGET_DOCS_ORACLE,
)
def deletion_propagation_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    dead = docs.filter(F.expr(DELETED_DOC_PRED)).select("doc_id")
    alive = docs.filter(~F.expr(DELETED_DOC_PRED))

    pairs = near_dup_pairs_cached(spark, sf_dir)
    dead_a = F.broadcast(dead.select(F.col("doc_id").alias("a")))
    dead_b = F.broadcast(dead.select(F.col("doc_id").alias("b")))
    pairs_alive = pairs.join(dead_a, "a", "left_anti").join(
        dead_b, "b", "left_anti"
    )
    assign_b = _cluster_assign(docs.select("doc_id"), pairs).withColumnRenamed(
        "cluster_rep", "rep_b"
    )
    assign_a = _cluster_assign(
        alive.select("doc_id"), pairs_alive
    ).withColumnRenamed("cluster_rep", "rep_a")

    shard_b = _shard_assign(docs).withColumnRenamed("shard_id", "sh_b")
    shard_a = _shard_assign(alive).withColumnRenamed("shard_id", "sh_a")

    # the tombstone set re-joins surfaces that share the docs lineage —
    # rename its column so Spark's ambiguous-self-join check can't trip
    dead_ids = F.broadcast(dead.select(F.col("doc_id").alias("dead_id")))
    out = (
        _count1(dead, "n_tombstones")
        .crossJoin(
            F.broadcast(
                docs.filter(F.expr(DELETED_DOC_PRED)).agg(
                    F.coalesce(F.sum("n_chars"), F.lit(0))
                    .cast("bigint")
                    .alias("bytes_removed")
                )
            )
        )
        .crossJoin(F.broadcast(_count1(alive, "n_docs_after")))
        .crossJoin(
            F.broadcast(
                assign_b.agg(
                    F.countDistinct("rep_b")
                    .cast("bigint")
                    .alias("n_clusters_before")
                )
            )
        )
        .crossJoin(
            F.broadcast(
                assign_a.agg(
                    F.countDistinct("rep_a")
                    .cast("bigint")
                    .alias("n_clusters_after")
                )
            )
        )
        .crossJoin(
            F.broadcast(
                _count1(
                    assign_b.select("rep_b")
                    .distinct()
                    .join(dead_ids, F.col("rep_b") == F.col("dead_id")),
                    "n_reps_deleted",
                )
            )
        )
        .crossJoin(
            F.broadcast(
                _count1(
                    assign_a.join(assign_b, "doc_id").filter(
                        F.col("rep_a") != F.col("rep_b")
                    ),
                    "n_rerooted_docs",
                )
            )
        )
        .crossJoin(
            F.broadcast(
                _count1(
                    assign_a.join(dead_ids, F.col("rep_a") == F.col("dead_id")),
                    "n_orphan_refs_after",
                )
            )
        )
        .crossJoin(
            F.broadcast(
                _count1(
                    shard_a.join(shard_b, "doc_id").filter(
                        F.col("sh_a") != F.col("sh_b")
                    ),
                    "n_resharded",
                )
            )
        )
        .crossJoin(
            F.broadcast(
                _count1(
                    shard_a.join(
                        dead_ids, F.col("doc_id") == F.col("dead_id")
                    ),
                    "n_tombstones_in_shards_after",
                )
            )
        )
    )
    return ordered_small(out, "n_tombstones")


def _forget_lake_oracle_sql() -> str:
    from .sketches import KMV_K

    return f"""
        WITH keyed AS (
          SELECT DISTINCT CAST(ts AS DATE) AS d, event_type AS g, user_id,
                 concat(user_id, ':',
                        strftime(CAST(ts AS DATE), '%Y-%m-%d')) AS key
          FROM events
          WHERE user_id IS NOT NULL AND ts IS NOT NULL
        ),
        hashed AS (
          SELECT d, g, user_id,
                 CAST(concat('0x', substr(sha256(concat('kmv:', key)),
                      1, 14)) AS BIGINT) AS h
          FROM keyed
        ),
        part_before AS (
          SELECT d, g, h FROM (
            SELECT d, g, h,
                   ROW_NUMBER() OVER (PARTITION BY d, g ORDER BY h) AS rn
            FROM hashed
          ) WHERE rn <= {KMV_K}
        ),
        touched AS (
          SELECT DISTINCT d FROM keyed WHERE {DELETED_USER_PRED}
        ),
        kept AS (
          SELECT d, g, h FROM part_before
          WHERE d NOT IN (SELECT d FROM touched)
        ),
        rebuilt AS (
          SELECT d, g, h FROM (
            SELECT d, g, h,
                   ROW_NUMBER() OVER (PARTITION BY d, g ORDER BY h) AS rn
            FROM hashed
            WHERE d IN (SELECT d FROM touched)
              AND NOT ({DELETED_USER_PRED})
          ) WHERE rn <= {KMV_K}
        ),
        stitched AS (
          SELECT * FROM kept UNION ALL SELECT * FROM rebuilt
        ),
        ms AS (
          SELECT coalesce(g, chr(0) || '<null>') AS gk, g,
                 CAST(MAX(h) AS BIGINT) AS kth_min,
                 CAST(COUNT(*) AS BIGINT) AS n_in_sketch
          FROM (SELECT g, h, ROW_NUMBER() OVER
                  (PARTITION BY g ORDER BY h) AS rn FROM stitched)
          WHERE rn <= {KMV_K} GROUP BY g
        ),
        scratch AS (
          SELECT coalesce(g, chr(0) || '<null>') AS gk,
                 CAST(MAX(h) AS BIGINT) AS kth_s,
                 CAST(COUNT(*) AS BIGINT) AS n_s
          FROM (SELECT g, h, ROW_NUMBER() OVER
                  (PARTITION BY g ORDER BY h) AS rn
                FROM hashed WHERE NOT ({DELETED_USER_PRED}))
          WHERE rn <= {KMV_K} GROUP BY g
        ),
        cb AS (
          SELECT coalesce(g, chr(0) || '<null>') AS gk,
                 CAST(COUNT(DISTINCT d) AS BIGINT) AS n_partials_total,
                 CAST(COUNT(DISTINCT d) FILTER (
                      WHERE d IN (SELECT d FROM touched)) AS BIGINT)
                   AS n_partials_touched
          FROM part_before GROUP BY g
        )
        SELECT ms.g AS event_type,
               cb.n_partials_total,
               cb.n_partials_touched,
               ms.kth_min,
               ms.n_in_sketch,
               (ms.kth_min = scratch.kth_s AND ms.n_in_sketch = scratch.n_s)
                 AS stitched_equals_scratch
        FROM ms
        JOIN scratch USING (gk)
        JOIN cb USING (gk)
        ORDER BY event_type
    """


@register(
    "deletion_propagation_sketch_lake",
    "S6-analog,A10-ext,V4-analog",
    "Right-to-be-forgotten sweep over the PERSISTED SKETCH LAKE (r9 "
    f"verdict task #5): a GDPR user-delete ({DELETED_USER_PRED}) rebuilds "
    "KMV partials ONLY for the date partitions the user appears in — "
    "untouched partitions are REUSED from the lake verbatim, which is the "
    "efficiency claim (n_partials_touched / n_partials_total are output "
    "columns; a user's keys embed their dates, so no other partition can "
    "change). The stitched lake (reused + rebuilt) must merge hash-EQUAL "
    "to a from-scratch whole-corpus sketch of the post-delete events — "
    "the stitched_equals_scratch flag flips red if the sweep missed a "
    "partition, rebuilt one it shouldn't have, or broke the merge. NULL "
    "event_type groups ride the null-coalesced join key like every lake "
    "audit. The oracle replays partials, touch detection, partition "
    "rebuild, stitching and both merges from the raw events view.",
    oracle=_forget_lake_oracle_sql(),
)
def deletion_propagation_sketch_lake(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from .lake import kmv_merge_sketch, kmv_sketch_lake

    gk = F.coalesce(F.col("g"), F.lit("\x00<null>")).alias("gk")
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    # the partitions the deleted user can possibly affect (O(dates) rows)
    touched = F.broadcast(
        ev.filter(F.expr(DELETED_USER_PRED))
        .select(F.to_date("ts").alias("event_date"))
        .distinct()
    )

    before = kmv_sketch_lake(spark, sf_dir)
    kept = before.join(touched, "event_date", "left_anti")
    from .lake import kmv_dated_hashes, kmv_partial_sketches

    # the post-delete key/hash stream through the ONE canonical recipe
    # (lake.kmv_dated_hashes with a caller-filtered events view) — a copied
    # recipe that drifted would only surface at runtime as a stitched-lake
    # hash mismatch
    hashed_after = kmv_dated_hashes(
        spark, sf_dir, ev=ev.filter(~F.expr(DELETED_USER_PRED))
    )
    # rebuild ONLY the touched partitions from the post-delete corpus: the
    # date semi-join prunes the scan to those partitions in production
    rebuilt = kmv_partial_sketches(hashed_after.join(touched, "event_date"))
    stitched = kept.unionByName(rebuilt)

    ms = kmv_merge_sketch(stitched.select("g", "h")).withColumn("gk", gk)
    scratch = kmv_merge_sketch(hashed_after.select("g", "h")).select(
        gk,
        F.col("kth_min").alias("kth_s"),
        F.col("n_in_sketch").alias("n_s"),
    )
    cb = (
        before.join(
            touched.withColumn("is_touched", F.lit(1)), "event_date", "left"
        )
        .groupBy("g")
        .agg(
            F.countDistinct("event_date")
            .cast("bigint")
            .alias("n_partials_total"),
            F.countDistinct(
                F.when(F.col("is_touched") == 1, F.col("event_date"))
            )
            .cast("bigint")
            .alias("n_partials_touched"),
        )
        .select(gk, "n_partials_total", "n_partials_touched")
    )
    return ordered_small(
        ms.join(scratch, "gk")
        .join(cb, "gk")
        .select(
            F.col("g").alias("event_type"),
            "n_partials_total",
            "n_partials_touched",
            "kth_min",
            "n_in_sketch",
            (
                (F.col("kth_min") == F.col("kth_s"))
                & (F.col("n_in_sketch") == F.col("n_s"))
            ).alias("stitched_equals_scratch"),
        ),
        "event_type",
    )
