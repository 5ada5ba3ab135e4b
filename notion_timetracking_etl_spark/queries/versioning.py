"""Corpus version management (engine extension).

Training corpora ship as versioned snapshots; every refresh needs a diff
audit — how many documents each source added, removed, or changed — before
the new version replaces the old one in a mixture plan. The reference has a
single-snapshot model (one API pull per run); at 100 TB the snapshot diff is
a first-class operator.

The second snapshot is derived deterministically from the first (fixed
modulus rules on doc_id — no Date.now()/rand(), replayable bit-identically
by the DuckDB oracle), so the diff operator itself is what's under test:
compare by content fingerprint, never by text equality on the join.

Scale shape: both sides project to (doc_id, source, 64-hex sha256) at the
scan, the diff is ONE full-outer shuffle join on doc_id (unique per side —
no fan-out), and the report aggregates to |sources| x 4 counters with
map-side partial aggregation. Text bytes never shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from ..sources.tpch import load_table
from .registry import register

# Deterministic v1 -> v2 simulation rules (shared by both engines):
# removed: doc_id % 17 == 3; changed: surviving docs with doc_id % 13 == 5
# (content re-fingerprinted); added: docs with doc_id % 19 == 7 re-enter
# under doc_id + 100_000_000 with new content.
_ADD_OFFSET = 100_000_000


@register(
    "corpus_snapshot_diff",
    "ext:versioning,J5-analog,A10-analog",
    "Corpus snapshot diff: v2 is derived from the documents table by fixed "
    "modulus rules (deletions, content revisions, additions under offset "
    "ids), then diffed against v1 by content FINGERPRINT through one "
    "full-outer join on doc_id — per-source added/removed/changed/"
    "unchanged counters, the audit gate a versioned 100 TB corpus runs "
    "before a refresh ships. Fingerprints (64 hex) shuffle, text never "
    "does; the report is |sources|-bounded.",
    oracle=f"""
        WITH v1 AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, source,
                           sha256(text) AS fp
                    FROM documents),
        v2 AS (
            SELECT CAST(doc_id AS BIGINT) AS doc_id, source,
                   CASE WHEN doc_id % 13 = 5 THEN sha256(text || ' rev2')
                        ELSE sha256(text) END AS fp
            FROM documents WHERE doc_id % 17 <> 3
            UNION ALL
            SELECT CAST(doc_id AS BIGINT) + {_ADD_OFFSET}, source,
                   sha256(text || ' new')
            FROM documents WHERE doc_id % 19 = 7
        ),
        d AS (SELECT COALESCE(v1.source, v2.source, '(unknown)') AS source,
                     CASE WHEN v1.doc_id IS NULL THEN 'added'
                          WHEN v2.doc_id IS NULL THEN 'removed'
                          WHEN v1.fp IS DISTINCT FROM v2.fp THEN 'changed'
                          ELSE 'unchanged' END AS status
              FROM v1 FULL OUTER JOIN v2 USING (doc_id))
        SELECT source,
               CAST(SUM(CASE WHEN status = 'added' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_added,
               CAST(SUM(CASE WHEN status = 'removed' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_removed,
               CAST(SUM(CASE WHEN status = 'changed' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_changed,
               CAST(SUM(CASE WHEN status = 'unchanged' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_unchanged
        FROM d GROUP BY source ORDER BY source
    """,
)
def corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # Project to fingerprints AT THE SCAN — the only columns that ever
    # shuffle are (doc_id, source, 64-hex). NULL text fingerprints to NULL
    # on both engines; presence is therefore tracked by explicit markers,
    # never by fp nullness.
    v1 = docs.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("source").alias("src1"),
        F.sha2(F.col("text"), 256).alias("fp1"),
        F.lit(True).alias("in1"),
    )
    base = docs.filter(F.col("doc_id") % 17 != 3).select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("source").alias("src2"),
        F.when(
            F.col("doc_id") % 13 == 5,
            F.sha2(F.concat(F.col("text"), F.lit(" rev2")), 256),
        )
        .otherwise(F.sha2(F.col("text"), 256))
        .alias("fp2"),
        F.lit(True).alias("in2"),
    )
    added = docs.filter(F.col("doc_id") % 19 == 7).select(
        (F.col("doc_id").cast("bigint") + F.lit(_ADD_OFFSET)).alias("doc_id"),
        F.col("source").alias("src2"),
        F.sha2(F.concat(F.col("text"), F.lit(" new")), 256).alias("fp2"),
        F.lit(True).alias("in2"),
    )
    v2 = base.unionByName(added)
    status = (
        v1.join(v2, "doc_id", "full_outer")
        .select(
            F.coalesce("src1", "src2", F.lit("(unknown)")).alias("source"),
            F.when(F.col("in1").isNull(), F.lit("added"))
            .when(F.col("in2").isNull(), F.lit("removed"))
            .when(~F.col("fp1").eqNullSafe(F.col("fp2")), F.lit("changed"))
            .otherwise(F.lit("unchanged"))
            .alias("status"),
        )
    )
    agg = [
        F.sum(F.when(F.col("status") == s, 1).otherwise(0))
        .cast("bigint")
        .alias(f"n_{s}")
        for s in ("added", "removed", "changed", "unchanged")
    ]
    return status.groupBy("source").agg(*agg).orderBy("source")
