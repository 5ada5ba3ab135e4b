"""Data-layout / lake-maintenance queries (engine extension): the jobs a
100 TB training-data lake runs BETWEEN pipelines — deterministic global
shuffle into training shards, small-file compaction planning, and Z-order
(Morton) clustering diagnostics.

Scale notes:
- **Shard manifest**: the global permutation rank uses the range-partition +
  driver-offset machinery (``operators/rank.py``) — NEVER a no-partition
  window — so the permutation of a corpus that does not fit one task is
  still exact. The permutation key is ``sha256(doc_id)``: deterministic,
  uniform, reproducible across runs (a trainer can re-derive any shard).
- **Compaction plan**: input rows stand in for FILE MANIFEST entries (one
  row per file, metadata-scale — exactly what Delta/Iceberg OPTIMIZE
  planners consume), so the per-partition window over a source's files is
  bounded by that source's file count, not its data volume.
- **Z-order stats**: the Morton code is pure integer arithmetic (division /
  modulo — no engine-specific bit intrinsics), computed map-side; the
  file-assignment rank reuses the distributed ranking operator.

Reference scope: the reference ETL has no lake maintenance (single-node
JSONL snapshots, ``src/normalize/io.ts``); this family is part of the
training-data-pipeline extension surface the build mandates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
import pyspark.sql.functions as F

from ..operators.rank import ntile_from_rank, with_global_ranks
from ..sources.tpch import load_table
from .registry import register

N_SHARDS = 16  # shard-count FLOOR; the count itself is corpus-size-adaptive
# Test-scale stand-in for the per-shard byte target (n_chars stands in for
# file bytes, same convention as COMPACT_TARGET_BYTES): production sets
# ~1-10 GiB. The shard count grows with the corpus — a fixed count would
# mean 6 TB shards at 100 TB — while staying at the floor for every
# driver-tested scale factor, so blocking/bench evidence is unchanged and
# the sf1 probe exercises the growth (56 shards at ~15 MB).
SHARD_TARGET_BYTES = 262144
COMPACT_TARGET_BYTES = 2048
ZORDER_BITS = 5  # 5 bits per dimension -> 10-bit Morton code
ZORDER_FILE_ROWS = 1024


def shard_perm(doc_id_col: Column) -> Column:
    """THE shard permutation key: sha256 of the doc id — deterministic,
    uniform, reproducible; shared by the manifest, the batch router and the
    deletion sweep so the three surfaces can never desynchronize."""
    return F.sha2(doc_id_col.cast("string"), 256)


def corpus_n_shards(keyed: DataFrame) -> int:
    """Corpus-size-adaptive shard count: max(N_SHARDS floor, total bytes /
    SHARD_TARGET_BYTES). One bounded scalar aggregate (the same driver-side
    class as with_global_ranks' count); the oracles replay it as a scalar
    subquery inside NTILE."""
    total = keyed.agg(F.coalesce(F.sum("n_chars"), F.lit(0))).collect()[0][0]
    return max(N_SHARDS, int(total or 0) // SHARD_TARGET_BYTES)


def shard_assignments(keyed: DataFrame, n_shards: int | None = None) -> DataFrame:
    """Add the 0-based ``shard_id`` to a frame carrying ``perm`` (and
    ``n_chars`` when the count is derived): exact global rank over the
    permutation key (range-partition + driver offsets — never a
    single-partition window) + arithmetic NTILE of the corpus-size-adaptive
    shard count. One helper = one shard convention for every
    manifest/route/sweep surface."""
    if n_shards is None:
        n_shards = corpus_n_shards(keyed)
    ranked, total = with_global_ranks(keyed, [F.col("perm")], rank_col="rn")
    return ranked.withColumn(
        "shard_id",
        (ntile_from_rank(F.col("rn"), total, n_shards) - 1).cast("bigint"),
    )


@register(
    "corpus_shard_manifest",
    "O-ext,A7-analog",
    "Deterministic global shuffle into training shards: every document gets "
    f"a reproducible permutation key sha256(doc_id), an EXACT global rank "
    "over that key (range-partition + driver offsets, operators/rank.py — "
    f"no single-partition window), and contiguous-range NTILE shard "
    f"assignment with a corpus-size-ADAPTIVE shard count (floor {N_SHARDS}, "
    f"one shard per {SHARD_TARGET_BYTES} corpus bytes — a fixed count would "
    "mean terabyte shards at 100 TB; the oracle replays the count as a "
    "scalar subquery inside NTILE). "
    "shard assignment. The manifest proves the shuffle: per shard, doc and "
    "byte totals plus the min/max key prefix showing shards own disjoint "
    "contiguous hash ranges. The oracle replays the permutation with a "
    "window NTILE over the same keys.",
    oracle=f"""
        WITH keyed AS (
          SELECT doc_id, n_chars,
                 sha256(CAST(doc_id AS VARCHAR)) AS perm
          FROM documents
        ),
        assigned AS (
          SELECT n_chars, perm,
                 CAST(NTILE((SELECT GREATEST({N_SHARDS},
                        CAST(COALESCE(SUM(n_chars), 0) AS BIGINT)
                        // {SHARD_TARGET_BYTES}) FROM keyed))
                      OVER (ORDER BY perm) - 1 AS BIGINT)
                   AS shard_id
          FROM keyed
        )
        SELECT shard_id,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS shard_bytes,
               substr(MIN(perm), 1, 8) AS lo_key,
               substr(MAX(perm), 1, 8) AS hi_key
        FROM assigned
        GROUP BY shard_id
        ORDER BY shard_id
    """,
)
def corpus_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "n_chars",
        shard_perm(F.col("doc_id")).alias("perm"),
    )
    # sha256 of a unique key is tie-free; rank IS the shuffled position
    out = (
        shard_assignments(docs)
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("shard_bytes"),
            F.substring(F.min("perm"), 1, 8).alias("lo_key"),
            F.substring(F.max("perm"), 1, 8).alias("hi_key"),
        )
        .orderBy("shard_id")
    )
    # the ranged intermediate persisted by with_global_ranks is query-scoped;
    # the harness releases it after the consuming action (release_scoped_caches)
    return out


@register(
    "lake_compaction_plan",
    "W-ext-scan,A3",
    "Small-file compaction planning (OPTIMIZE/bin-pack): treating each "
    "document row as a file-manifest entry (metadata-scale input — one row "
    "per FILE, which is what real lake planners consume), files within a "
    "source are packed in id order into output bins of "
    f"~{COMPACT_TARGET_BYTES} bytes by a per-source running byte total; "
    "bin_id = floor(bytes_before / target). Per bin: file count, byte "
    "total, largest input file. The per-source window is bounded by that "
    "source's FILE count, never its data volume.",
    oracle=f"""
        WITH run AS (
          SELECT source, n_chars,
                 SUM(n_chars) OVER (PARTITION BY source ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS running
          FROM documents
        )
        SELECT source,
               CAST((running - n_chars) // {COMPACT_TARGET_BYTES} AS BIGINT)
                 AS bin_id,
               CAST(COUNT(*) AS BIGINT) AS n_files,
               CAST(SUM(n_chars) AS BIGINT) AS bin_bytes,
               CAST(MAX(n_chars) AS BIGINT) AS max_file_bytes
        FROM run
        GROUP BY source, bin_id
        ORDER BY source, bin_id
    """,
)
def lake_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    files = load_table(spark, sf_dir, "documents").select(
        "source", "doc_id", "n_chars"
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        files.withColumn("running", F.sum("n_chars").over(w))
        .withColumn(
            "bin_id",
            F.floor(
                (F.col("running") - F.col("n_chars"))
                / F.lit(COMPACT_TARGET_BYTES)
            ).cast("bigint"),
        )
        .groupBy("source", "bin_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_files"),
            F.sum("n_chars").cast("bigint").alias("bin_bytes"),
            F.max("n_chars").cast("bigint").alias("max_file_bytes"),
        )
        .orderBy("source", "bin_id")
    )


def _morton_col(x: Column, y: Column, bits: int) -> Column:
    """Morton (Z-order) interleave of two ``bits``-bit nonnegative ints as
    pure integer arithmetic — bit i of x lands at position 2i, bit i of y
    at 2i+1. Division/modulo only, so the SAME math runs on any engine."""
    z = F.lit(0)
    for i in range(bits):
        z = z + (F.floor(x / F.lit(2**i)) % 2) * F.lit(2 ** (2 * i))
        z = z + (F.floor(y / F.lit(2**i)) % 2) * F.lit(2 ** (2 * i + 1))
    return z.cast("bigint")


def _morton_sql(x: str, y: str, bits: int) -> str:
    """DuckDB twin of :func:`_morton_col` — identical arithmetic."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x}) // {2**i}) % 2) * {2 ** (2 * i)}")
        terms.append(f"((({y}) // {2**i}) % 2) * {2 ** (2 * i + 1)}")
    return " + ".join(terms)


# NULL coordinates route to cell (0,*)/( *,0) on BOTH engines instead of
# riding each engine's (divergent) NULL sort order through the rank
_ZX = f"COALESCE(user_id, 0) % {2**ZORDER_BITS}"
_ZY = (
    f"((COALESCE(datediff('day', DATE '2024-01-01', CAST(ts AS DATE)), 0)"
    f" % {2**ZORDER_BITS}) + {2**ZORDER_BITS}) % {2**ZORDER_BITS}"
)


@register(
    "lake_zorder_extent_stats",
    "O-ext,A3",
    "Z-order clustering diagnostic: events are Morton-coded on "
    f"(user_id mod {2**ZORDER_BITS}, day-index mod {2**ZORDER_BITS}) — the "
    "interleave is pure div/mod arithmetic, map-side — globally sorted by "
    "(z, event_id) via the distributed ranking operator, and cut into "
    f"files of {ZORDER_FILE_ROWS} rows. Per file: row count and the "
    "min/max EXTENT of each dimension — the footprint a min/max-stats "
    "reader prunes on. Z-order keeps both extents small simultaneously "
    "(a linear sort keeps only one), which is the whole point of the "
    "layout; this query measures it.",
    oracle=f"""
        WITH coded AS (
          SELECT event_id,
                 CAST({_ZX} AS BIGINT) AS zx,
                 CAST({_ZY} AS BIGINT) AS zy,
                 CAST({_morton_sql(f"({_ZX})", f"({_ZY})", ZORDER_BITS)}
                      AS BIGINT) AS z
          FROM events
        ),
        ranked AS (
          SELECT zx, zy,
                 ROW_NUMBER() OVER (ORDER BY z, event_id) AS rn
          FROM coded
        )
        SELECT CAST((rn - 1) // {ZORDER_FILE_ROWS} AS BIGINT) AS file_id,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(MIN(zx) AS BIGINT) AS x_min,
               CAST(MAX(zx) AS BIGINT) AS x_max,
               CAST(MIN(zy) AS BIGINT) AS y_min,
               CAST(MAX(zy) AS BIGINT) AS y_max
        FROM ranked
        GROUP BY file_id
        ORDER BY file_id
    """,
)
def lake_zorder_extent_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = 2**ZORDER_BITS
    events = load_table(spark, sf_dir, "events")
    day = F.coalesce(
        F.datediff(F.to_date("ts"), F.to_date(F.lit("2024-01-01"))), F.lit(0)
    )
    coded = events.select(
        "event_id",
        (F.coalesce(F.col("user_id"), F.lit(0)) % m).cast("bigint").alias("zx"),
        (((day % m) + m) % m).cast("bigint").alias("zy"),
    ).withColumn(
        "z", _morton_col(F.col("zx"), F.col("zy"), ZORDER_BITS)
    )
    ranked, _total = with_global_ranks(
        coded, [F.col("z"), F.col("event_id")], rank_col="rn"
    )
    out = (
        ranked.withColumn(
            "file_id",
            F.floor((F.col("rn") - 1) / F.lit(ZORDER_FILE_ROWS)).cast("bigint"),
        )
        .groupBy("file_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.min("zx").cast("bigint").alias("x_min"),
            F.max("zx").cast("bigint").alias("x_max"),
            F.min("zy").cast("bigint").alias("y_min"),
            F.max("zy").cast("bigint").alias("y_max"),
        )
        .orderBy("file_id")
    )
    return out


@register(
    "corpus_shard_route_batch",
    "O-ext,J1-analog",
    "Incremental shard maintenance: an arriving batch (doc_id % 10 = 9, the "
    "repo's incremental-ingest convention) routes to the EXISTING corpus "
    "shards by their frozen hash-range boundaries — the corpus itself is "
    "never re-ranked or re-shuffled. Boundaries = per-shard min permutation "
    "key from the corpus NTILE — the count corpus-size-adaptive like the "
    "manifest's — one sorted boundary array broadcast as a single row; "
    "each batch doc's shard is a "
    "higher-order-function range lookup (count of boundaries <= its key). "
    "A day's append costs O(batch), exactly like the incremental dedup "
    "gate. Per shard: arriving docs and bytes.",
    oracle=f"""
        WITH corpus AS (
          SELECT n_chars, sha256(CAST(doc_id AS VARCHAR)) AS perm
          FROM documents WHERE doc_id % 10 <> 9
        ),
        assigned AS (
          SELECT perm,
                 CAST(NTILE((SELECT GREATEST({N_SHARDS},
                        CAST(COALESCE(SUM(n_chars), 0) AS BIGINT)
                        // {SHARD_TARGET_BYTES}) FROM corpus))
                      OVER (ORDER BY perm) - 1 AS BIGINT)
                   AS shard_id
          FROM corpus
        ),
        bounds AS (
          SELECT list_sort(array_agg(lo)) AS lows
          FROM (SELECT MIN(perm) AS lo FROM assigned GROUP BY shard_id) b
        ),
        batch AS (
          SELECT doc_id, n_chars,
                 sha256(CAST(doc_id AS VARCHAR)) AS perm
          FROM documents WHERE doc_id % 10 = 9
        )
        SELECT CAST(greatest(len(list_filter(lows, x -> x <= perm)) - 1, 0)
                    AS BIGINT) AS shard_id,
               CAST(COUNT(*) AS BIGINT) AS n_new_docs,
               CAST(SUM(n_chars) AS BIGINT) AS new_bytes
        FROM batch, bounds
        GROUP BY shard_id
        ORDER BY shard_id
    """,
)
def corpus_shard_route_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "n_chars",
        shard_perm(F.col("doc_id")).alias("perm"),
    )
    corpus = docs.filter(F.col("doc_id") % 10 != 9).select("perm", "n_chars")
    bounds = (
        shard_assignments(corpus)
        .groupBy("shard_id")
        .agg(F.min("perm").alias("lo"))
        .agg(F.array_sort(F.collect_list("lo")).alias("lows"))
    )
    batch = docs.filter(F.col("doc_id") % 10 == 9)
    return (
        batch.crossJoin(F.broadcast(bounds))
        .select(
            F.greatest(
                F.expr("size(filter(lows, x -> x <= perm))") - 1, F.lit(0)
            )
            .cast("bigint")
            .alias("shard_id"),
            "n_chars",
        )
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_new_docs"),
            F.sum("n_chars").cast("bigint").alias("new_bytes"),
        )
        .orderBy("shard_id")
    )
