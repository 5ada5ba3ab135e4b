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
from ..sinks.parquet import write_partitioned_lake
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


# ---------------------------------------------------------------------------
# Compaction APPLY (r10 verdict task #5): lake_compaction_plan above PLANS the
# bin packing; this pass EXECUTES it against a physical small-file lake and
# proves the rewrite lost nothing — the row-lake twin of the sketch-lake
# compaction trio (compacted == daily by hashed equality). The before-lake
# models the real small-files problem: documents land as one parquet file per
# (source, in_file) ingest batch; the apply rewrites them into one file per
# (source, bin_id) at ~APPLY_TARGET_BYTES, and the registered query reads
# BOTH physical lakes back, fingerprints their contents (count + bit_xor of
# a per-row sha256 hash) and emits the file-count drop per source.
# ---------------------------------------------------------------------------

ROWS_PER_INFILE = 16  # docs per ingest file in the small-file before-lake
APPLY_TARGET_BYTES = 16384  # compacted output bin target (test-scale)

_COMPACT_APPLY_LAKES: set[str] = set()


def _docs_with_infile(docs: DataFrame) -> DataFrame:
    """documents + the deterministic ingest-file id: per-source doc_id rank
    bucketed by ROWS_PER_INFILE. The per-source window is bounded by that
    source's file count, same class as lake_compaction_plan's."""
    w = Window.partitionBy("source").orderBy("doc_id")
    return docs.withColumn(
        "in_file",
        ((F.row_number().over(w) - 1) / F.lit(ROWS_PER_INFILE))
        .cast("bigint"),
    )


def compaction_bin_plan(
    files: DataFrame, passthrough: tuple[str, ...] = ()
) -> DataFrame:
    """(source, in_file, bin_id [, passthrough...]): first-fit packing of
    whole input files, in in_file order, into output bins of
    ~APPLY_TARGET_BYTES — the same running-byte-total arithmetic as
    lake_compaction_plan, at FILE granularity (the unit the rewrite
    moves). ``files`` carries (source, in_file, fb); metadata-scale input,
    exactly what OPTIMIZE planners consume. ``passthrough`` carries extra
    file columns into the plan unchanged (the incremental apply's
    ``is_arrival`` marker) — ONE copy of the bucketing arithmetic serves
    both apply passes."""
    w = (
        Window.partitionBy("source")
        .orderBy("in_file")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        files.withColumn("running", F.sum("fb").over(w))
        # exact integer `div`, never floor(double): the running total is
        # BIGINT and must bucket identically to the oracle's `//`
        .select(
            "source",
            "in_file",
            *passthrough,
            F.expr(f"(running - fb) div {APPLY_TARGET_BYTES}")
            .cast("bigint")
            .alias("bin_id"),
        )
    )


def compacted_docs_lakes(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """(before_lake, after_lake) physical reads. First use per process
    writes both: the small-file lake (one parquet file per (source,
    in_file) — write_partitioned_lake's repartition gives exactly one file
    per leaf directory), then the compacted rewrite (one file per (source,
    bin_id) per the bin plan). Later uses read back; the registered query
    never recomputes the rewrite."""
    from .lake import _lake_path

    before_path = _lake_path(sf_dir, "docs_small_files")
    after_path = _lake_path(sf_dir, "docs_compacted")
    docs = _docs_with_infile(
        load_table(spark, sf_dir, "documents").select(
            "doc_id", "text", "lang", "n_chars", "source"
        )
    )
    if before_path not in _COMPACT_APPLY_LAKES:
        write_partitioned_lake(
            docs, before_path, ["source", "in_file"], sort_cols=["doc_id"]
        )
        before = spark.read.schema(docs.schema).parquet(before_path)
        files = before.groupBy("source", "in_file").agg(
            F.coalesce(F.sum("n_chars"), F.lit(0)).cast("bigint").alias("fb")
        )
        plan = compaction_bin_plan(files).select(
            F.col("source").alias("p_source"),
            F.col("in_file").alias("p_in_file"),
            "bin_id",
        )
        # the plan is metadata-scale (one row per input FILE) -> broadcast;
        # the rewrite reads the physical before-lake, never the source
        # table. NULL-SAFE source equality: a plain join key would drop
        # every NULL-source file from the compacted lake (caught by the
        # 20%-NULL hostile probe — the NULL-key class, fourth occurrence)
        compacted = (
            before.join(
                F.broadcast(plan),
                F.col("source").eqNullSafe(F.col("p_source"))
                & (F.col("in_file") == F.col("p_in_file")),
            )
            .drop("p_source", "p_in_file", "in_file")
        )
        write_partitioned_lake(
            compacted, after_path, ["source", "bin_id"], sort_cols=["doc_id"]
        )
        _COMPACT_APPLY_LAKES.add(before_path)
    before = spark.read.schema(docs.schema).parquet(before_path)
    after_schema = docs.drop("in_file").withColumn(
        "bin_id", F.lit(0).cast("bigint")
    ).schema
    after = spark.read.schema(after_schema).parquet(after_path)
    return before, after


_ROW_HASH_SQL = (
    "CAST(concat('0x', substr(sha256(concat("
    "COALESCE(CAST(doc_id AS VARCHAR), chr(0)), ':',"
    " COALESCE(text, chr(0)))), 1, 14)) AS BIGINT)"
)


def _row_hash_col() -> Column:
    """56-bit sha256 row-content hash, the cross-engine fingerprint unit."""
    return (
        F.conv(
            F.substring(
                F.sha2(
                    F.concat(
                        F.coalesce(F.col("doc_id").cast("string"), F.lit("\x00")),
                        F.lit(":"),
                        F.coalesce(F.col("text"), F.lit("\x00")),
                    ),
                    256,
                ),
                1,
                14,
            ),
            16,
            10,
        )
        .cast("long")
    )


def _compaction_apply_oracle_sql() -> str:
    return f"""
        WITH f AS (
          SELECT source, doc_id,
                 CAST(COALESCE(n_chars, 0) AS BIGINT) AS nb,
                 {_ROW_HASH_SQL} AS rh,
                 CAST((ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id)
                       - 1) // {ROWS_PER_INFILE} AS BIGINT) AS in_file
          FROM documents
        ),
        files AS (
          SELECT source, in_file, CAST(SUM(nb) AS BIGINT) AS fb
          FROM f GROUP BY source, in_file
        ),
        plan AS (
          SELECT source, in_file,
                 CAST((SUM(fb) OVER (PARTITION BY source ORDER BY in_file
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - fb)
                      // {APPLY_TARGET_BYTES} AS BIGINT) AS bin_id
          FROM files
        ),
        bfp AS (
          SELECT coalesce(source, chr(0) || '<null>') AS gk, source,
                 CAST(COUNT(DISTINCT in_file) AS BIGINT) AS n_files_before,
                 CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(SUM(nb) AS BIGINT) AS total_bytes,
                 CAST(bit_xor(rh) AS BIGINT) AS xh
          FROM f GROUP BY source
        ),
        afp AS (
          SELECT coalesce(fx.source, chr(0) || '<null>') AS gk,
                 CAST(COUNT(DISTINCT p.bin_id) AS BIGINT) AS n_files_after,
                 CAST(COUNT(*) AS BIGINT) AS a_docs,
                 CAST(bit_xor(fx.rh) AS BIGINT) AS a_xh
          FROM f fx JOIN plan p
            ON p.in_file = fx.in_file
           AND p.source IS NOT DISTINCT FROM fx.source
          GROUP BY fx.source
        )
        SELECT bfp.source,
               bfp.n_files_before,
               afp.n_files_after,
               bfp.n_docs,
               bfp.total_bytes,
               (bfp.n_docs = afp.a_docs
                AND bfp.xh IS NOT DISTINCT FROM afp.a_xh)
                 AS content_equal
        FROM bfp JOIN afp USING (gk)
        ORDER BY source
    """


@register(
    "lake_compaction_apply",
    "W-ext-scan,A3,S6-analog,V4-analog",
    "Compaction APPLY — the execution pass lake_compaction_plan only "
    "planned (r10 verdict task #5, the row-lake twin of the sketch-lake "
    "compaction trio): documents land as a PHYSICAL small-file parquet "
    f"lake (one file per (source, in_file) ingest batch of "
    f"{ROWS_PER_INFILE} docs — the real small-files problem), the bin "
    "plan packs whole input files in id order into output bins of "
    f"~{APPLY_TARGET_BYTES} bytes (the same running-byte-total arithmetic "
    "as the planner, at the file granularity the rewrite moves), and the "
    "rewrite writes one file per (source, bin_id). The query reads BOTH "
    "physical lakes back and emits, per source, the file-count drop and a "
    "content_equal flag comparing hashed fingerprints (row count + "
    "bit_xor of a 56-bit sha256 row hash) of the before and after reads — "
    "a row lost or duplicated by the rewrite flips the flag red and "
    "breaks the oracle hash. NULL sources ride the hive default partition "
    "and the null-coalesced group key like every lake audit; the oracle "
    "replays ingest-file assignment, the plan and both fingerprints from "
    "the raw documents view. The physical file-count drop (one file per "
    "leaf directory, compacted read lists fewer files) is pinned by "
    "tests/test_round11.py.",
    oracle=_compaction_apply_oracle_sql(),
)
def lake_compaction_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    gk = F.coalesce(F.col("source"), F.lit("\x00<null>")).alias("gk")
    before, after = compacted_docs_lakes(spark, sf_dir)
    bfp = (
        before.withColumn("rh", _row_hash_col())
        .groupBy("source")
        .agg(
            F.countDistinct("in_file").cast("bigint").alias("n_files_before"),
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.coalesce(F.sum("n_chars"), F.lit(0))
            .cast("bigint")
            .alias("total_bytes"),
            F.expr("bit_xor(rh)").cast("bigint").alias("xh"),
        )
        .select(gk, "source", "n_files_before", "n_docs", "total_bytes", "xh")
    )
    afp = (
        after.withColumn("rh", _row_hash_col())
        .groupBy("source")
        .agg(
            F.countDistinct("bin_id").cast("bigint").alias("n_files_after"),
            F.count(F.lit(1)).cast("bigint").alias("a_docs"),
            F.expr("bit_xor(rh)").cast("bigint").alias("a_xh"),
        )
        .select(gk, "n_files_after", "a_docs", "a_xh")
    )
    # LEFT join: a source group the rewrite LOST must surface as a red
    # content_equal row, not silently vanish from the audit
    return (
        bfp.join(afp, "gk", "left")
        .select(
            "source",
            "n_files_before",
            F.coalesce(F.col("n_files_after"), F.lit(0))
            .cast("bigint")
            .alias("n_files_after"),
            "n_docs",
            "total_bytes",
            F.coalesce(
                (F.col("n_docs") == F.col("a_docs"))
                & F.col("xh").eqNullSafe(F.col("a_xh")),
                F.lit(False),
            ).alias("content_equal"),
        )
        .orderBy("source")
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
          WHERE event_id IS NOT NULL
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
    # NULL event_ids are excluded on BOTH engines (the quantile_hash_sample
    # convention): the file-cut rank orders by event_id, and a NULL id
    # would ride Spark's NULLS FIRST vs DuckDB's NULLS LAST into different
    # files (r12 review finding — latent: the standard hostile lakes never
    # NULL the id column)
    events = load_table(spark, sf_dir, "events").filter(
        F.col("event_id").isNotNull()
    )
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


# ---------------------------------------------------------------------------
# Z-order APPLY (r11 verdict task #3): execute the clustering rewrite the
# extent-stats diagnostic only measures — the compaction-APPLY template
# (physical before/after lakes, hashed content-equality, process-memoized
# first-use write) applied to layout instead of file count. The before-lake
# is the LINEAR layout a time-ordered ingest produces (files cut by
# event_id rank); the rewrite re-cuts the same rows by (Morton z, event_id)
# rank. The measured payoff is two-sided prunability: per file, each
# dimension's extent [min, max] skips (min + (2^bits - 1 - max)) of the
# 2^bits point-predicate stripe values — summed over files, that is the
# exact count of (file, stripe) scan skips a min/max-stats reader gets.
# Z-order keeps BOTH sums high simultaneously; a linear sort keeps one.
# ---------------------------------------------------------------------------

_ZORDER_APPLY_LAKES: set[str] = set()


def _zorder_coded_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_id, zx, zy, event_type, value): the SAME coordinate recipe as
    lake_zorder_extent_stats (NULL coordinates route to cell 0 on both
    engines; NULL event_ids are excluded — the rank-order / NOT-IN
    hazard, see lake_zorder_extent_stats)."""
    m = 2**ZORDER_BITS
    events = load_table(spark, sf_dir, "events").filter(
        F.col("event_id").isNotNull()
    )
    day = F.coalesce(
        F.datediff(F.to_date("ts"), F.to_date(F.lit("2024-01-01"))), F.lit(0)
    )
    return events.select(
        "event_id",
        (F.coalesce(F.col("user_id"), F.lit(0)) % m).cast("bigint").alias("zx"),
        (((day % m) + m) % m).cast("bigint").alias("zy"),
        "event_type",
        "value",
    )


def zordered_events_lakes(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """(linear_lake, zordered_lake) physical reads. First use per process
    writes both: the linear layout (one parquet file per event_id-rank bin
    of ZORDER_FILE_ROWS rows — the layout a time-ordered ingest leaves
    behind), then the Z-order rewrite reading the PHYSICAL linear lake back
    and re-cutting the same rows by (Morton z, event_id) rank. Later uses
    read back; the registered query never recomputes the rewrite."""
    from .lake import _lake_path

    before_path = _lake_path(sf_dir, "events_linear_files")
    after_path = _lake_path(sf_dir, "events_zordered_files")
    coded = _zorder_coded_events(spark, sf_dir)
    schema = coded.withColumn("file_id", F.lit(0).cast("bigint")).schema
    if before_path not in _ZORDER_APPLY_LAKES:
        ranked, _ = with_global_ranks(
            coded, [F.col("event_id")], rank_col="rn"
        )
        lin = ranked.withColumn(
            "file_id",
            F.floor((F.col("rn") - 1) / F.lit(ZORDER_FILE_ROWS)).cast(
                "bigint"
            ),
        ).drop("rn")
        write_partitioned_lake(
            lin, before_path, ["file_id"], sort_cols=["event_id"]
        )
        # the rewrite reads the PHYSICAL before-lake, never the source table
        before = spark.read.schema(schema).parquet(before_path)
        zranked, _ = with_global_ranks(
            before.withColumn(
                "z", _morton_col(F.col("zx"), F.col("zy"), ZORDER_BITS)
            ).drop("file_id"),
            [F.col("z"), F.col("event_id")],
            rank_col="rn",
        )
        zdf = zranked.withColumn(
            "file_id",
            F.floor((F.col("rn") - 1) / F.lit(ZORDER_FILE_ROWS)).cast(
                "bigint"
            ),
        ).drop("rn", "z")
        write_partitioned_lake(
            zdf, after_path, ["file_id"], sort_cols=["zx", "zy", "event_id"]
        )
        # memoize only AFTER both writes completed (the _COMPACT_APPLY_LAKES
        # / ADVICE-r11 ordering)
        _ZORDER_APPLY_LAKES.add(before_path)
    before = spark.read.schema(schema).parquet(before_path)
    after = spark.read.schema(schema).parquet(after_path)
    return before, after


def _zrow_hash_col() -> Column:
    """56-bit sha256 over (event_id, zx, zy) — the id + layout payload the
    rewrite must preserve row-for-row."""
    return F.conv(
        F.substring(
            F.sha2(
                F.concat(
                    F.col("event_id").cast("string"),
                    F.lit(":"),
                    F.col("zx").cast("string"),
                    F.lit(":"),
                    F.col("zy").cast("string"),
                ),
                256,
            ),
            1,
            14,
        ),
        16,
        10,
    ).cast("long")


def _zlake_frames(lake: DataFrame, suffix: str) -> DataFrame:
    """One-row (n_files, x_prunable, y_prunable, n, xh) audit frame over a
    physical layout read: per-file min/max extents -> exact per-dimension
    stripe-skip sums, plus the content fingerprint."""
    m1 = 2**ZORDER_BITS - 1
    per_file = lake.groupBy("file_id").agg(
        F.min("zx").alias("xmn"),
        F.max("zx").alias("xmx"),
        F.min("zy").alias("ymn"),
        F.max("zy").alias("ymx"),
    )
    ext = per_file.agg(
        F.count(F.lit(1)).cast("bigint").alias(f"n_files_{suffix}"),
        F.coalesce(F.sum(F.col("xmn") + (F.lit(m1) - F.col("xmx"))), F.lit(0))
        .cast("bigint")
        .alias(f"x_prunable_{suffix}"),
        F.coalesce(F.sum(F.col("ymn") + (F.lit(m1) - F.col("ymx"))), F.lit(0))
        .cast("bigint")
        .alias(f"y_prunable_{suffix}"),
    )
    fp = lake.withColumn("_rh", _zrow_hash_col()).agg(
        F.count(F.lit(1)).cast("bigint").alias(f"_n_{suffix}"),
        F.expr("bit_xor(_rh)").cast("bigint").alias(f"_xh_{suffix}"),
    )
    return ext.crossJoin(F.broadcast(fp))


def _zorder_apply_oracle_sql() -> str:
    m = 2**ZORDER_BITS
    return f"""
        WITH coded AS (
          SELECT event_id,
                 CAST({_ZX} AS BIGINT) AS zx,
                 CAST({_ZY} AS BIGINT) AS zy,
                 CAST({_morton_sql(f"({_ZX})", f"({_ZY})", ZORDER_BITS)}
                      AS BIGINT) AS z
          FROM events
          WHERE event_id IS NOT NULL
        ),
        linf AS (
          SELECT CAST((rn - 1) // {ZORDER_FILE_ROWS} AS BIGINT) AS f,
                 MIN(zx) AS xmn, MAX(zx) AS xmx,
                 MIN(zy) AS ymn, MAX(zy) AS ymx
          FROM (SELECT zx, zy,
                       ROW_NUMBER() OVER (ORDER BY event_id) AS rn
                FROM coded)
          GROUP BY f
        ),
        zf AS (
          SELECT CAST((rn - 1) // {ZORDER_FILE_ROWS} AS BIGINT) AS f,
                 MIN(zx) AS xmn, MAX(zx) AS xmx,
                 MIN(zy) AS ymn, MAX(zy) AS ymx
          FROM (SELECT zx, zy,
                       ROW_NUMBER() OVER (ORDER BY z, event_id) AS rn
                FROM coded)
          GROUP BY f
        ),
        m AS (
          SELECT
            (SELECT CAST(COUNT(*) AS BIGINT) FROM coded) AS n_rows,
            (SELECT CAST(COUNT(*) AS BIGINT) FROM linf) AS n_files_before,
            (SELECT CAST(COUNT(*) AS BIGINT) FROM zf) AS n_files_after,
            (SELECT CAST(COALESCE(SUM(xmn + {m - 1} - xmx), 0) AS BIGINT)
             FROM linf) AS x_prunable_before,
            (SELECT CAST(COALESCE(SUM(ymn + {m - 1} - ymx), 0) AS BIGINT)
             FROM linf) AS y_prunable_before,
            (SELECT CAST(COALESCE(SUM(xmn + {m - 1} - xmx), 0) AS BIGINT)
             FROM zf) AS x_prunable_after,
            (SELECT CAST(COALESCE(SUM(ymn + {m - 1} - ymx), 0) AS BIGINT)
             FROM zf) AS y_prunable_after,
            TRUE AS content_equal
        )
        SELECT * FROM m
    """


@register(
    "lake_zorder_apply",
    "O-ext,A3,S6-analog,V4-analog",
    "Z-order APPLY — the clustering rewrite lake_zorder_extent_stats only "
    "measures (r11 verdict task #3, the layout half of lake maintenance "
    "next to lake_compaction_apply): events land as a PHYSICAL linear "
    f"layout (files of {ZORDER_FILE_ROWS} rows cut by event_id rank — what "
    "a time-ordered ingest leaves behind), and the rewrite reads that lake "
    "back and re-cuts the SAME rows into files by (Morton z, event_id) "
    "rank. The query reads BOTH physical lakes and emits the exact "
    "two-sided prunability payoff: per file and dimension, the extent "
    f"[min, max] skips (min + {2**ZORDER_BITS - 1} - max) of the "
    f"{2**ZORDER_BITS} point-predicate stripe values, summed over files — "
    "x_prunable_* / y_prunable_* are those exact skip counts before and "
    "after (Z-order raises BOTH together; the linear layout keeps only "
    "the time-correlated dimension tight — the improvement is pinned by "
    "tests/test_round12.py), plus a content_equal flag comparing hashed "
    "fingerprints (row count + bit_xor of a 56-bit sha256 over id and "
    "layout coordinates) of the two physical reads — a row lost, "
    "duplicated or mangled by the rewrite flips it red and breaks the "
    "oracle hash. The oracle replays coordinates, both rank-based file "
    "cuts and all four skip sums from the raw events view; its "
    "content_equal column states the expected invariant — the Spark "
    "side's flag is derived from the physical artifacts.",
    oracle=_zorder_apply_oracle_sql(),
)
def lake_zorder_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .helpers import ordered_small

    before, after = zordered_events_lakes(spark, sf_dir)
    b = _zlake_frames(before, "before")
    a = _zlake_frames(after, "after")
    n_rows = before.agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
    out = (
        n_rows.crossJoin(F.broadcast(b))
        .crossJoin(F.broadcast(a))
        .select(
            "n_rows",
            "n_files_before",
            "n_files_after",
            "x_prunable_before",
            "y_prunable_before",
            "x_prunable_after",
            "y_prunable_after",
            F.coalesce(
                (F.col("_n_before") == F.col("_n_after"))
                & F.col("_xh_before").eqNullSafe(F.col("_xh_after")),
                F.lit(False),
            ).alias("content_equal"),
        )
    )
    return ordered_small(out, "n_rows")


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


# ---------------------------------------------------------------------------
# INCREMENTAL compaction apply: the daily shape of lake maintenance — an
# arriving batch lands as new small files and the apply rewrites ONLY the
# tail bin per source, never the settled bins. Correctness rides the PREFIX
# PROPERTY of running-byte-total packing: a file's bin id depends only on
# the bytes BEFORE it within its source, so appending arrival files can
# never change a base file's bin — the incremental stitch (untouched base
# bins + one tail rewrite) provably equals a full repack over the ordered
# file list, and the query checks that equality per bin against the
# physical stitched read.
# ---------------------------------------------------------------------------

_COMPACT_INCR_LAKES: set[str] = set()

COMPACT_ARRIVAL_PRED = "doc_id % 10 = 9"  # the established ingest split


def _incr_paths(sf_dir: str) -> tuple[str, str, str, str]:
    from .lake import _lake_path

    return (
        _lake_path(sf_dir, "docs_small_base"),
        _lake_path(sf_dir, "docs_small_arrivals"),
        _lake_path(sf_dir, "docs_compacted_base"),
        _lake_path(sf_dir, "docs_compacted_incr"),
    )


def _full_file_plan(files_all: DataFrame) -> DataFrame:
    """(source, in_file, is_arrival, bin_id): the running-byte-total plan
    over the ORDERED file list (base files first — arrival in_file ids are
    offset past the base count, so one window covers both). Delegates to
    :func:`compaction_bin_plan` so exactly one copy of the bucketing
    arithmetic exists."""
    return compaction_bin_plan(files_all, passthrough=("is_arrival",))


def incremental_compaction_lakes(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """(base_small, arrivals_small, base_compacted, rewrite) physical
    reads. First use per process writes the whole scenario: the BASE
    small-file lake and its compacted form (the settled state), the
    ARRIVAL small files (doc_id % 10 = 9, ingest-file ids offset past the
    base count per source), and the incremental REWRITE — only the bins at
    or past each source's first-arrival bin (at most the base tail bin
    plus new bins) are written; settled bins are never rewritten."""
    base_small_p, arr_small_p, base_comp_p, rewrite_p = _incr_paths(sf_dir)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "n_chars", "source"
    )
    is_arr = F.expr(COMPACT_ARRIVAL_PRED)
    base = _docs_with_infile(docs.filter(~is_arr))
    base_schema = base.schema
    comp_schema = base.drop("in_file").withColumn(
        "bin_id", F.lit(0).cast("bigint")
    ).schema

    if base_small_p not in _COMPACT_INCR_LAKES:
        write_partitioned_lake(
            base, base_small_p, ["source", "in_file"], sort_cols=["doc_id"]
        )
        base_read = spark.read.schema(base_schema).parquet(base_small_p)
        files_b = base_read.groupBy("source", "in_file").agg(
            F.coalesce(F.sum("n_chars"), F.lit(0)).cast("bigint").alias("fb")
        )
        plan_b = compaction_bin_plan(files_b).select(
            F.col("source").alias("p_source"),
            F.col("in_file").alias("p_in_file"),
            "bin_id",
        )
        base_comp = (
            base_read.join(
                F.broadcast(plan_b),
                F.col("source").eqNullSafe(F.col("p_source"))
                & (F.col("in_file") == F.col("p_in_file")),
            )
            .drop("p_source", "p_in_file", "in_file")
        )
        write_partitioned_lake(
            base_comp, base_comp_p, ["source", "bin_id"], sort_cols=["doc_id"]
        )

        # arrival ingest files: per-source ranks offset past the base count
        n_base_files = files_b.groupBy("source").agg(
            F.countDistinct("in_file").alias("nbf")
        )
        wa = Window.partitionBy("source").orderBy("doc_id")
        arrivals = (
            docs.filter(is_arr)
            .withColumn(
                "arr_rank",
                ((F.row_number().over(wa) - 1) / F.lit(ROWS_PER_INFILE))
                .cast("bigint"),
            )
            .join(
                F.broadcast(
                    n_base_files.select(
                        F.col("source").alias("b_source"), "nbf"
                    )
                ),
                F.col("source").eqNullSafe(F.col("b_source")),
                "left",
            )
            .select(
                "doc_id",
                "text",
                "lang",
                "n_chars",
                "source",
                (F.coalesce(F.col("nbf"), F.lit(0)) + F.col("arr_rank"))
                .cast("bigint")
                .alias("in_file"),
            )
        )
        write_partitioned_lake(
            arrivals, arr_small_p, ["source", "in_file"], sort_cols=["doc_id"]
        )
        arr_read = spark.read.schema(base_schema).parquet(arr_small_p)

        # the FULL plan over the ordered file list; prefix property => base
        # files keep their base bins, arrivals land at/past the tail bin
        files_a = arr_read.groupBy("source", "in_file").agg(
            F.coalesce(F.sum("n_chars"), F.lit(0)).cast("bigint").alias("fb")
        )
        files_all = files_b.withColumn(
            "is_arrival", F.lit(False)
        ).unionByName(files_a.withColumn("is_arrival", F.lit(True)))
        plan_all = _full_file_plan(files_all)
        fab = plan_all.filter(F.col("is_arrival")).groupBy("source").agg(
            F.min("bin_id").alias("first_arr_bin")
        )

        # rewrite input: tail-bin docs from the PHYSICAL base compacted
        # lake + arrival docs, binned by the full plan
        base_comp_read = spark.read.schema(comp_schema).parquet(base_comp_p)
        fab_b = F.broadcast(
            fab.select(F.col("source").alias("f_source"), "first_arr_bin")
        )
        touched_docs = (
            base_comp_read.join(
                fab_b, F.col("source").eqNullSafe(F.col("f_source")), "inner"
            )
            .filter(F.col("bin_id") >= F.col("first_arr_bin"))
            .drop("f_source", "first_arr_bin", "bin_id")
        )
        # re-derive each rewrite doc's file id (base docs: their base file;
        # arrivals: their arrival file) to join the full plan for bins. The
        # base tail docs' in_file comes from the base small-lake derivation
        # (per-source rank), restricted to the touched docs by id.
        touched_with_file = touched_docs.join(
            base_read.select(
                F.col("doc_id").alias("t_doc"), F.col("in_file")
            ),
            F.col("doc_id") == F.col("t_doc"),
        ).drop("t_doc")
        rewrite_in = touched_with_file.unionByName(
            arr_read
        )
        plan_r = plan_all.select(
            F.col("source").alias("p_source"),
            F.col("in_file").alias("p_in_file"),
            "bin_id",
        )
        rewrite = (
            rewrite_in.join(
                F.broadcast(plan_r),
                F.col("source").eqNullSafe(F.col("p_source"))
                & (F.col("in_file") == F.col("p_in_file")),
            )
            .drop("p_source", "p_in_file", "in_file")
        )
        write_partitioned_lake(
            rewrite, rewrite_p, ["source", "bin_id"], sort_cols=["doc_id"]
        )
        _COMPACT_INCR_LAKES.add(base_small_p)

    return (
        spark.read.schema(base_schema).parquet(base_small_p),
        spark.read.schema(base_schema).parquet(arr_small_p),
        spark.read.schema(comp_schema).parquet(base_comp_p),
        spark.read.schema(comp_schema).parquet(rewrite_p),
    )


def _incr_oracle_sql() -> str:
    r = ROWS_PER_INFILE
    t = APPLY_TARGET_BYTES
    rh_b = _ROW_HASH_SQL
    return f"""
        WITH b AS (
          SELECT source, doc_id,
                 CAST(COALESCE(n_chars, 0) AS BIGINT) AS nb,
                 {rh_b} AS rh,
                 CAST((ROW_NUMBER() OVER (PARTITION BY source
                       ORDER BY doc_id) - 1) // {r} AS BIGINT) AS in_file,
                 FALSE AS is_arrival
          FROM documents WHERE NOT ({COMPACT_ARRIVAL_PRED})
        ),
        nbf AS (SELECT source, CAST(COUNT(DISTINCT in_file) AS BIGINT)
                  AS nbf FROM b GROUP BY source),
        arr AS (
          SELECT d.source, d.doc_id,
                 CAST(COALESCE(d.n_chars, 0) AS BIGINT) AS nb,
                 {rh_b.replace("doc_id", "d.doc_id").replace("text", "d.text")} AS rh,
                 CAST(COALESCE(f.nbf, 0)
                      + (ROW_NUMBER() OVER (PARTITION BY d.source
                         ORDER BY d.doc_id) - 1) // {r} AS BIGINT) AS in_file,
                 TRUE AS is_arrival
          FROM documents d
          LEFT JOIN nbf f ON f.source IS NOT DISTINCT FROM d.source
          WHERE {COMPACT_ARRIVAL_PRED.replace("doc_id", "d.doc_id")}
        ),
        allf AS (SELECT * FROM b UNION ALL SELECT * FROM arr),
        files AS (
          SELECT source, in_file, is_arrival, CAST(SUM(nb) AS BIGINT) AS fb
          FROM allf GROUP BY source, in_file, is_arrival
        ),
        plan AS (
          SELECT source, in_file, is_arrival,
                 CAST((SUM(fb) OVER (PARTITION BY source ORDER BY in_file
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       - fb) // {t} AS BIGINT) AS bin_id
          FROM files
        ),
        fab AS (
          SELECT source, MIN(bin_id) AS fab FROM plan
          WHERE is_arrival GROUP BY source
        ),
        m AS (
          SELECT p.source,
                 coalesce(p.source, chr(0) || '<null>') AS gk,
                 CAST(COUNT(DISTINCT CASE WHEN NOT p.is_arrival
                      THEN p.in_file END) AS BIGINT) AS n_base_files,
                 CAST(COUNT(DISTINCT CASE WHEN p.is_arrival
                      THEN p.in_file END) AS BIGINT) AS n_arrival_files,
                 CAST(COUNT(DISTINCT CASE WHEN NOT p.is_arrival
                      THEN p.bin_id END) AS BIGINT) AS n_base_bins,
                 CAST(COUNT(DISTINCT CASE WHEN NOT p.is_arrival
                      AND p.bin_id >= f.fab THEN p.bin_id END) AS BIGINT)
                   AS n_touched_base_bins,
                 CAST(COUNT(DISTINCT CASE WHEN p.bin_id >= f.fab
                      THEN p.bin_id END) AS BIGINT) AS n_new_bins,
                 CAST(COUNT(DISTINCT CASE WHEN NOT p.is_arrival
                        AND (f.fab IS NULL OR p.bin_id < f.fab)
                        THEN p.bin_id END)
                      + COUNT(DISTINCT CASE WHEN p.bin_id >= f.fab
                        THEN p.bin_id END) AS BIGINT) AS n_bins_after
          FROM plan p
          LEFT JOIN fab f ON f.source IS NOT DISTINCT FROM p.source
          GROUP BY p.source
        )
        SELECT source, n_base_files, n_arrival_files, n_base_bins,
               n_touched_base_bins, n_new_bins, n_bins_after,
               TRUE AS content_equal,
               TRUE AS matches_full_repack
        FROM m
        ORDER BY source
    """


@register(
    "lake_compaction_apply_incremental",
    "W-ext-scan,A3,S6-analog,V4-analog",
    "INCREMENTAL compaction apply — the daily shape of lake maintenance "
    "(the batch-ingest twin of lake_compaction_apply, same class as the "
    "incremental dedup/shard-route gates): an arriving batch "
    f"({COMPACT_ARRIVAL_PRED}) lands as new physical small files whose "
    "ingest-file ids continue past each source's settled files, and the "
    "apply rewrites ONLY the bins at or past each source's first-arrival "
    "bin — at most the one under-filled tail bin plus new bins; settled "
    "bins are NEVER rewritten. Correctness rides the PREFIX property of "
    "running-byte-total packing (a file's bin depends only on the bytes "
    "before it in its source, so appends cannot move a settled file): "
    "matches_full_repack compares per-bin hashed fingerprints of the "
    "physical stitched read (untouched settled bins + the rewrite) "
    "against a from-scratch repack over the ordered file list, and "
    "content_equal proves no row was lost or duplicated (count + bit_xor "
    "of the 56-bit sha256 row hash per source). n_touched_base_bins <= 1 "
    "per source is the efficiency claim. NULL sources ride null-safe "
    "joins end-to-end; the oracle replays ingest-file assignment, the "
    "full plan, the touch boundary and every count from the raw "
    "documents view.",
    oracle=_incr_oracle_sql(),
)
def lake_compaction_apply_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    gk = F.coalesce(F.col("source"), F.lit("\x00<null>")).alias("gk")
    base_small, arr_small, base_comp, rewrite = incremental_compaction_lakes(
        spark, sf_dir
    )
    files_b = base_small.groupBy("source", "in_file").agg(
        F.coalesce(F.sum("n_chars"), F.lit(0)).cast("bigint").alias("fb")
    )
    files_a = arr_small.groupBy("source", "in_file").agg(
        F.coalesce(F.sum("n_chars"), F.lit(0)).cast("bigint").alias("fb")
    )
    files_all = files_b.withColumn("is_arrival", F.lit(False)).unionByName(
        files_a.withColumn("is_arrival", F.lit(True))
    )
    plan_all = _full_file_plan(files_all)
    fab = plan_all.filter(F.col("is_arrival")).groupBy("source").agg(
        F.min("bin_id").alias("fab")
    )
    fab_b = F.broadcast(
        fab.select(F.col("source").alias("f_source"), "fab")
    )

    # logical per-source file/bin facts
    facts = (
        plan_all.join(
            fab_b, F.col("source").eqNullSafe(F.col("f_source")), "left"
        )
        .groupBy("source")
        .agg(
            F.countDistinct(
                F.when(~F.col("is_arrival"), F.col("in_file"))
            ).cast("bigint").alias("n_base_files"),
            F.countDistinct(
                F.when(F.col("is_arrival"), F.col("in_file"))
            ).cast("bigint").alias("n_arrival_files"),
            F.countDistinct(
                F.when(~F.col("is_arrival"), F.col("bin_id"))
            ).cast("bigint").alias("n_base_bins"),
            F.countDistinct(
                F.when(
                    ~F.col("is_arrival") & (F.col("bin_id") >= F.col("fab")),
                    F.col("bin_id"),
                )
            ).cast("bigint").alias("n_touched_base_bins"),
        )
        .select(gk, "source", "n_base_files", "n_arrival_files",
                "n_base_bins", "n_touched_base_bins")
    )

    # physical stitched read: settled bins below the touch boundary + the
    # rewrite output
    untouched = (
        base_comp.join(
            fab_b, F.col("source").eqNullSafe(F.col("f_source")), "left"
        )
        .filter(F.col("fab").isNull() | (F.col("bin_id") < F.col("fab")))
        .drop("f_source", "fab")
    )
    stitched = untouched.unionByName(rewrite)

    phys = stitched.groupBy("source").agg(
        F.countDistinct("bin_id").cast("bigint").alias("n_bins_after")
    ).select(gk, "n_bins_after")
    new_bins = rewrite.groupBy("source").agg(
        F.countDistinct("bin_id").cast("bigint").alias("n_new_bins")
    ).select(gk, "n_new_bins")

    def src_fp(df: DataFrame, n: str, x: str) -> DataFrame:
        return (
            df.withColumn("rh", _row_hash_col())
            .groupBy("source")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias(n),
                F.expr("bit_xor(rh)").cast("bigint").alias(x),
            )
            .select(gk, n, x)
        )

    small_fp = src_fp(
        base_small.drop("in_file").unionByName(arr_small.drop("in_file")),
        "s_n",
        "s_x",
    )
    stitched_fp = src_fp(stitched.drop("bin_id"), "t_n", "t_x")

    # per-bin fingerprints: physical stitched vs the logical full repack
    docs_binned = (
        base_small.unionByName(arr_small)
        .join(
            plan_all.select(
                F.col("source").alias("p_source"),
                F.col("in_file").alias("p_in_file"),
                F.col("bin_id").alias("l_bin"),
            ),
            F.col("source").eqNullSafe(F.col("p_source"))
            & (F.col("in_file") == F.col("p_in_file")),
        )
        .drop("p_source", "p_in_file", "in_file")
    )

    def bin_fp(df: DataFrame, bin_col: str, n: str, x: str) -> DataFrame:
        return (
            df.withColumn("rh", _row_hash_col())
            .groupBy("source", bin_col)
            .agg(
                F.count(F.lit(1)).cast("bigint").alias(n),
                F.expr("bit_xor(rh)").cast("bigint").alias(x),
            )
            .select(gk, F.col(bin_col).alias("b"), n, x)
        )

    lb = bin_fp(docs_binned, "l_bin", "l_n", "l_x")
    pb = bin_fp(stitched, "bin_id", "p_n", "p_x")
    repack_ok = (
        lb.join(pb, ["gk", "b"], "full_outer")
        .groupBy("gk")
        .agg(
            F.coalesce(
                F.min(
                    F.coalesce(
                        (F.col("l_n") == F.col("p_n"))
                        & F.col("l_x").eqNullSafe(F.col("p_x")),
                        F.lit(False),
                    )
                ),
                F.lit(True),
            ).alias("matches_full_repack")
        )
    )

    return (
        facts.join(new_bins, "gk", "left")
        .join(phys, "gk", "left")
        .join(small_fp, "gk", "left")
        .join(stitched_fp, "gk", "left")
        .join(repack_ok, "gk", "left")
        .select(
            "source",
            "n_base_files",
            "n_arrival_files",
            "n_base_bins",
            "n_touched_base_bins",
            F.coalesce(F.col("n_new_bins"), F.lit(0))
            .cast("bigint")
            .alias("n_new_bins"),
            F.coalesce(F.col("n_bins_after"), F.lit(0))
            .cast("bigint")
            .alias("n_bins_after"),
            F.coalesce(
                (F.col("s_n") == F.col("t_n"))
                & F.col("s_x").eqNullSafe(F.col("t_x")),
                F.lit(False),
            ).alias("content_equal"),
            F.coalesce(F.col("matches_full_repack"), F.lit(False)).alias(
                "matches_full_repack"
            ),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Incremental Z-order maintenance (round 12): the layout family's
# batch/incremental symmetry, matching compaction's (plan -> apply ->
# incremental). The full apply re-cuts files by global (z, event_id) RANK —
# optimal extents, but an insert anywhere shifts every later file. The
# incremental form instead keys files by STABLE Z-CELL boundaries
# (cell_id = z >> ZORDER_CELL_SHIFT — the liquid-clustering/space-filling-
# curve-bucket shape production layout engines use precisely so inserts
# stay local): arrival routing is pure integer arithmetic (no join, no
# range search), and a batch of arrivals rewrites ONLY the cells it lands
# in — O(touched cells + arrivals) at any corpus size. Cell occupancy
# drift (a cell growing past the file-size target) is the compaction
# planner's job, deliberately out of scope here.
# ---------------------------------------------------------------------------

ZORDER_CELL_SHIFT = 3  # 10-bit z-space -> 128 stable cells
# The arriving batch is the NEWEST DAY's events — the nightly-ingest shape
# that makes incremental clustering worth having: a day pins the zy
# coordinate, so the batch's Morton codes are confined to the cells whose
# z-range contains that stripe (measured: 8 of 120 cells at sf0.1)
# instead of sprinkling uniformly over every cell the way an id-residue
# batch would. NULL-ts rows never arrive (MAX of dates is NULL-safe on
# both engines: comparison with NULL is never TRUE).
ZORDER_ARRIVAL_SQL = (
    "CAST(ts AS DATE) = (SELECT MAX(CAST(ts AS DATE)) FROM events"
    " WHERE event_id IS NOT NULL)"
)

_ZORDER_INCR_LAKES: set[str] = set()


def zorder_cell_lakes(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(corpus_cell_lake, rewritten_touched_cells, arrivals) physical reads
    + the arrivals frame. First use per process writes the CORPUS z-cell
    lake (events minus arrivals, partitioned by cell_id, z-sorted within),
    then executes the incremental apply: arrivals route by arithmetic,
    ONLY their cells are rewritten (old cell rows + arrivals, re-sorted)
    to a second physical path. Later uses read back."""
    from .lake import _lake_path

    corpus_path = _lake_path(sf_dir, "events_zcells_corpus")
    incr_path = _lake_path(sf_dir, "events_zcells_incr")
    events = load_table(spark, sf_dir, "events").filter(
        F.col("event_id").isNotNull()
    )
    # newest-day arrival flag, derived declaratively (1-row broadcast max —
    # the scalar-injection pattern, never a driver round-trip); the flag
    # rides the SAME map-side projection as the coordinates, no extra join
    maxd = events.agg(F.max(F.to_date("ts")).alias("_maxd"))
    m = 2**ZORDER_BITS
    day = F.coalesce(
        F.datediff(F.to_date("ts"), F.to_date(F.lit("2024-01-01"))), F.lit(0)
    )
    coded = (
        events.crossJoin(F.broadcast(maxd))
        .select(
            "event_id",
            (F.coalesce(F.col("user_id"), F.lit(0)) % m)
            .cast("bigint")
            .alias("zx"),
            (((day % m) + m) % m).cast("bigint").alias("zy"),
            "event_type",
            "value",
            F.coalesce(
                F.to_date("ts") == F.col("_maxd"), F.lit(False)
            ).alias("_is_arr"),
        )
        .withColumn(
            "z", _morton_col(F.col("zx"), F.col("zy"), ZORDER_BITS)
        )
        .withColumn(
            "cell_id",
            F.floor(F.col("z") / F.lit(2**ZORDER_CELL_SHIFT)).cast("bigint"),
        )
        .drop("z")
    )
    arrivals = coded.filter(F.col("_is_arr")).drop("_is_arr")
    corpus = coded.filter(~F.col("_is_arr")).drop("_is_arr")
    schema = corpus.schema
    if corpus_path not in _ZORDER_INCR_LAKES:
        write_partitioned_lake(
            corpus, corpus_path, ["cell_id"], sort_cols=["zx", "zy", "event_id"]
        )
        stored = spark.read.schema(schema).parquet(corpus_path)
        # the rewrite reads ONLY the touched cells of the physical lake.
        # STATIC partition pruning: the touched-cell id list is bounded by
        # the fixed cell space (<= 2^(10 - ZORDER_CELL_SHIFT) = 128 ids —
        # the documented metadata-scale bounded-collect class), and an IN
        # filter on the partition column reaches the scan as a
        # PartitionFilter (plan-contract-pinned in tests/test_round12.py);
        # a broadcast join here does NOT prune — DPP never fires because
        # the touched side derives from the same query, so the join form
        # silently scanned every cell directory (r12 post-review check)
        touched_ids = [
            r.cell_id
            for r in arrivals.select("cell_id").distinct().collect()
        ]
        rewritten = stored.filter(
            F.col("cell_id").isin(touched_ids)
            if touched_ids
            else F.lit(False)
        ).unionByName(arrivals)
        write_partitioned_lake(
            rewritten, incr_path, ["cell_id"],
            sort_cols=["zx", "zy", "event_id"],
        )
        # memoize only AFTER both writes completed (ADVICE-r11 ordering)
        _ZORDER_INCR_LAKES.add(corpus_path)
    stored = spark.read.schema(schema).parquet(corpus_path)
    rewritten = spark.read.schema(schema).parquet(incr_path)
    return stored, rewritten, arrivals


def _zorder_incr_oracle_sql() -> str:
    m1 = 2**ZORDER_BITS - 1
    return f"""
        WITH coded AS (
          SELECT event_id,
                 CAST({_ZX} AS BIGINT) AS zx,
                 CAST({_ZY} AS BIGINT) AS zy,
                 CAST(({_morton_sql(f"({_ZX})", f"({_ZY})", ZORDER_BITS)})
                      // {2**ZORDER_CELL_SHIFT} AS BIGINT) AS cell_id
          FROM events
          WHERE event_id IS NOT NULL
        ),
        arr AS (SELECT c.* FROM coded c JOIN events e USING (event_id)
                WHERE {ZORDER_ARRIVAL_SQL}),
        corp AS (SELECT * FROM coded
                 WHERE event_id NOT IN (SELECT event_id FROM arr)),
        touched AS (SELECT DISTINCT cell_id FROM arr),
        stitched AS (
          SELECT * FROM corp
          UNION ALL SELECT * FROM arr
        ),
        cells AS (
          SELECT cell_id,
                 MIN(zx) AS xmn, MAX(zx) AS xmx,
                 MIN(zy) AS ymn, MAX(zy) AS ymx
          FROM stitched GROUP BY cell_id
        ),
        m AS (
          SELECT
            (SELECT CAST(COUNT(*) AS BIGINT) FROM arr) AS n_arrivals,
            (SELECT CAST(COUNT(DISTINCT cell_id) AS BIGINT) FROM corp)
              AS n_cells_corpus,
            (SELECT CAST(COUNT(*) AS BIGINT) FROM touched)
              AS n_cells_touched,
            (SELECT CAST(COUNT(*) AS BIGINT) FROM corp
             WHERE cell_id IN (SELECT cell_id FROM touched))
              AS n_corpus_rows_rewritten,
            (SELECT CAST(COALESCE(SUM(xmn + {m1} - xmx), 0) AS BIGINT)
             FROM cells) AS x_prunable_stitched,
            (SELECT CAST(COALESCE(SUM(ymn + {m1} - ymx), 0) AS BIGINT)
             FROM cells) AS y_prunable_stitched,
            TRUE AS content_equal
        )
        SELECT * FROM m
    """


@register(
    "lake_zorder_apply_incremental",
    "O-ext,A3,S6-analog,V4-analog",
    "Incremental Z-order maintenance — the batch-ingest twin of "
    "lake_zorder_apply, completing the layout family's symmetry with "
    "compaction (apply + incremental): the corpus lands as a PHYSICAL "
    "z-cell lake keyed by STABLE cell boundaries (cell_id = Morton z >> "
    f"{ZORDER_CELL_SHIFT} — the liquid-clustering shape production layout "
    "engines use precisely so inserts stay local; the full apply's "
    "rank-cut files would shift on every insert), and the arriving batch "
    "— the NEWEST DAY's events, the nightly-ingest shape whose pinned "
    "day coordinate confines its Morton codes to a fraction of the cells "
    "(8 of 120 at sf0.1) — routes by pure integer arithmetic: no "
    "join, no range search — and rewrites ONLY the cells it lands in "
    "(STATICALLY partition-pruned read of those cell directories via the "
    "bounded collected touched-id list — <= 128 ids, metadata-scale; "
    "plan-contract-pinned — then merge and z-sorted "
    "rewrite): O(touched cells + arrivals) at any corpus size, with "
    "n_cells_touched <= min(arrivals, cells) as output evidence. The "
    "stitched lake (untouched cells read from the corpus lake + "
    "rewritten cells from the incremental path) must fingerprint-equal "
    "the full corpus+arrivals content (content_equal — both reads are "
    "physical on the Spark side; a cell missed, duplicated or mangled "
    "flips it red and breaks the oracle hash), and because cell "
    "membership is arithmetic, the stitched layout IS the layout a full "
    "rebuild would produce — its per-cell extents and two-sided "
    "stripe-skip sums (x/y_prunable_stitched) replay exactly. The "
    "oracle replays coordinates, cells, routing, counts and both skip "
    "sums from the raw events view.",
    oracle=_zorder_incr_oracle_sql(),
)
def lake_zorder_apply_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from .helpers import ordered_small

    m1 = 2**ZORDER_BITS - 1
    stored, rewritten, arrivals = zorder_cell_lakes(spark, sf_dir)
    touched = arrivals.select("cell_id").distinct()
    # stitched physical read: untouched corpus cells + rewritten cells
    untouched = stored.join(F.broadcast(touched), "cell_id", "left_anti")
    stitched = untouched.unionByName(rewritten)

    cells = stitched.groupBy("cell_id").agg(
        F.min("zx").alias("xmn"),
        F.max("zx").alias("xmx"),
        F.min("zy").alias("ymn"),
        F.max("zy").alias("ymx"),
    )
    ext = cells.agg(
        F.coalesce(F.sum(F.col("xmn") + (F.lit(m1) - F.col("xmx"))), F.lit(0))
        .cast("bigint")
        .alias("x_prunable_stitched"),
        F.coalesce(F.sum(F.col("ymn") + (F.lit(m1) - F.col("ymx"))), F.lit(0))
        .cast("bigint")
        .alias("y_prunable_stitched"),
    )
    # content: the stitched physical read vs the coded corpus+arrivals
    truth = _zorder_coded_events(spark, sf_dir)

    def fp(df: DataFrame, n: str, x: str) -> DataFrame:
        return df.withColumn("_rh", _zrow_hash_col()).agg(
            F.count(F.lit(1)).cast("bigint").alias(n),
            F.expr("bit_xor(_rh)").cast("bigint").alias(x),
        )

    out = (
        arrivals.agg(F.count(F.lit(1)).cast("bigint").alias("n_arrivals"))
        .crossJoin(
            F.broadcast(
                stored.agg(
                    F.countDistinct("cell_id")
                    .cast("bigint")
                    .alias("n_cells_corpus")
                )
            )
        )
        .crossJoin(
            F.broadcast(
                touched.agg(
                    F.count(F.lit(1)).cast("bigint").alias("n_cells_touched")
                )
            )
        )
        .crossJoin(
            F.broadcast(
                stored.join(F.broadcast(touched), "cell_id").agg(
                    F.count(F.lit(1))
                    .cast("bigint")
                    .alias("n_corpus_rows_rewritten")
                )
            )
        )
        .crossJoin(F.broadcast(ext))
        .crossJoin(F.broadcast(fp(stitched, "_sn", "_sx")))
        .crossJoin(F.broadcast(fp(truth, "_tn", "_tx")))
        .select(
            "n_arrivals",
            "n_cells_corpus",
            "n_cells_touched",
            "n_corpus_rows_rewritten",
            "x_prunable_stitched",
            "y_prunable_stitched",
            F.coalesce(
                (F.col("_sn") == F.col("_tn"))
                & F.col("_sx").eqNullSafe(F.col("_tx")),
                F.lit(False),
            ).alias("content_equal"),
        )
    )
    return ordered_small(out, "n_arrivals")
