"""Deduplication operators (engine extension, BASELINE.json north star).

Large-scale training-data dedup over a ``documents``-shaped table:

- **exact**: hash-groupBy on a content digest — one shuffle on the digest,
  keep min-id representative.
- **MinHash + LSH near-dup**: word n-gram shingles → K minhashes → banded
  signatures → candidate pairs via band-bucket self-join → exact Jaccard
  verification on the candidates only. At 100 TB the band join shuffles
  only (doc, band-hash) pairs and candidate verification touches a tiny
  fraction of the corpus — never the O(n²) pair space.
- **SimHash**: per-word hash bit-voting → compact signature; equal-signature
  buckets are near-dup candidates.

All hashing is sha256/md5-based (not Spark's murmur) so signatures are
engine-independent — the DuckDB oracles reproduce them bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F


# Query-scoped persists (shingle/candidate tables) live here so harnesses
# that run MANY queries in one session can release exactly these between
# queries — without nuking session-lifetime caches like the pipeline
# family's shared canon/derived tables (spark.catalog.clearCache would).
_SCOPED_CACHES: list[DataFrame] = []


def _scoped_persist(df: DataFrame) -> DataFrame:
    out = df.persist()
    _SCOPED_CACHES.append(out)
    return out


def _free_checkpoint_blocks(df: DataFrame) -> None:
    """Free the storage behind a ``localCheckpoint``-ed DataFrame NOW.

    ``df.unpersist()`` only uncaches CacheManager entries; a checkpointed
    Dataset is backed by an RDD-level persist that CacheManager never sees,
    so without this the blocks linger until the JVM garbage-collects the
    plan (measured: they survive ``unpersist()`` AND driver-side gc). The
    checkpointed plan is a ``LogicalRDD`` whose ``rdd`` field is exactly the
    persisted RDD — unpersist it directly. Safe no-op on non-checkpoint
    plans and stopped sessions."""
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getSimpleName() == "LogicalRDD":
            plan.rdd().unpersist(False)
    except Exception:
        pass


def _flat_checkpoint(df: DataFrame) -> DataFrame:
    """``localCheckpoint(eager=True)`` WITHOUT the origin-stats rewrite.

    Spark 4's ``Dataset.checkpoint`` copies the origin plan's size estimate
    onto the new ``LogicalRDD`` (``LogicalRDD.rewriteStatsAndConstraints``).
    Inside an iterative loop that is a planning-time time bomb: each
    round's join plan MULTIPLIES its children's size estimates
    (``SizeInBytesOnlyStatsPlanVisitor.visitJoin`` — a BigInt product), and
    the checkpoint hands that product to the next round as a leaf estimate,
    so the estimate's bit-length grows geometrically with round count —
    measured on the CC loop: ~2× bits/round with one pointer jump, 2^j× with
    j composed jumps, until the driver spends MINUTES in
    ``BigInteger.multiply`` (Karatsuba/Toom-Cook frames in the thread dump).
    Re-wrapping the checkpoint's materialized row RDD via
    ``internalCreateDataFrame`` builds the same ``LogicalRDD`` with NO
    origin stats: leaves fall back to ``defaultSizeInBytes`` and every
    round's stats stay O(64) bits. The rows were already copied and
    persisted by the checkpoint, so this adds no data work; partitioning
    metadata is dropped, which no call site relies on (every consumer
    re-shuffles by a different key). Auto-broadcast decisions are
    unaffected where this is used — the iterative loops disable broadcast
    anyway. ``_free_checkpoint_blocks`` keeps working: the plan is a
    ``LogicalRDD`` whose ``rdd()`` is exactly the persisted RDD."""
    ck = df.localCheckpoint(eager=True)
    plan = ck._jdf.queryExecution().analyzed()
    if plan.getClass().getSimpleName() != "LogicalRDD":  # defensive: API drift
        return ck
    spark = df.sparkSession
    jdf = spark._jsparkSession.internalCreateDataFrame(
        plan.rdd(), ck._jdf.schema(), False
    )
    return DataFrame(jdf, spark)


def fan_out(df: DataFrame, *keys: str) -> DataFrame:
    """Hash-repartition ``df`` to the session's default parallelism when its
    SCAN would land on fewer partitions than the session has cores — the
    tiny-file fan-out ``shingle_table`` applies to documents, generalized
    (guide §2: a parquet file under ``spark.sql.files.maxPartitionBytes``
    scans as ONE partition, so CPU-heavy per-row work — interpreted HOF
    folds, sha256 chains, fixed-point argmins — runs single-task no matter
    how many cores the cluster has; measured: the embedding family's 8-core
    and 32-core bench times were IDENTICAL before this).

    Scale-adaptive, not a local[] constant: the trigger is the optimizer's
    size estimate vs ``maxPartitionBytes`` — a corpus-sized input (estimate
    >= cores × split size) already scans wide and is returned UNCHANGED, so
    no 100 TB table ever pays a concentrating shuffle; a sub-split file pays
    one narrow row shuffle to buy full parallelism. Plan-time metadata only
    (no job). Keyed repartition (deterministic hash), never round-robin —
    round-robin pays a per-partition sort and is retry-unsafe on
    non-deterministic input (guide §2.5)."""
    spark = df.sparkSession
    p = spark.sparkContext.defaultParallelism
    try:
        size = int(
            str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        )
        max_pb = spark.conf.get("spark.sql.files.maxPartitionBytes", "128m")
        unit = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "b": 1}
        s = str(max_pb).strip().lower().removesuffix("b") or "134217728"
        split = int(s[:-1]) * unit[s[-1]] if s[-1] in unit else int(s)
        if size >= p * split:
            return df
    except Exception:
        pass  # estimate unavailable — fan out (the safe local default)
    return df.repartition(p, *[F.col(k) for k in keys])


def _conf_isolated_session(spark):
    """A cloned SparkSession (same SparkContext, cache manager and runtime
    conf VALUES, fresh SQLConf OBJECT) whose ``conf.set`` is invisible to the
    parent — the reentrancy fix for operators that tune session-level conf
    around an eager loop (``cluster.connected_components``). With the loop's
    conf private, independent legs of a multi-leg query can run in parallel
    driver threads (guide §2.6) without racing plan-time conf reads.

    ``cloneSession`` (not ``newSession``): the clone COPIES the parent's
    current runtime conf (timezone, nanosAsLong, AQE flags), where a new
    session would reset to the SparkContext defaults and silently drop any
    runtime overrides a harness applied after startup."""
    from pyspark.sql import SparkSession

    return SparkSession(
        spark.sparkContext, jsparkSession=spark._jsparkSession.cloneSession()
    )


def _rebind_session(df: DataFrame, spark) -> DataFrame:
    """Re-wrap a ``_flat_checkpoint``-ed DataFrame's materialized row RDD
    into ``spark`` (another session on the SAME SparkContext). The rows are
    already persisted; this only re-homes the ``LogicalRDD`` so downstream
    plans resolve against the target session's conf/state. No-op when the
    plan is not a ``LogicalRDD`` (defensive: API drift) or the session
    already matches."""
    if df.sparkSession is spark:
        return df
    plan = df._jdf.queryExecution().analyzed()
    if plan.getClass().getSimpleName() != "LogicalRDD":
        return df
    jdf = spark._jsparkSession.internalCreateDataFrame(
        plan.rdd(), df._jdf.schema(), False
    )
    return DataFrame(jdf, spark)


def _scoped_flat_checkpoint(df: DataFrame) -> DataFrame:
    """Eager :func:`_flat_checkpoint` registered with the scoped-cache pool
    — for intermediates that MANY downstream legs re-reference in one big
    plan (the forget reports union ~10 legs over the same base table). A
    plain persist caches the DATA but every leg's LOGICAL plan still
    carries the full upstream lineage, and Catalyst re-analyzes it per leg:
    measured on deletion_propagation_semgate_state, the driver spent 7.3 s
    of an 18 s run in a zero-stage planning gap before the final job. The
    checkpoint truncates the lineage to a flat ``LogicalRDD`` leaf (guide
    §3.3 — materialize to cut planning time), and the stats strip keeps
    size estimates O(64) bits. Blocks are freed by
    :func:`release_scoped_caches` like every scoped persist."""
    out = _flat_checkpoint(df)
    _SCOPED_CACHES.append(out)
    return out


def release_scoped_caches() -> None:
    """Unpersist every query-scoped intermediate registered since the last
    release. Call after the consuming action completes (bench.py and
    tests/parity.py do); safe to call twice or on a stopped session."""
    while _SCOPED_CACHES:
        df = _SCOPED_CACHES.pop()
        try:
            df.unpersist()
        except Exception:  # session already stopped — nothing to release
            pass
        _free_checkpoint_blocks(df)


def words(text: Column) -> Column:
    """Lowercased whitespace tokens."""
    return F.split(F.trim(F.lower(text)), r"\s+")


def word_shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles; short docs (<n words) shingle to the whole text."""
    return shingles_from_words(words(text), n)


def shingles_from_words(w: Column, n: int = 3) -> Column:
    """Word n-gram shingles from a pre-tokenized word array.

    Prefer binding ``w`` to a materialized column: every reference here is
    repeated (3×n inside the gram transform), and inlining a full tokenizer
    expression at each reference bloats the generated code (slow Janino
    compiles) and re-tokenizes per gram.
    """
    idx = F.sequence(F.lit(1), F.size(w) - (n - 1))
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.try_element_at(w, (i + j).cast("int")) for j in range(n)]
        ),
    )
    return F.when(F.size(w) >= n, grams).otherwise(F.array(F.concat_ws(" ", w)))


def hash64(prefix: Column | str, value: Column) -> Column:
    """Deterministic 32-bit-range hash: first 8 hex chars of sha256, as BIGINT.

    Cross-engine reproducible (DuckDB: CAST(concat('0x', substr(sha256(..),1,8))
    AS BIGINT)) — unlike Spark's xxhash64/murmur.
    """
    p = F.lit(prefix) if isinstance(prefix, str) else prefix
    return F.conv(F.substring(F.sha2(F.concat(p, value), 256), 1, 8), 16, 10).cast("long")


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact dedup by sha256(text): one row per digest (min id), dup count."""
    return (
        df.select(F.col(id_col), F.sha2(F.col(text_col), 256).alias("content_sha"))
        .groupBy("content_sha")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("copies"),
        )
    )


def shingle_table(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """(id, shingle) pairs, distinct per doc.

    NULL text yields ZERO shingle rows — a NULL document has no content.
    This is distinct from the EMPTY string, whose whole-text fallback is
    the ``''`` shingle, and it is load-bearing for cross-engine parity:
    without the filter Spark's ``concat_ws`` renders NULL words as ``''``
    while DuckDB's ``array_to_string(NULL)`` stays NULL, so a NULL doc
    would gram-match every empty doc on one engine and nothing on the
    other (caught by tests/test_extensions.py unicode/NULL parity probe).
    The oracle twin (queries/dedup.py::_shingles_cte) filters identically.

    Repartitions the input first: document files are small relative to
    ``spark.sql.files.maxPartitionBytes``, so a raw scan often lands on a
    handful of partitions and the (CPU-heavy) shingle+hash work would not
    fan out across the cluster. One cheap row shuffle buys full parallelism.
    """
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    return (
        df.select(F.col(id_col).alias("doc"), F.col(text_col).alias("_text"))
        .filter(F.col("_text").isNotNull())
        .repartition(parallelism, F.col("doc"))
        .select("doc", words(F.col("_text")).alias("_w"))
        .select(
            "doc",
            F.explode(F.array_distinct(shingles_from_words(F.col("_w"), n))).alias(
                "sh"
            ),
        )
    )


def minhash_signatures(
    shingles: DataFrame, num_hashes: int = 12
) -> DataFrame:
    """doc → K minhash values (one groupBy; map-side partial min).

    The K hash functions are disjoint 8-hex-char (32-bit) windows of
    ``ceil(K/8)`` sha256 digests — 2 digests yield 12 independent hashes
    instead of 12 separate sha256 evaluations, cutting both per-row hashing
    and generated-code size. The digests are materialized as columns before
    the aggregate so each window references a bound column.
    """
    n_digests = (num_hashes + 7) // 8
    with_digests = shingles.select(
        "doc",
        *[
            F.sha2(F.concat(F.lit(f"{d}:"), F.col("sh")), 256).alias(f"_d{d}")
            for d in range(n_digests)
        ],
    )
    aggs = []
    for j in range(num_hashes):
        d, w = divmod(j, 8)
        window = F.conv(F.substring(F.col(f"_d{d}"), w * 8 + 1, 8), 16, 10).cast(
            "long"
        )
        aggs.append(F.min(window).alias(f"h{j}"))
    return with_digests.groupBy("doc").agg(*aggs)


def lsh_candidate_pairs(
    signatures: DataFrame, num_hashes: int = 12, bands: int = 3
) -> DataFrame:
    """Banded LSH: docs sharing any band hash become candidate pairs (a < b).

    All bands are emitted in ONE pass over the signatures (explode of a
    (band, band-hash) struct array) — a per-band union would re-evaluate the
    upstream minhash aggregation once per band.
    """
    buckets = band_buckets(signatures, num_hashes, bands)
    left = buckets.select(F.col("doc").alias("a"), "band", "bh")
    right = buckets.select(F.col("doc").alias("b"), "band", "bh")
    return (
        left.join(right, ["band", "bh"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def band_buckets(
    signatures: DataFrame, num_hashes: int = 12, bands: int = 3
) -> DataFrame:
    """(doc, band, band-hash) bucket assignments, all bands in one pass."""
    rows_per_band = num_hashes // bands
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws(
                        ",",
                        *[
                            F.col(f"h{b * rows_per_band + r}").cast("string")
                            for r in range(rows_per_band)
                        ],
                    )
                ).alias("bh"),
            )
            for b in range(bands)
        ]
    )
    return signatures.select(
        F.col("doc"), F.explode(band_structs).alias("bb")
    ).select("doc", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))


def lsh_cross_candidates(
    sig_new: DataFrame,
    sig_corpus: DataFrame,
    num_hashes: int = 12,
    bands: int = 3,
) -> DataFrame:
    """Incremental-ingest candidate pairs: NEW-batch docs against the
    EXISTING corpus only — ``(a=new doc, b=corpus doc)`` sharing any LSH
    band. The production shape for continuous ingestion: the corpus side's
    pair space is never generated (band buckets join across sides only), so
    a day's batch costs O(batch + matching buckets) regardless of corpus
    size. Minhash signatures depend only on a doc's own shingles, so the
    candidate set equals the full-corpus banding restricted to cross-side
    pairs — which is what the DuckDB oracle replays."""
    left = band_buckets(sig_new, num_hashes, bands).select(
        F.col("doc").alias("a"), "band", "bh"
    )
    right = band_buckets(sig_corpus, num_hashes, bands).select(
        F.col("doc").alias("b"), "band", "bh"
    )
    return left.join(right, ["band", "bh"]).select("a", "b").distinct()


def jaccard_verify(
    candidates: DataFrame, shingles: DataFrame, threshold: float
) -> DataFrame:
    """Exact Jaccard on candidate pairs only; returns (a, b, jaccard)."""
    sizes = shingles.groupBy("doc").agg(F.count(F.lit(1)).alias("n_sh"))
    inter = (
        candidates.join(
            shingles.select(F.col("doc").alias("a"), F.col("sh").alias("sh")), "a"
        )
        .join(
            shingles.select(F.col("doc").alias("b"), F.col("sh").alias("sh")),
            ["b", "sh"],
        )
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.select(F.col("doc").alias("a"), F.col("n_sh").alias("na")), "a")
        .join(sizes.select(F.col("doc").alias("b"), F.col("n_sh").alias("nb")), "b")
        .select(
            "a",
            "b",
            (
                F.col("inter").cast("double")
                / (F.col("na") + F.col("nb") - F.col("inter"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 12,
    bands: int = 3,
    threshold: float = 0.5,
    shingle_n: int = 3,
) -> DataFrame:
    """End-to-end near-dup: shingle → minhash → LSH bands → Jaccard verify.

    The shingle table feeds four downstream consumers (signature mins, both
    sides of the intersection join, and the per-doc sizes) — persist it so the
    explode+hash work runs once. On a cluster this would be a checkpoint of
    the shingle shuffle; in-memory persistence is the local[] equivalent.

    Cache lifetime contract: the persists are scoped to ONE execution of the
    returned plan and registered for :func:`release_scoped_caches` — callers
    that run many queries in a shared session (bench, parity harness) call it
    between queries. persist() defaults to MEMORY_AND_DISK_DESER, so even an
    unreleased cache spills rather than evicting hot blocks.
    """
    sh = _scoped_persist(shingle_table(df, id_col, text_col, shingle_n))
    sigs = minhash_signatures(sh, num_hashes)
    cands = _scoped_persist(lsh_candidate_pairs(sigs, num_hashes, bands))
    return jaccard_verify(cands, sh, threshold)


def word_hashes(text: Column) -> Column:
    """Per-distinct-word 32-bit hashes (sha256-derived), as an array<long>."""
    return F.transform(F.array_distinct(words(text)), lambda x: hash64("w:", x))


def simhash_from_hashes(hashes: Column, n_bits: int = 16) -> Column:
    """``n_bits``-wide SimHash from a pre-materialized word-hash array
    (bit-voting; word hashes are 32-bit, so ``n_bits`` <= 32).

    Bind ``hashes`` to a real column: the per-bit vote aggregates each
    reference it, and inlining tokenize+sha256 at every site would hash
    every word ``n_bits``× per row and bloat codegen.
    """
    bits = []
    for b in range(n_bits):
        votes = F.aggregate(
            hashes,
            F.lit(0).cast("long"),
            lambda acc, h: acc
            + F.when(h.bitwiseAND(F.lit(1 << b)) != 0, 1).otherwise(-1),
        )
        bits.append(F.when(votes > 0, F.lit(1 << b)).otherwise(0))
    out = bits[0]
    for bit in bits[1:]:
        out = out + bit
    return out.cast("long")


def simhash16(text: Column) -> Column:
    """16-bit SimHash over word hashes (bit-voting), engine-independent."""
    return simhash_from_hashes(word_hashes(text))


# ---------------------------------------------------------------------------
# Adaptive pigeonhole Hamming blocking (r9 verdict task #1) — shared by the
# SimHash family here and the perceptual-hash family in
# operators/multimodal.py.
#
# Classic pigeonhole (agreement level 1): split an n_bits signature into
# max_hamming + 1 disjoint blocks; a pair within the radius agrees EXACTLY on
# >= 1 block, so an equality join on (block_idx, block_bits) finds every
# pair. Its scale blind spot: block width is n_bits/(h+1) REGARDLESS of
# corpus size, so uniform-hash chance candidates grow ~ C * n^2 / 2^width —
# fine at 10^4 signatures, saturating at 10^6+ (the last corpus-size-blind
# blocking parameter after r9 made kNN/SemDeDup cells occupancy-adaptive).
#
# The adaptive generalization (multi-index Hamming search, Norouzi et al.
# 2012): at agreement level c, split into m = max_hamming + c blocks and join
# on every C(m, c) combination of c blocks. Completeness is the same
# pigeonhole argument: a pair within radius h differs in at most h of the m
# blocks, hence agrees fully on >= m - h = c blocks, hence at least one
# c-combination agrees on ALL its blocks — the join finds every pair at ANY
# level, so the result set is level-invariant (test-pinned) and the all-pairs
# SQL oracles need no replay of the blocking. What the level buys: join-key
# width grows ~ c * n_bits / m bits, so chance candidates shrink by ~2^width
# while key rows per signature grow only polynomially (C(m, c)); the level is
# chosen from the observed corpus size so expected chance candidates per
# signature stay within a fixed budget at any scale. Beyond
# PIGEONHOLE_MAX_LEVEL the scheme stays CORRECT (it degrades in candidate
# volume, never in recall) — the documented lever past that point is a wider
# signature (256-bit pHash / 64-bit SimHash), which raises every level's
# block width at the same blocking machinery.
# ---------------------------------------------------------------------------

# Budget: expected UNIFORM-hash chance candidates per signature. Level c is
# the smallest with n * C(m, c) <= PIGEONHOLE_TARGET * 2^(min combined key
# width). For 64-bit signatures at radius 8 the ladder steps near n = 58k /
# 373k / 1.6M; for 32-bit SimHash at radius 2 near n = 1.4M / 45M. The
# budget is MEASURED, not guessed: on the sf1 replica (33k visual
# signatures, 74M level-1 raw candidates) level 1 still wins wall-clock
# (2.2s vs 3.4s for the candidate join — codegen chews cheap candidates at
# ~35M rows/s while level 2 pays 5x bucket rows through the shuffle), so
# the first step sits just past the measured local[32] crossover; at n =
# 100k the level-1 candidate term alone is ~10x that and level 2 wins.
PIGEONHOLE_TARGET = 4096
PIGEONHOLE_MAX_LEVEL = 4
# Multi-word fan-out path switch: at most this many c-combinations ride the
# whole-stage-codegen struct explode (fastest); past it Janino would OOM on
# the generated code (~1000-struct ceiling measured), so the fan-out ships
# as a broadcast combos TABLE instead — same (bi, bv) output (ADVICE r11)
PIGEONHOLE_CODEGEN_COMBOS = 512


def _pigeonhole_widths(n_bits: int, n_blocks: int) -> tuple[list[int], list[int]]:
    """(widths, shifts) of ``n_blocks`` disjoint blocks covering ``n_bits``."""
    base, rem = divmod(n_bits, n_blocks)
    widths = [base + (1 if i < rem else 0) for i in range(n_blocks)]
    return widths, [sum(widths[:i]) for i in range(n_blocks)]


def pigeonhole_level(
    n: int,
    n_bits: int,
    max_hamming: int,
    target: int = PIGEONHOLE_TARGET,
    max_level: int = PIGEONHOLE_MAX_LEVEL,
) -> int:
    """Smallest agreement level whose worst-case expected chance-candidate
    count per signature (``n * C(m, c) / 2^w_min``, uniform-hash model, w_min
    = the narrowest c-combination's combined width) stays within ``target``;
    capped at ``max_level`` (correct but wider buckets beyond — see module
    comment)."""
    from math import comb

    for c in range(1, max_level):
        m = max_hamming + c
        widths, _ = _pigeonhole_widths(n_bits, m)
        w_min = sum(sorted(widths)[:c])
        if n * comb(m, c) <= target * (1 << w_min):
            return c
    return max_level


def pigeonhole_buckets(
    df: DataFrame, hash_col: str, n_bits: int, max_hamming: int, level: int
) -> DataFrame:
    """One row per (input row, c-block combination): the input columns plus
    ``bi`` (combination index) and ``bv`` (the combination's block values
    packed into one non-negative long — the equality-join key). All
    extraction is JVM-side bit arithmetic (arithmetic shift + mask, so the
    signed-64 top block packs correctly)."""
    from itertools import combinations

    m = max_hamming + level
    widths, shifts = _pigeonhole_widths(n_bits, m)

    def block(i: int) -> Column:
        return F.shiftright(hash_col, shifts[i]).bitwiseAND(
            F.lit((1 << widths[i]) - 1)
        )

    structs = []
    for j, combo in enumerate(combinations(range(m), level)):
        bv = block(combo[0])
        for i in combo[1:]:
            bv = F.shiftleft(bv, widths[i]).bitwiseOR(block(i))
        structs.append(
            F.struct(F.lit(j).alias("bi"), bv.cast("long").alias("bv"))
        )
    cols = df.columns
    return df.select("*", F.explode(F.array(*structs)).alias("_b")).select(
        *cols, F.col("_b.bi").alias("bi"), F.col("_b.bv").alias("bv")
    )


def pigeonhole_expected_chance(
    n: int, n_bits: int, max_hamming: int, level: int
) -> float:
    """Worst-case EXPECTED chance candidates per signature at ``level`` under
    the uniform-hash model — the quantity :func:`pigeonhole_level` budgets
    (``n * C(m, c) / 2^w_min``). Exposed so tests can pin where a signature
    width's level ladder saturates and where a wider signature escapes."""
    from math import comb

    m = max_hamming + level
    widths, _ = _pigeonhole_widths(n_bits, m)
    w_min = sum(sorted(widths)[:level])
    return n * comb(m, level) / (1 << w_min)


def pigeonhole_buckets_multi(
    df: DataFrame,
    word_cols: list[str],
    n_bits: int,
    max_hamming: int,
    level: int,
) -> DataFrame:
    """Multi-WORD generalization of :func:`pigeonhole_buckets` — the
    level-cap escape the module comment promises (r10 verdict task #2): a
    signature wider than 64 bits ships as ``len(word_cols)`` BIGINT words
    (word 0 = bits 0..63 LSB-first, word 1 = bits 64..127, ...), and every
    level's block width then scales with the FULL ``n_bits``: at radius 8 a
    256-bit signature blocks ~28-bit keys at level 1 where 64 bits block
    ~7 — the chance-candidate budget holds to ~10^11 signatures before the
    ladder even steps.

    One row per (input row, c-block combination): the input columns plus
    ``bi`` (combination index) and ``bv`` (the combination's block values
    rendered as one join-key STRING — c block values can exceed 63 packed
    bits at deep levels, so the key is a ','-joined decimal string instead
    of a packed long). Blocks may straddle word boundaries; extraction is
    JVM-side shift/mask arithmetic stitching the low word's high bits to
    the high word's low bits, and the per-word arithmetic shift is
    mask-corrected exactly like the single-word path."""
    from itertools import combinations

    n_words = len(word_cols)
    if n_bits != 64 * n_words:
        raise ValueError(f"n_bits={n_bits} != 64 * {n_words} words")
    m = max_hamming + level
    widths, shifts = _pigeonhole_widths(n_bits, m)
    if max(widths) >= 64:
        # a >= 64-bit block's mask/shift arithmetic leaves LongType (the
        # literal (1<<64)-1 overflows, shiftleft wraps mod 64) — the caller
        # must raise the level so every block fits one word's arithmetic:
        # m = radius + level > n_words. hamming_pairs_from_word_sigs floors
        # its adaptive level accordingly; an explicit too-low level is a
        # caller bug and fails HERE with the fix named instead of as an
        # opaque NumberFormatException at execution (r11 review).
        raise ValueError(
            f"pigeonhole_buckets_multi: {m} blocks over {n_bits} bits gives "
            f"{max(widths)}-bit blocks; need max_hamming + level > {n_words} "
            f"(use level >= {n_words - max_hamming + 1})"
        )

    def word(i: int) -> Column:
        return F.col(word_cols[i])

    def block(i: int) -> Column:
        lo_w, lo_off = divmod(shifts[i], 64)
        width = widths[i]
        if lo_off + width <= 64:
            return F.shiftright(word(lo_w), lo_off).bitwiseAND(
                F.lit((1 << width) - 1)
            )
        lo_bits = 64 - lo_off
        hi_bits = width - lo_bits
        lo = F.shiftright(word(lo_w), lo_off).bitwiseAND(
            F.lit((1 << lo_bits) - 1)
        )
        hi = word(lo_w + 1).bitwiseAND(F.lit((1 << hi_bits) - 1))
        return F.shiftleft(hi, lo_bits).bitwiseOR(lo)

    combos = list(combinations(range(m), level))
    cols = df.columns
    if len(combos) <= PIGEONHOLE_CODEGEN_COMBOS:
        # shallow levels (every level the adaptive ladder reaches below
        # ~hundreds of millions of signatures): per-combination struct
        # explode — whole-stage-codegen'd shift/mask expressions, the
        # cheapest plan (measured ~0.7 s faster than the data-driven path
        # on the sf0.1 wide family at level 1)
        structs = []
        for j, combo in enumerate(combos):
            bv = F.concat_ws(",", *[block(i).cast("string") for i in combo])
            structs.append(F.struct(F.lit(j).alias("bi"), bv.alias("bv")))
        return df.select("*", F.explode(F.array(*structs)).alias("_b")).select(
            *cols, F.col("_b.bi").alias("bi"), F.col("_b.bv").alias("bv")
        )
    # DEEP levels (ADVICE r11): C(m, c) struct expressions in one projection
    # fail Janino codegen past ~1000 generated structs — 2925 at (radius 24,
    # level 3) — so past PIGEONHOLE_CODEGEN_COMBOS the fan-out ships as
    # DATA instead of code: the row projection computes the m block values
    # ONCE into an array (O(m) codegen at any level), and a broadcast
    # (bi, combo) table — one row per c-combination — fans rows out via a
    # nested-loop join; ``bv`` renders by indexing the block array with the
    # combo, byte-identical to the shallow path's concat_ws(',') key, so
    # the pair output is level-invariant across both paths (test-pinned).
    combos_df = df.sparkSession.createDataFrame(
        [(j, list(c)) for j, c in enumerate(combos)],
        "bi int, _combo array<int>",
    )
    blocks = F.array(*[block(i).cast("long") for i in range(m)])
    return (
        df.select("*", blocks.alias("_blk"))
        .crossJoin(F.broadcast(combos_df))
        .select(
            *cols,
            "bi",
            F.array_join(
                F.transform(
                    F.col("_combo"),
                    lambda i: F.element_at(F.col("_blk"), i + F.lit(1)).cast(
                        "string"
                    ),
                ),
                ",",
            ).alias("bv"),
        )
    )


def hamming_pairs_from_word_sigs(
    sig: DataFrame,
    id_col: str,
    word_cols: list[str],
    max_hamming: int,
    level: int | None = None,
    target: int = PIGEONHOLE_TARGET,
) -> DataFrame:
    """(a, b, hamming) pairs within ``max_hamming`` over a MULTI-WORD
    signature table — the wide twin of :func:`hamming_pairs_from_sigs`:
    size-adaptive level over the full bit width, multi-word pigeonhole
    candidate join, summed ``bit_count(xor)`` verify per word in the join
    projection BEFORE the distinct. Caller persists ``sig`` when its
    lineage is expensive."""
    n_words = len(word_cols)
    n_bits = 64 * n_words
    if level is None:
        # floor: every block must fit one word's shift/mask arithmetic
        # (width < 64 <=> radius + level > n_words); completeness holds at
        # ANY level, so raising it only narrows buckets
        level = max(
            pigeonhole_level(sig.count(), n_bits, max_hamming, target),
            n_words - max_hamming + 1,
        )
    buckets = pigeonhole_buckets_multi(
        sig.select(F.col(id_col).alias("doc"), *word_cols),
        word_cols,
        n_bits,
        max_hamming,
        level,
    )
    left = buckets.select(
        F.col("doc").alias("a"),
        *[F.col(w).alias(f"la{i}") for i, w in enumerate(word_cols)],
        "bi",
        "bv",
    )
    right = buckets.select(
        F.col("doc").alias("b"),
        *[F.col(w).alias(f"rb{i}") for i, w in enumerate(word_cols)],
        "bi",
        "bv",
    )
    ham = " + ".join(
        f"bit_count(la{i} ^ rb{i})" for i in range(len(word_cols))
    )
    return (
        left.join(right, ["bi", "bv"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", F.expr(ham).cast("long").alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def hamming_pairs_from_sigs(
    sig: DataFrame,
    id_col: str,
    sig_col: str,
    n_bits: int,
    max_hamming: int,
    level: int | None = None,
    target: int = PIGEONHOLE_TARGET,
) -> DataFrame:
    """(a, b, hamming) pairs within ``max_hamming`` over an arbitrary
    (id, signature) table — the blocking+verify core shared by
    :func:`simhash_hamming_pairs` and the distinct-signature cluster
    summaries (queries/clusters.py): size-adaptive pigeonhole candidate
    join, ``bit_count(xor)`` verify in the join projection BEFORE the
    distinct. The caller persists ``sig`` when its lineage is expensive
    (``level=None`` counts it once to derive the agreement level)."""
    if level is None:
        level = pigeonhole_level(sig.count(), n_bits, max_hamming, target)
    buckets = pigeonhole_buckets(
        sig.select(F.col(id_col).alias("doc"), F.col(sig_col).alias("s")),
        "s",
        n_bits,
        max_hamming,
        level,
    )
    left = buckets.select(
        F.col("doc").alias("a"), F.col("s").alias("sa"), "bi", "bv"
    )
    right = buckets.select(
        F.col("doc").alias("b"), F.col("s").alias("sb"), "bi", "bv"
    )
    return (
        left.join(right, ["bi", "bv"])
        .filter(F.col("a") < F.col("b"))
        # verify BEFORE deduplicating: bit_count is free in the join
        # projection, and failed candidates then never enter the distinct's
        # shuffle (the expensive step when buckets are duplication-skewed)
        .select(
            "a",
            "b",
            F.expr("bit_count(sa ^ sb)").cast("long").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()  # a surviving pair can collide in several combinations
    )


def simhash_hamming_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_bits: int = 32,
    max_hamming: int = 2,
    level: int | None = None,
    target: int = PIGEONHOLE_TARGET,
) -> DataFrame:
    """Near-dup pairs within Hamming distance ``max_hamming`` of an
    ``n_bits``-wide SimHash, without ever touching the O(n²) pair space.

    Candidate generation uses size-adaptive pigeonhole blocking (see the
    block comment above :func:`pigeonhole_level`): ``level=None`` derives the
    agreement level from the observed signature count — one O(1)-result
    count on the already-persisted signature table — so block-key width
    grows with the corpus and expected chance candidates per signature stay
    within ``target`` at any scale. The result set is level-invariant
    (completeness holds at every level), so the all-pairs oracle needs no
    blocking replay. Verification is exact: ``bit_count(xor)`` on the full
    signatures. At 100 TB the shuffle carries (doc, combo) rows — linear in
    the corpus — and each join bucket holds only combo-collisions.

    Default 32-bit signatures keep chance collisions negligible
    (P[hamming<=2] ~ 1.2e-7 per random pair), so candidates ≈ true near-dups.
    """
    # Scoped persist: the self-join below consumes the signature table twice
    # (left/right branches), and without it each branch recomputes the
    # sha256-per-word signature chain — the dominant cost of this operator.
    # The persisted table is tiny: (doc, signature) per document.
    # fan_out BEFORE the signature chain: a documents file under the scan
    # split size lands on one partition, and the sha256-per-word + n_bits
    # bit-vote fold would fill the persist single-task (guide §2).
    sig = _scoped_persist(
        fan_out(
            df.select(F.col(id_col).alias("doc"), F.col(text_col).alias("_t")),
            "doc",
        )
        .select("doc", word_hashes(F.col("_t")).alias("_hl"))
        .select("doc", simhash_from_hashes(F.col("_hl"), n_bits).alias("s"))
    )
    # level=None: hamming_pairs_from_sigs counts the persisted table once —
    # the count also warms the persist exactly once before the self-join
    return hamming_pairs_from_sigs(
        sig, "doc", "s", n_bits, max_hamming, level, target
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 2,
    threshold: float = 0.6,
    max_doc_freq: int = 50,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via an inverted-index self-join.

    Candidate generation joins docs on SHARED RARE shingles only: shingles
    with document frequency > ``max_doc_freq`` are excluded from pairing
    (a shingle appearing in k docs would emit k² candidate pairs — the
    classic quadratic blowup on stop-gram buckets). Verification then runs
    EXACT Jaccard over the full shingle sets of the candidates, so scores
    are unbiased; only pairs whose overlap is exclusively ultra-common
    shingles can be missed, and such pairs sit far below any useful
    threshold anyway. This is the standard DF-pruning trade on inverted-
    index similarity joins at corpus scale.
    """
    sh = _scoped_persist(shingle_table(df, id_col, text_col, shingle_n))
    doc_freq = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
    rare = sh.join(
        doc_freq.filter(F.col("df") <= max_doc_freq).select("sh"), "sh"
    )
    cands = (
        rare.select(F.col("doc").alias("a"), "sh")
        .join(rare.select(F.col("doc").alias("b"), "sh"), "sh")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    return jaccard_verify(cands, sh, threshold)


def containment_verify(
    candidates: DataFrame, shingles: DataFrame, threshold_pct: int = 80
) -> DataFrame:
    """Exact shingle CONTAINMENT on candidate pairs: |A∩B| / |A| (and /|B|)
    — the asymmetric near-dup measure Jaccard misses when a small document
    sits inside a much larger one (quote, excerpt, boilerplate wrapper):
    their union dwarfs the intersection, so Jaccard stays low while
    containment of the smaller side is ~1. A pair qualifies when the
    LARGER containment (= inter / min(|A|,|B|)) clears ``threshold_pct`` —
    an exact integer cross-multiplication, no float threshold."""
    sizes = shingles.groupBy("doc").agg(F.count(F.lit(1)).alias("n_sh"))
    # The shingle sides must NEVER be broadcast-built: the planner's
    # estimate for the projected (doc, sh) relation undershoots wildly once
    # the corpus grows (measured: a 2.6M-row shingle broadcast at the 10x
    # replica — minutes of build, then driver OOM). The candidate list is
    # O(near-dups) — linear in the corpus, so broadcasting IT is equally
    # wrong at scale; shuffle_hash pins both joins to keyed shuffles, which
    # is the correct 100 TB plan (co-partition on doc, then on (doc, sh)).
    # "merge" (sort-merge), not "shuffle_hash": SHJ builds a per-partition
    # hash map of the build side, which under memory pressure dies exactly
    # where SMJ spills gracefully.
    inter = (
        candidates.join(
            shingles.select(F.col("doc").alias("a"), F.col("sh").alias("sh"))
            .hint("merge"),
            "a",
        )
        .join(
            shingles.select(F.col("doc").alias("b"), F.col("sh").alias("sh"))
            .hint("merge"),
            ["b", "sh"],
        )
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(
            sizes.select(F.col("doc").alias("a"), F.col("n_sh").alias("na")), "a"
        )
        .join(
            sizes.select(F.col("doc").alias("b"), F.col("n_sh").alias("nb")), "b"
        )
        .filter(
            F.lit(100) * F.col("inter")
            >= F.lit(threshold_pct) * F.least("na", "nb")
        )
        .select(
            "a",
            "b",
            F.col("na").cast("bigint").alias("n_a"),
            F.col("nb").cast("bigint").alias("n_b"),
            F.col("inter").cast("bigint").alias("n_common"),
            (F.col("inter").cast("double") / F.col("na")).alias(
                "containment_a"
            ),
            (F.col("inter").cast("double") / F.col("nb")).alias(
                "containment_b"
            ),
        )
    )
