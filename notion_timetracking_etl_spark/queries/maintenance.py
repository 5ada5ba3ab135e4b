"""Warehouse-maintenance queries (engine extension): incremental aggregate
refresh and pre-join skew diagnostics — the two operations a 100 TB
deployment runs between ingests, absent from the reference (its wipe+reload
sink recomputes everything per run, `src/pbi/refresh.ts` semantics) but
mandatory at scale where a full recompute of a rollup over the whole fact
history costs more than the day's ingest itself.

- **Incremental refresh**: the day×type rollup is maintained as MERGEABLE
  partial aggregates (BIGINT count + DECIMAL(38,6) sum — both exactly
  re-aggregatable, unlike a stored double sum or average). A delta batch
  aggregates alone and unions into the stored partials; one re-aggregation
  touches only (group) rows, never the base fact history. The oracle
  recomputes the rollup from the FULL fact table — hash equality IS the
  proof that merge(refresh(base), delta) == recompute(base ∪ delta).
- **Skew report**: per candidate join key, the exact key-frequency profile
  (rows, NULL keys, NDV, heaviest key's row count, skew factor = heaviest /
  mean). The number every salting/AQE-skew decision starts from; at 100 TB
  this is one groupBy per key column with map-side partial counts, output
  bounded by the number of profiled keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from ..sources.tpch import load_table
from .helpers import _finite, ordered_small
from .registry import register

_CUTOVER = "2024-01-25"  # delta batch = events on/after this date


@register(
    "rollup_incremental_refresh",
    "ext:maintenance,A2-ext,S8-analog",
    "Incremental maintenance of the day×type rollup: the base segment "
    f"(events before {_CUTOVER}) is held as mergeable partials (BIGINT "
    "count + exact DECIMAL sum), the delta batch aggregates alone, and ONE "
    "re-aggregation of the unioned partials produces the refreshed rollup "
    "— the base fact history is never rescanned. The oracle recomputes "
    "from the full table, so the hash match proves merge(base, delta) == "
    "full recompute. Refresh cost is O(delta + group rows), not O(history).",
    oracle=f"""
        WITH daily AS (
          SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
                 event_type, value
          FROM events
        )
        SELECT day, event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST((CASE WHEN isfinite(CAST(value AS DOUBLE))
                              THEN value END) AS DECIMAL(38,6)))
                    AS DOUBLE) AS total_value
        FROM daily
        GROUP BY 1, 2
        ORDER BY day, event_type
    """,
)
def rollup_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day"),
        "event_type",
        "value",
    )

    def partials(df: DataFrame) -> DataFrame:
        # the stored representation: exactly mergeable partial aggregates
        return df.groupBy("day", "event_type").agg(
            F.count(F.lit(1)).cast("bigint").alias("p_cnt"),
            F.sum(_finite(F.col("value")).cast("decimal(38,6)")).alias(
                "p_sum"
            ),
        )

    # NULL-safe split: a NULL day (corrupt/NULL ts) satisfies neither
    # inequality, and a plain </>= pair would silently drop those rows from
    # BOTH segments while the full-recompute oracle keeps their NULL-day
    # group — a hash drift, not a crash. NULL days ride with the delta.
    is_delta = F.col("day").isNull() | (F.col("day") >= _CUTOVER)
    base = partials(ev.filter(~is_delta))
    delta = partials(ev.filter(is_delta))
    return ordered_small(
        base.unionByName(delta)
        .groupBy("day", "event_type")
        .agg(
            F.sum("p_cnt").cast("bigint").alias("n_events"),
            F.sum("p_sum").cast("double").alias("total_value"),
        ),
        "day",
        "event_type",
    )


# (table, key column) pairs every big fact join in the registry keys on
_SKEW_KEYS = (
    ("lineitem", "l_orderkey"),
    ("orders", "o_custkey"),
    ("events", "user_id"),
)


def _skew_profile_sql(table: str, key: str) -> str:
    # one pass: group NULL keys too, then fold totals and the non-NULL
    # profile out of the same grouped-count relation
    return f"""
        SELECT '{table}.{key}' AS rel,
               CAST(SUM(cnt) AS BIGINT) AS n_rows,
               CAST(COALESCE(SUM(cnt) FILTER (WHERE k IS NULL), 0)
                    AS BIGINT) AS n_null_keys,
               CAST(COUNT(k) AS BIGINT) AS n_keys,
               CAST(MAX(cnt) FILTER (WHERE k IS NOT NULL) AS BIGINT)
                 AS max_key_rows,
               CAST(CAST(MAX(cnt) FILTER (WHERE k IS NOT NULL) AS BIGINT)
                    * COUNT(k) AS DOUBLE)
                 / CAST(SUM(cnt) FILTER (WHERE k IS NOT NULL) AS BIGINT)
                 AS skew_factor
        FROM (SELECT {key} AS k, CAST(COUNT(*) AS BIGINT) AS cnt
              FROM {table} GROUP BY 1)
    """


@register(
    "join_skew_report",
    "ext:maintenance,A10-ext",
    "Pre-join skew diagnostic over the registry's big join keys: per key, "
    "exact row/NULL/NDV counts, the heaviest key's row count, and the skew "
    "factor (heaviest key / mean key) — the number that decides between a "
    "plain shuffle join, salting, and AQE skew handling. One map-side "
    "partial-count groupBy per key; output bounded by the profiled-key "
    "list. skew_factor is one IEEE divide of exact integers.",
    oracle=" UNION ALL ".join(
        _skew_profile_sql(t, k) for t, k in _SKEW_KEYS
    )
    + " ORDER BY rel",
)
def join_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    outs = []
    for table, key in _SKEW_KEYS:
        cnts = (
            load_table(spark, sf_dir, table)
            .groupBy(F.col(key).alias("k"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        )
        k_cnt = F.when(F.col("k").isNotNull(), F.col("cnt"))
        n_keys = F.count("k").cast("bigint")
        max_rows = F.max(k_cnt).cast("bigint")
        outs.append(
            cnts.agg(
                F.sum("cnt").cast("bigint").alias("n_rows"),
                F.coalesce(
                    F.sum(F.when(F.col("k").isNull(), F.col("cnt"))), F.lit(0)
                )
                .cast("bigint")
                .alias("n_null_keys"),
                n_keys.alias("n_keys"),
                max_rows.alias("max_key_rows"),
                (
                    (max_rows * n_keys).cast("double")
                    / F.sum(k_cnt).cast("bigint")
                ).alias("skew_factor"),
            ).select(
                F.lit(f"{table}.{key}").alias("rel"),
                "n_rows",
                "n_null_keys",
                "n_keys",
                "max_key_rows",
                "skew_factor",
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return ordered_small(out, "rel")


# ---------------------------------------------------------------------------
# ANALYZE-style column statistics
# ---------------------------------------------------------------------------

# (table, column, kind) — kind picks the cross-engine min/max rendering:
# bigint/string render as-is, double as floor-micro BIGINT (float-format
# strings differ between engines; micro units are exact), ts via the shared
# timestamp format. NDV is exact COUNT(DISTINCT); at 100 TB swap per-column
# NDVs for HLL sketches (the occupancy family shows that pattern) — the
# report shape stays identical.
_STATS_COLS = (
    ("orders", "o_orderkey", "bigint"),
    ("orders", "o_totalprice", "double"),
    ("orders", "o_orderdate", "ts"),
    ("orders", "o_orderpriority", "string"),
    ("lineitem", "l_quantity", "double"),
    ("lineitem", "l_returnflag", "string"),
    ("lineitem", "l_shipdate", "ts"),
    ("events", "user_id", "bigint"),
    ("events", "event_type", "string"),
    ("events", "value", "double"),
    ("documents", "lang", "string"),
    ("documents", "n_chars", "bigint"),
)

_TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss"
_TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S"


def _render_spark(agg_col, kind: str):
    if kind == "double":
        return F.floor(agg_col * F.lit(1000000.0)).cast("bigint").cast(
            "string"
        )
    if kind == "ts":
        return F.date_format(agg_col, _TS_FMT_SPARK)
    return agg_col.cast("string")


def _render_duck(expr: str, kind: str) -> str:
    if kind == "double":
        return f"CAST(CAST(floor(({expr}) * 1000000.0) AS BIGINT) AS VARCHAR)"
    if kind == "ts":
        return f"strftime(({expr}), '{_TS_FMT_DUCK}')"
    return f"CAST(({expr}) AS VARCHAR)"


def _stats_table_sql(table: str) -> str:
    cols = [(c, k) for t, c, k in _STATS_COLS if t == table]
    selects = []
    for c, k in cols:
        guard = f"CASE WHEN isfinite({c}) THEN {c} END" if k == "double" else c
        selects.append(f"""
        SELECT '{table}' AS tbl, '{c}' AS col, '{k}' AS dtype,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_nulls,
               CAST(COUNT(DISTINCT {c}) AS BIGINT) AS ndv,
               {_render_duck(f"MIN({guard})", k)} AS min_repr,
               {_render_duck(f"MAX({guard})", k)} AS max_repr
        FROM {table}""")
    return " UNION ALL ".join(selects)


@register(
    "catalog_column_stats",
    "ext:maintenance,A4-ext,V1-analog",
    "ANALYZE-style column statistics for the star schema's hot columns: "
    "row/NULL counts, exact NDV, and cross-engine-rendered min/max per "
    "column (doubles as floor-micro integers, timestamps via the shared "
    "format) — the statistics a cost-based optimizer and every broadcast/"
    "skew decision feed on. TWO aggregate passes per table — counts/min/max "
    "with no distinct (never sorts), and the multi-countDistinct NDVs as a "
    "pure hash-aggregate chain over the Expand — stitched by a one-row "
    "broadcast cross join (splitting keeps string min/max buffers from "
    "forcing the Expand-multiplied rows through a SortAggregate); the final "
    "unpivot moves one row per profiled column.",
    oracle=" UNION ALL ".join(
        _stats_table_sql(t) for t in ("orders", "lineitem", "events",
                                      "documents")
    )
    + " ORDER BY tbl, col",
)
def catalog_column_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    outs = []
    for table in ("orders", "lineitem", "events", "documents"):
        cols = [(c, k) for t, c, k in _STATS_COLS if t == table]
        df = load_table(spark, sf_dir, table)
        # SPLIT the per-table aggregate (same values, two cheap passes
        # instead of one pathological one): string min/max buffers are
        # immutable, which forces the WHOLE combined aggregate into
        # SortAggregate, and the multi-countDistinct adds an Expand — so
        # the old single agg SORTED rows x (n_distinct_groups + 1) per
        # table. Pass 1 (counts + min/max, no distinct) has no Expand and
        # no grouping key, so its SortAggregate never sorts; pass 2 (the
        # countDistincts alone) keeps the Expand but every buffer is a
        # long, so it runs as a hash aggregate — nothing is ever sorted.
        aggs = [F.count(F.lit(1)).cast("bigint").alias("n_rows")]
        ndv_aggs = []
        for c, k in cols:
            guarded = _finite(F.col(c)) if k == "double" else F.col(c)
            aggs += [
                (F.count(F.lit(1)) - F.count(c)).cast("bigint").alias(
                    f"nn_{c}"
                ),
                _render_spark(F.min(guarded), k).alias(f"mn_{c}"),
                _render_spark(F.max(guarded), k).alias(f"mx_{c}"),
            ]
            ndv_aggs.append(F.countDistinct(c).cast("bigint").alias(f"ndv_{c}"))
        wide = df.agg(*aggs).crossJoin(F.broadcast(df.agg(*ndv_aggs)))
        stack_args = ", ".join(
            f"'{c}', '{k}', nn_{c}, ndv_{c}, mn_{c}, mx_{c}" for c, k in cols
        )
        outs.append(
            wide.select(
                F.lit(table).alias("tbl"),
                F.col("n_rows"),
                F.expr(
                    f"stack({len(cols)}, {stack_args})"
                    " AS (col, dtype, n_nulls, ndv, min_repr, max_repr)"
                ),
            ).select(
                "tbl", "col", "dtype", "n_rows", "n_nulls", "ndv",
                "min_repr", "max_repr",
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return ordered_small(out, "tbl", "col")


# ---------------------------------------------------------------------------
# equi-depth histograms (the CBO's selectivity model)
# ---------------------------------------------------------------------------

_HIST_BUCKETS = 8
# (table, value column, unique tie-break key)
_HIST_COLS = (
    ("orders", "o_totalprice", "o_orderkey"),
    ("events", "value", "event_id"),
)


@register(
    "catalog_equidepth_histograms",
    "ext:maintenance,A4-ext,O1-analog",
    f"Equi-depth ({_HIST_BUCKETS}-bucket) histograms for the predicate-"
    "bearing measure columns — the selectivity model a cost-based optimizer "
    "uses for range predicates. Bucketing is the EXACT distributed rank "
    "(range partition + per-partition row numbers + driver-side offsets, "
    "operators/rank.py — never a single-partition window) with the "
    "closed-form NTILE rule on a TIE-FREE (value, key) order, so bucket "
    "assignment is deterministic and replays bit-identically in the "
    "oracle's window NTILE. Bounds render as floor-micro integers.",
    oracle=" UNION ALL ".join(
        f"""
        SELECT '{t}.{c}' AS rel,
               CAST(bucket AS BIGINT) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(floor(MIN({c}) * 1000000.0) AS BIGINT) AS lo_micros,
               CAST(floor(MAX({c}) * 1000000.0) AS BIGINT) AS hi_micros
        FROM (
          SELECT {c}, NTILE({_HIST_BUCKETS})
                 OVER (ORDER BY {c}, {k}) - 1 AS bucket
          FROM {t}
          WHERE {c} IS NOT NULL AND isfinite(CAST({c} AS DOUBLE))
        )
        GROUP BY bucket"""
        for t, c, k in _HIST_COLS
    )
    + " ORDER BY rel, bucket",
)
def catalog_equidepth_histograms(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.rank import ntile_from_rank, with_global_ranks

    outs = []
    for table, col, key in _HIST_COLS:
        vals = (
            load_table(spark, sf_dir, table)
            .select(F.col(col).alias("v"), F.col(key).alias("k"))
            .filter(F.col("v").isNotNull() & _finite(F.col("v")).isNotNull())
        )
        ranked, total = with_global_ranks(
            vals, [F.col("v").asc(), F.col("k").asc()]
        )
        outs.append(
            ranked.select(
                (ntile_from_rank(F.col("rn"), total, _HIST_BUCKETS) - 1)
                .cast("bigint")
                .alias("bucket"),
                "v",
            )
            .groupBy("bucket")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.floor(F.min("v") * 1000000.0).cast("bigint").alias(
                    "lo_micros"
                ),
                F.floor(F.max("v") * 1000000.0).cast("bigint").alias(
                    "hi_micros"
                ),
            )
            .select(
                F.lit(f"{table}.{col}").alias("rel"),
                "bucket",
                "n_rows",
                "lo_micros",
                "hi_micros",
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return ordered_small(out, "rel", "bucket")
