"""Document-level quality-rule filtering (engine extension): the
Gopher/MassiveText rule set (Rae et al. 2021, arXiv:2112.11446 Appendix A)
re-expressed over the ``documents`` table — the pass every web-scale
pre-training corpus runs between raw ingest and dedup.

Absent from the reference (API-pulled workspace rows, not web text);
first-class here per the training-data scope. The corpus has no line
structure (single-paragraph synthetic text), so the line-shape rules
(bullet/ellipsis lines) are out of domain; the six word-level rules are:

  R0 word_count        50 <= n_words <= 100000
  R1 mean_word_length  3 <= sum_len / n_words <= 10
  R2 alpha_words       >= 80% of words contain a letter (\\p{L})
  R3 stop_words        >= 2 distinct stop words present
  R4 top_2gram         most frequent 2-gram covers <= 20% of word slots
  R5 dup_3gram         duplicate-3-gram fraction <= 30%

Cross-engine determinism: every threshold compares EXACT INTEGERS (the
ratio tests are cleared of division — e.g. mean word length in [3,10] is
``3*n_words <= sum_len <= 10*n_words``), so verdicts are bit-identical on
Spark and DuckDB with no float tolerance anywhere. Gram semantics reuse the
dedup family's shingle convention (<n-word docs shingle to the whole text)
so every gram-based query in the registry tokenizes identically.

Scale shape at 100 TB: all signals are per-doc — one explode + partial
aggregation keyed on doc_id (2-gram argmax keys on (doc_id, gram) first,
both map-side combinable); the three per-doc signal tables join on doc_id
(corpus-sized, AQE-planned); the rule report collapses to ONE row before
the 7-row unpivot, so the final stage moves 7 rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
import pyspark.sql.functions as F

from ..operators.dedup import shingles_from_words, words
from ..sources.tpch import load_table
from .dedup import _WORDS_SQL
from .registry import register
from .sampling import _mix_keep_sql

# The Gopher eight plus "a" (a standard stop word — e.g. Lucene's English
# list): the synthetic corpus carries only {the, a} of the English function
# words, so the published eight alone would fail EVERY document (n_stop
# saturates at 1) and turn the rule — and the combined keep verdict — into
# a constant. With "a" the rule discriminates (~63% pass at sf0.01).
STOP_WORDS = ("the", "be", "to", "of", "and", "that", "have", "with", "a")

_RULES = (
    "word_count",
    "mean_word_length",
    "alpha_words",
    "stop_words",
    "top_2gram",
    "dup_3gram",
)


def _grams_cte(n: int, words_cte: str, out: str) -> str:
    """DuckDB twin of shingles_from_words over a (doc_id, ws) CTE — every
    occurrence (non-distinct), with the <n-word whole-text fallback."""
    gram = ", ".join(f"ws[i+{j}]" for j in range(n))
    return f"""
  {out} AS (
    SELECT doc_id,
           unnest(CASE WHEN len(ws) >= {n}
                  THEN list_transform(generate_series(1, len(ws) - {n - 1}),
                       i -> concat_ws(' ', {gram}))
                  ELSE [array_to_string(ws, ' ')] END) AS g
    FROM {words_cte}
  )
"""


_STOP_LIST_SQL = "(" + ", ".join(f"'{w}'" for w in STOP_WORDS) + ")"

# per-doc signal CTEs shared by both registered oracles
_SIGNALS_SQL = f"""
  w AS (SELECT doc_id, {_WORDS_SQL} AS ws FROM documents
        WHERE text IS NOT NULL),
  tok AS (SELECT doc_id, unnest(ws) AS word FROM w),
  stats AS (
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(length(word)) AS BIGINT) AS sum_len,
           CAST(SUM(CASE WHEN regexp_matches(word, '\\p{{L}}')
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_alpha,
           CAST(COUNT(DISTINCT CASE WHEN word IN {_STOP_LIST_SQL}
                      THEN word END) AS BIGINT) AS n_stop
    FROM tok GROUP BY 1
  ),
  {_grams_cte(2, "w", "g2")},
  m2 AS (
    SELECT doc_id, CAST(MAX(cnt) AS BIGINT) AS max2
    FROM (SELECT doc_id, g, COUNT(*) AS cnt FROM g2 GROUP BY 1, 2)
    GROUP BY 1
  ),
  {_grams_cte(3, "w", "g3")},
  d3 AS (
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS nt,
           CAST(COUNT(DISTINCT g) AS BIGINT) AS nd
    FROM g3 GROUP BY 1
  ),
  per AS (
    SELECT s.doc_id,
           (n_words BETWEEN 50 AND 100000) AS r0,
           (3 * n_words <= sum_len AND sum_len <= 10 * n_words) AS r1,
           (5 * n_alpha >= 4 * n_words) AS r2,
           (n_stop >= 2) AS r3,
           (10 * m2.max2 <= n_words) AS r4,
           (10 * (d3.nt - d3.nd) <= 3 * d3.nt) AS r5
    FROM stats s JOIN m2 USING (doc_id) JOIN d3 USING (doc_id)
  )
"""


def _per_doc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per non-NULL doc with the six rule verdicts r0..r5."""
    return rules_from_docs(
        load_table(spark, sf_dir, "documents")
    )


def rules_from_docs(docs: DataFrame) -> DataFrame:
    """Rule verdicts for any (doc_id, text) DataFrame (the operator seam —
    _per_doc_rules binds it to the sf_dir documents table)."""
    docs = docs.filter(F.col("text").isNotNull())
    ws = docs.select("doc_id", words(F.col("text")).alias("ws"))
    tok = ws.select("doc_id", F.explode("ws").alias("word"))
    stats = tok.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_words"),
        F.sum(F.length("word")).cast("bigint").alias("sum_len"),
        F.sum(F.when(F.col("word").rlike(r"\p{L}"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_alpha"),
        F.countDistinct(
            F.when(F.col("word").isin(*STOP_WORDS), F.col("word"))
        )
        .cast("bigint")
        .alias("n_stop"),
    )
    m2 = (
        ws.select(
            "doc_id", F.explode(shingles_from_words(F.col("ws"), 2)).alias("g")
        )
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("doc_id")
        .agg(F.max("cnt").cast("bigint").alias("max2"))
    )
    d3 = (
        ws.select(
            "doc_id", F.explode(shingles_from_words(F.col("ws"), 3)).alias("g")
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("nt"),
            F.countDistinct("g").cast("bigint").alias("nd"),
        )
    )
    n_words, sum_len = F.col("n_words"), F.col("sum_len")
    return (
        stats.join(m2, "doc_id")
        .join(d3, "doc_id")
        .select(
            "doc_id",
            n_words.between(50, 100000).alias("r0"),
            ((F.lit(3) * n_words <= sum_len) & (sum_len <= F.lit(10) * n_words))
            .alias("r1"),
            (F.lit(5) * F.col("n_alpha") >= F.lit(4) * n_words).alias("r2"),
            (F.col("n_stop") >= 2).alias("r3"),
            (F.lit(10) * F.col("max2") <= n_words).alias("r4"),
            (F.lit(10) * (F.col("nt") - F.col("nd")) <= F.lit(3) * F.col("nt"))
            .alias("r5"),
        )
    )


def _rule_cols() -> list[Column]:
    return [F.col(f"r{i}") for i in range(len(_RULES))]


@register(
    "gopher_quality_rules",
    "ext:docfilter,A7-ext,V3-analog",
    "Gopher/MassiveText quality-rule report (arXiv:2112.11446 A1.1): per "
    "rule, how many documents fail and the fail rate, plus an any_rule "
    "row — the go/no-go summary a corpus curation run reads first. All six "
    "thresholds are division-free exact-integer tests, so the verdicts "
    "replay bit-identically in the oracle. Signals are per-doc partial "
    "aggregations; the report collapses to ONE row before a 7-row unpivot.",
    oracle=f"""
        WITH {_SIGNALS_SQL},
        agg AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                 {", ".join(
                     f"CAST(SUM(CASE WHEN NOT r{i} THEN 1 ELSE 0 END)"
                     f" AS BIGINT) AS f{i}" for i in range(6))},
                 CAST(SUM(CASE WHEN NOT (r0 AND r1 AND r2 AND r3 AND r4
                                         AND r5)
                          THEN 1 ELSE 0 END) AS BIGINT) AS fany
          FROM per
        )
        SELECT rule, n_docs, n_fail,
               CAST(n_fail AS DOUBLE) / n_docs AS fail_rate
        FROM (
          {" UNION ALL ".join(
              f"SELECT '{r}' AS rule, n_docs, f{i} AS n_fail FROM agg"
              for i, r in enumerate(_RULES))}
          UNION ALL
          SELECT 'any_rule' AS rule, n_docs, fany AS n_fail FROM agg
        )
        ORDER BY rule
    """,
)
def gopher_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    per = _per_doc_rules(spark, sf_dir)
    rules = _rule_cols()
    agg = per.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        *[
            F.sum(F.when(~r, 1).otherwise(0)).cast("bigint").alias(f"f{i}")
            for i, r in enumerate(rules)
        ],
        F.sum(
            F.when(
                ~rules[0] | ~rules[1] | ~rules[2] | ~rules[3] | ~rules[4]
                | ~rules[5],
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("fany"),
    )
    stack_args = ", ".join(
        [f"'{r}', f{i}" for i, r in enumerate(_RULES)] + ["'any_rule', fany"]
    )
    return (
        agg.select(
            "n_docs",
            F.expr(
                f"stack({len(_RULES) + 1}, {stack_args}) AS (rule, n_fail)"
            ),
        )
        .select(
            "rule",
            "n_docs",
            "n_fail",
            (F.col("n_fail").cast("double") / F.col("n_docs")).alias(
                "fail_rate"
            ),
        )
        .orderBy("rule")
    )


@register(
    "gopher_quality_verdicts",
    "ext:docfilter,P5-analog,V3-analog",
    "Per-document Gopher-rule verdict: keep flag, number of failed rules, "
    "and the failed-rule bitmask (bit i = rule i of the documented order) — "
    "the corpus-sized output the downstream dedup/selection stages consume. "
    "Distributed orderBy on doc_id (range partitioning, never a "
    "single-partition funnel).",
    oracle=f"""
        WITH {_SIGNALS_SQL}
        SELECT doc_id,
               (r0 AND r1 AND r2 AND r3 AND r4 AND r5) AS keep,
               CAST({" + ".join(
                   f"CASE WHEN NOT r{i} THEN 1 ELSE 0 END"
                   for i in range(6))} AS BIGINT) AS n_failed,
               CAST({" + ".join(
                   f"CASE WHEN NOT r{i} THEN {1 << i} ELSE 0 END"
                   for i in range(6))} AS BIGINT) AS fail_mask
        FROM per
        ORDER BY doc_id
    """,
)
def gopher_quality_verdicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    per = _per_doc_rules(spark, sf_dir)
    rules = _rule_cols()
    keep = rules[0]
    for r in rules[1:]:
        keep = keep & r
    n_failed = sum(
        (F.when(~r, 1).otherwise(0) for r in rules), F.lit(0)
    ).cast("bigint")
    fail_mask = sum(
        (F.when(~r, 1 << i).otherwise(0) for i, r in enumerate(rules)),
        F.lit(0),
    ).cast("bigint")
    return per.select(
        "doc_id",
        keep.alias("keep"),
        n_failed.alias("n_failed"),
        fail_mask.alias("fail_mask"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# curation funnel (the whole selection pipeline in one plan)
# ---------------------------------------------------------------------------


@register(
    "curation_funnel",
    "ext:docfilter,A8-analog",
    "The corpus-curation funnel end-to-end in ONE plan: raw documents -> "
    "non-NULL text -> Gopher-rule keepers -> exact-dedup representatives "
    "(min-doc_id per content fingerprint) -> weighted source-mix survivors "
    "— one row of exact counts, the report every corpus build publishes. "
    "Proves the independently-verified gate/dedup/mix stages COMPOSE "
    "(dedup representatives carry their identity into the mix draw, so "
    "stage order is semantically load-bearing and bit-replayed by the "
    "oracle). Each stage is a filter/keyed-agg over the previous one; the "
    "five scalar counts meet in broadcast-scalar joins.",
    oracle=f"""
        WITH {_SIGNALS_SQL},
        quality AS (
          SELECT doc_id FROM per
          WHERE r0 AND r1 AND r2 AND r3 AND r4 AND r5
        ),
        q AS (
          SELECT d.doc_id, d.source,
                 sha256(regexp_replace(trim(lower(d.text)), '\\s+', ' ', 'g'))
                   AS fp
          FROM documents d JOIN quality USING (doc_id)
        ),
        k AS (SELECT fp, MIN(doc_id) AS doc_id FROM q GROUP BY 1),
        k2 AS (SELECT k.doc_id, q.source FROM k JOIN q ON k.doc_id = q.doc_id),
        m AS (SELECT * FROM k2 WHERE {_mix_keep_sql()})
        SELECT
          (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS n_raw,
          (SELECT CAST(COUNT(*) AS BIGINT) FROM documents
           WHERE text IS NOT NULL) AS n_with_text,
          (SELECT CAST(COUNT(*) AS BIGINT) FROM quality) AS n_quality_keep,
          (SELECT CAST(COUNT(*) AS BIGINT) FROM k) AS n_unique,
          (SELECT CAST(COUNT(*) AS BIGINT) FROM m) AS n_mixed
    """,
)
def curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import weighted_mix
    from ..operators.text import fingerprint
    from .sampling import MIX_WEIGHTS

    docs = load_table(spark, sf_dir, "documents")
    raw = docs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_raw"),
        F.count("text").cast("bigint").alias("n_with_text"),
    )
    per = rules_from_docs(docs)
    keep = per
    for i in range(6):
        keep = keep.filter(F.col(f"r{i}"))
    quality = keep.select("doc_id").join(
        docs.select("doc_id", "text", "source"), "doc_id"
    )
    n_quality = quality.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_quality_keep")
    )
    q = quality.select(
        "doc_id", "source", fingerprint(F.col("text")).alias("fp")
    )
    keepers = (
        q.groupBy("fp")
        .agg(F.min(F.struct("doc_id", "source")).alias("_k"))
        .select(F.col("_k.doc_id").alias("doc_id"),
                F.col("_k.source").alias("source"))
    )
    n_unique = keepers.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_unique")
    )
    n_mixed = weighted_mix(keepers, "source", "doc_id", MIX_WEIGHTS).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_mixed")
    )
    return (
        raw.crossJoin(F.broadcast(n_quality))
        .crossJoin(F.broadcast(n_unique))
        .crossJoin(F.broadcast(n_mixed))
        .select("n_raw", "n_with_text", "n_quality_keep", "n_unique",
                "n_mixed")
    )
