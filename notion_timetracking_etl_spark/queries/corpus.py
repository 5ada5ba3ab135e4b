"""Training-corpus preparation queries (engine extension): document
chunking with overlap, token-budget batch packing via a distributed prefix
sum, and PII-style redaction profiling — the steps between "deduped corpus"
and "tensors", expressed shuffle-minimally.

Scale notes:
- chunking is a per-row explode (map-side, no shuffle) — the chunk count per
  document is bounded by its own token count, never corpus-global state;
- batch packing is a prefix sum over a total order — implemented with the
  range-partition + driver-offset machinery (operators/rank.py), NEVER a
  no-partition window, so it survives a corpus that does not fit one task;
- redaction is pure regexp_replace column arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from ..operators.text import TOKEN_PATTERN
from ..sources.tpch import load_table
from .helpers import ordered_small
from .registry import register
from .text import _QUALITY_SCORE_SQL

CHUNK_TOKENS = 50
CHUNK_STRIDE = 40  # 10-token overlap between consecutive chunks


@register(
    "documents_chunked",
    "P2-analog,F-ext",
    "Sliding-window document chunking: each document's BPE-ish token array "
    "is cut into 50-token chunks with stride 40 (10-token overlap) — the "
    "standard long-document preparation for a fixed-context trainer. Pure "
    "per-row tokenize + sequence + explode + slice: map-side only, chunk "
    "fan-out bounded per document. O(chunks) output -> distributed orderBy.",
    oracle=f"""
        SELECT doc_id,
               CAST(k.s // {CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
               array_to_string(
                 list_slice(toks, k.s + 1, k.s + {CHUNK_TOKENS}), ' ')
                 AS chunk_text,
               CAST(len(list_slice(toks, k.s + 1, k.s + {CHUNK_TOKENS}))
                    AS BIGINT) AS n_tokens
        FROM (
          SELECT doc_id,
                 regexp_extract_all(lower(text), '{TOKEN_PATTERN}') AS toks
          FROM documents
        ) d
        CROSS JOIN LATERAL (
          SELECT unnest(range(0, greatest(len(toks), 1), {CHUNK_STRIDE})) AS s
        ) k
        WHERE len(toks) > 0
        ORDER BY doc_id, chunk_idx
    """,
)
def documents_chunked(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.regexp_extract_all(F.lower(F.col("text")), F.lit(TOKEN_PATTERN), 0)
    with_toks = docs.select("doc_id", toks.alias("toks")).filter(
        F.size("toks") > 0
    )
    # starts 0, S, 2S, ... up to the last token index (sequence is inclusive,
    # so the bound is size-1 — mirrors range(0, greatest(len,1), S))
    starts = F.explode(
        F.sequence(F.lit(0), F.size("toks") - 1, F.lit(CHUNK_STRIDE))
    ).alias("s")
    chunk = F.slice(F.col("toks"), F.col("s") + 1, CHUNK_TOKENS)
    return (
        with_toks.select("doc_id", starts, "toks")
        .select(
            "doc_id",
            (F.col("s") / CHUNK_STRIDE).cast("bigint").alias("chunk_idx"),
            F.array_join(chunk, " ").alias("chunk_text"),
            F.size(chunk).cast("bigint").alias("n_tokens"),
        )
        .orderBy("doc_id", "chunk_idx")
    )


TOKEN_BUDGET = 2000


@register(
    "corpus_token_batches",
    "W-ext-scan,A3",
    "Token-budget batch packing: documents in doc_id order are assigned to "
    "consecutive training batches of ~2000 tokens by an EXACT distributed "
    "prefix sum of per-document token counts (range-partition + driver "
    "offsets, operators/rank.py — no single-partition window), with "
    "batch_id = floor(tokens_before / budget). Per batch: document count, "
    "token total. The oracle replays the same packing with a running-sum "
    "window.",
    oracle=f"""
        WITH counted AS (
          SELECT doc_id,
                 CAST(len(regexp_extract_all(lower(text), '{TOKEN_PATTERN}'))
                      AS BIGINT) AS n_tokens
          FROM documents
        ),
        run AS (
          SELECT doc_id, n_tokens,
                 SUM(n_tokens) OVER (ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS running
          FROM counted
        )
        SELECT CAST((running - n_tokens) // {TOKEN_BUDGET} AS BIGINT)
                 AS batch_id,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS batch_tokens
        FROM run
        GROUP BY batch_id
        ORDER BY batch_id
    """,
)
def corpus_token_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.rank import with_global_prefix_sum

    docs = load_table(spark, sf_dir, "documents")
    counted = docs.select(
        "doc_id",
        F.size(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit(TOKEN_PATTERN), 0)
        ).cast("bigint").alias("n_tokens"),
    )
    run = with_global_prefix_sum(
        counted, [F.col("doc_id")], "n_tokens", out_col="running"
    )
    return ordered_small(
        run.select(
            F.floor((F.col("running") - F.col("n_tokens")) / TOKEN_BUDGET)
            .cast("bigint")
            .alias("batch_id"),
            "n_tokens",
        )
        .groupBy("batch_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("batch_tokens"),
        ),
        "batch_id",
    )


# Simple, RE2/Java-compatible redaction patterns (no lookarounds).
_REDACTIONS = (
    ("email", r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"),
    ("number", r"[0-9]{4,}"),
)


@register(
    "text_redaction_stats",
    "F-ext,A7",
    "PII-style redaction profile: per source, how many documents contain "
    "each redactable pattern (email-shaped, long digit runs), total match "
    "occurrences, and the mean character shrinkage if every match were "
    "replaced by a fixed tag — the dry-run report before a destructive "
    "scrub. Pure per-row regexp arithmetic, one tiny rollup.",
    oracle=f"""
        SELECT source,
               CAST(SUM(CASE WHEN len(regexp_extract_all(text,
                    '{_REDACTIONS[0][1]}')) > 0 THEN 1 ELSE 0 END) AS BIGINT)
                 AS docs_with_email,
               CAST(SUM(len(regexp_extract_all(text, '{_REDACTIONS[0][1]}')))
                    AS BIGINT) AS email_matches,
               CAST(SUM(CASE WHEN len(regexp_extract_all(text,
                    '{_REDACTIONS[1][1]}')) > 0 THEN 1 ELSE 0 END) AS BIGINT)
                 AS docs_with_number,
               CAST(SUM(len(regexp_extract_all(text, '{_REDACTIONS[1][1]}')))
                    AS BIGINT) AS number_matches,
               CAST(SUM(CAST(length(text) AS BIGINT)
                    - CAST(length(regexp_replace(regexp_replace(text,
                        '{_REDACTIONS[0][1]}', '<X>', 'g'),
                        '{_REDACTIONS[1][1]}', '<X>', 'g')) AS BIGINT))
                    AS BIGINT) AS chars_removed
        FROM documents
        GROUP BY source
        ORDER BY source
    """,
)
def text_redaction_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    email_n = F.regexp_count(t, F.lit(_REDACTIONS[0][1]))
    number_n = F.regexp_count(t, F.lit(_REDACTIONS[1][1]))
    redacted = F.regexp_replace(
        F.regexp_replace(t, _REDACTIONS[0][1], "<X>"),
        _REDACTIONS[1][1],
        "<X>",
    )
    return ordered_small(
        docs.select(
            "source",
            email_n.alias("e"),
            number_n.alias("d"),
            (F.length(t).cast("bigint") - F.length(redacted).cast("bigint"))
            .alias("removed"),
        )
        .groupBy("source")
        .agg(
            F.sum(F.when(F.col("e") > 0, 1).otherwise(0)).cast("bigint")
            .alias("docs_with_email"),
            F.sum("e").cast("bigint").alias("email_matches"),
            F.sum(F.when(F.col("d") > 0, 1).otherwise(0)).cast("bigint")
            .alias("docs_with_number"),
            F.sum("d").cast("bigint").alias("number_matches"),
            F.sum("removed").cast("bigint").alias("chars_removed"),
        ),
        "source",
    )


@register(
    "corpus_prep_pipeline",
    "ext:pipeline,P5-analog,A6,P2-analog,W-ext-scan",
    "The END-TO-END corpus preparation path in ONE plan — quality gate "
    "(score >= 0.5) -> exact dedup (keep min doc per content sha, text "
    "carried through a struct-MIN so no join-back) -> 50-token/stride-40 "
    "chunking -> token-budget batch packing via the exact distributed "
    "prefix sum. Proves the independently-verified stages COMPOSE: one "
    "registered query, one oracle replaying all four stages. Per batch: "
    "chunk count, distinct docs, token total.",
    oracle=f"""
        WITH kept AS (
          SELECT doc_id, text FROM documents
          WHERE ({_QUALITY_SCORE_SQL}) >= 0.5
        ),
        ded AS (
          SELECT min(doc_id) AS doc_id FROM kept GROUP BY sha256(text)
        ),
        dd AS (
          SELECT k.doc_id, k.text FROM kept k JOIN ded USING (doc_id)
        ),
        tk AS (
          SELECT doc_id,
                 regexp_extract_all(lower(text), '{TOKEN_PATTERN}') AS toks
          FROM dd
        ),
        chunks AS (
          SELECT doc_id,
                 CAST(k.s // {CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
                 CAST(len(list_slice(toks, k.s + 1, k.s + {CHUNK_TOKENS}))
                      AS BIGINT) AS n_tokens
          FROM tk
          CROSS JOIN LATERAL (
            SELECT unnest(range(0, greatest(len(toks), 1), {CHUNK_STRIDE}))
              AS s
          ) k
          WHERE len(toks) > 0
        ),
        run AS (
          SELECT doc_id, n_tokens,
                 SUM(n_tokens) OVER (ORDER BY doc_id, chunk_idx
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS running
          FROM chunks
        )
        SELECT CAST((running - n_tokens) // {TOKEN_BUDGET} AS BIGINT)
                 AS batch_id,
               CAST(COUNT(*) AS BIGINT) AS n_chunks,
               CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS batch_tokens
        FROM run
        GROUP BY batch_id
        ORDER BY batch_id
    """,
)
def corpus_prep_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.rank import with_global_prefix_sum
    from ..operators.text import quality_score

    docs = load_table(spark, sf_dir, "documents")
    kept = docs.filter(quality_score(F.col("text")) >= 0.5)
    # exact dedup keeping the min-id doc WITH its text: MIN over a
    # (doc_id, text) struct — the content rides the aggregation, so no
    # second shuffle to join the text back (texts in a sha group are
    # identical, so min-by-doc_id picks the same content)
    surv = (
        kept.select(
            F.sha2(F.col("text"), 256).alias("sha"),
            F.struct("doc_id", "text").alias("s"),
        )
        .groupBy("sha")
        .agg(F.min("s").alias("s"))
        .select(F.col("s.doc_id").alias("doc_id"), F.col("s.text").alias("text"))
    )
    toks = F.regexp_extract_all(F.lower(F.col("text")), F.lit(TOKEN_PATTERN), 0)
    with_toks = surv.select("doc_id", toks.alias("toks")).filter(
        F.size("toks") > 0
    )
    chunk = F.slice(F.col("toks"), F.col("s") + 1, CHUNK_TOKENS)
    chunks = with_toks.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.size("toks") - 1, F.lit(CHUNK_STRIDE))
        ).alias("s"),
        "toks",
    ).select(
        "doc_id",
        (F.col("s") / CHUNK_STRIDE).cast("bigint").alias("chunk_idx"),
        F.size(chunk).cast("bigint").alias("n_tokens"),
    )
    run = with_global_prefix_sum(
        chunks, [F.col("doc_id"), F.col("chunk_idx")], "n_tokens", "running"
    )
    return (
        run.groupBy(
            ((F.col("running") - F.col("n_tokens")) / TOKEN_BUDGET)
            .cast("bigint")
            .alias("batch_id")
        )
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.sum("n_tokens").alias("batch_tokens"),
        )
        .orderBy("batch_id")
    )


SOURCE_CAP = 15  # max documents retained per source (domain capping)

# Shared by corpus_source_cap and its streaming twin
# (queries/streaming.py::streaming_source_cap): the stream-merged kept set
# is IDENTICAL to the batch kept set (top-k by a total order is a monoid),
# so one oracle serves both.
_SOURCE_CAP_ORACLE_SQL = f"""
        WITH q AS (
          SELECT doc_id, source, n_chars,
                 CAST(COALESCE(floor(({_QUALITY_SCORE_SQL}) * 1000000.0), 0)
                      AS BIGINT) AS q_micro
          FROM documents
        ),
        ranked AS (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY source
                        ORDER BY q_micro DESC, doc_id) AS rn
          FROM q
        ),
        kept AS (
          SELECT source,
                 CAST(COUNT(*) AS BIGINT) AS n_kept,
                 CAST(SUM(n_chars) AS BIGINT) AS kept_bytes,
                 CAST(MIN(q_micro) AS BIGINT) AS threshold_q_micro
          FROM ranked WHERE rn <= {SOURCE_CAP} GROUP BY source
        ),
        tot AS (
          SELECT source,
                 CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(SUM(n_chars) AS BIGINT) AS total_bytes
          FROM q GROUP BY source
        )
        SELECT t.source, t.n_docs, k.n_kept,
               CAST(t.n_docs - k.n_kept AS BIGINT) AS n_dropped,
               k.kept_bytes,
               CAST(t.total_bytes - k.kept_bytes AS BIGINT) AS dropped_bytes,
               k.threshold_q_micro
        FROM tot t JOIN kept k USING (source)
        ORDER BY source
    """


@register(
    "corpus_source_cap",
    "A3-analog,O3-analog,F-ext",
    f"Per-source frequency capping (domain capping): each source keeps at "
    f"most {SOURCE_CAP} documents, retained by quality (integer-micro "
    "quality desc, doc_id tiebreak), and the audit reports what the cap "
    "removes per source — the standard guard against a single crawl domain "
    "dominating a training mix. The top-k per source is ONE window "
    "row_number whose `rn <= cap` filter Spark rewrites into a map-side "
    "WindowGroupLimit (each task pre-prunes to k rows per source before "
    "the exchange), so the shuffle carries O(sources x cap) rows, not the "
    "corpus — no salting needed even for a skewed mega-domain. Output is "
    "one row per source (bounded).",
    oracle=_SOURCE_CAP_ORACLE_SQL,
)
def corpus_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..operators.text import quality_score

    docs = load_table(spark, sf_dir, "documents")
    q = docs.select(
        "doc_id",
        "source",
        "n_chars",
        # NULL text scores 0 (worst) on BOTH engines — clusters.py convention
        F.coalesce(
            F.floor(quality_score(F.col("text")) * 1000000.0), F.lit(0)
        )
        .cast("bigint")
        .alias("q_micro"),
    )
    w = Window.partitionBy("source").orderBy(
        F.col("q_micro").desc(), F.col("doc_id").asc()
    )
    kept = (
        q.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= SOURCE_CAP)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_kept"),
            F.sum("n_chars").cast("bigint").alias("kept_bytes"),
            # the cap threshold: quality of the worst retained document —
            # everything below it was dropped
            F.min("q_micro").cast("bigint").alias("threshold_q_micro"),
        )
    )
    tot = q.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_bytes"),
    )
    # one row per SOURCE — a cardinality that grows with the corpus (real
    # crawls have millions of domains), so the deterministic ordering is a
    # distributed range sort, never the repartition(1) funnel
    return (
        tot.join(kept, "source")
        .select(
            "source",
            "n_docs",
            "n_kept",
            (F.col("n_docs") - F.col("n_kept")).cast("bigint")
            .alias("n_dropped"),
            "kept_bytes",
            (F.col("total_bytes") - F.col("kept_bytes")).cast("bigint")
            .alias("dropped_bytes"),
            "threshold_q_micro",
        )
        .orderBy("source")
    )
