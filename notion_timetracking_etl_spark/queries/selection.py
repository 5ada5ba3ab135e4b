"""Registered data-selection queries (engine extension): DSIR importance
scoring, BM25 retrieval, a Bloom-filter dedup prefilter, and BPE merge-pair
counting over ``documents``.

The selection layer of a training-data pipeline — what to KEEP (DSIR:
documents that look like a target domain), what to FIND (BM25: documents that
answer a query), what to SKIP (Bloom: incoming keys that cannot be duplicates
never pay the dedup join), and what a tokenizer should learn (BPE: the
highest-yield symbol merges). Absent from the reference (API-pulled workspace
rows, not web text); first-class here per BASELINE.json's training-data scope.

Every score obeys the no-libm rule (see operators/selection.py): probability
ratios are single IEEE divides of exactly-computed integers, rational idf
replaces log idf, and per-document means go through floor-to-micro fixed
point — so the DuckDB oracles replay the EXACT selections, not statistics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from ..operators.selection import (
    BLOOM_K,
    BLOOM_M_BITS,
    BPE_MERGES_SF01,
    DSIR_BUCKETS,
    adjacent_pair_counts,
    bloom_build,
    bloom_probe,
    bpe_encode_sql,
    bpe_symbols_duck,
    bpe_symbols_spark,
    chars_vocab,
    dsir_bucket_weights,
    hashed_bigram_features,
    word_frequency_table,
)
from ..operators.text import fingerprint, word_count
from ..sources.tpch import load_table
from .helpers import davg_floor_micros, davg_floor_micros_sql, ordered_small
from .registry import register
from .text import _FINGERPRINT_SQL

_TOKS_SQL = r"regexp_split_to_array(trim(lower(text)), '\s+')"


def _h64_sql(prefix: str, expr: str) -> str:
    """DuckDB twin of operators.dedup.hash64."""
    return (
        f"CAST(concat('0x', substr(sha256(concat('{prefix}', {expr})), 1, 8))"
        " AS BIGINT)"
    )


# ---------------------------------------------------------------------------
# DSIR
# ---------------------------------------------------------------------------

_DSIR_TOP = 100


@register(
    "dsir_importance_scores",
    "ext:selection,A3-ext,J1-ext",
    "DSIR-style data selection (arXiv:2302.03169): hashed-bigram importance "
    "scores against an English-document target distribution, log-free — each "
    "per-feature weight is ONE IEEE divide of exact Laplace-smoothed integer "
    f"products, per-doc mean in floor-micro fixed point; top {_DSIR_TOP} docs. "
    "Feature counts collapse to 4096 bucket rows (broadcast back); the only "
    "corpus-sized shuffle is the per-doc mean on doc_id.",
    oracle=f"""
        WITH toks AS (
          SELECT doc_id, {_TOKS_SQL} AS ws
          FROM documents WHERE text IS NOT NULL
        ),
        feats AS (
          SELECT doc_id,
                 {_h64_sql("dsir|", "ws[i] || ' ' || ws[i + 1]")}
                   % {DSIR_BUCKETS} AS bucket
          FROM toks, unnest(generate_series(1, len(ws) - 1)) AS t(i)
        ),
        raw AS (SELECT bucket, COUNT(*) AS cr FROM feats GROUP BY 1),
        tgt AS (
          SELECT bucket, COUNT(*) AS ct
          FROM feats JOIN documents USING (doc_id)
          WHERE lang = 'en' GROUP BY 1
        ),
        per AS (
          SELECT raw.bucket, COALESCE(tgt.ct, 0) AS ct, raw.cr
          FROM raw LEFT JOIN tgt ON raw.bucket = tgt.bucket
        ),
        tot AS (SELECT SUM(ct) AS tt, SUM(cr) AS tr FROM per),
        wts AS (
          SELECT bucket,
                 CAST(CAST(ct + 1 AS HUGEINT) * (tr + {DSIR_BUCKETS})
                      AS DOUBLE)
                 / CAST(CAST(cr + 1 AS HUGEINT) * (tt + {DSIR_BUCKETS})
                        AS DOUBLE) AS weight
          FROM per, tot
        ),
        scored AS (
          SELECT doc_id, {davg_floor_micros_sql("weight", "score")}
          FROM feats JOIN wts USING (bucket)
          GROUP BY doc_id
        )
        SELECT s.doc_id, d.lang, d.source, s.score
        FROM scored s JOIN documents d USING (doc_id)
        ORDER BY s.score DESC, s.doc_id
        LIMIT {_DSIR_TOP}
    """,
)
def dsir_importance_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("text").isNotNull())
    feats = hashed_bigram_features(corpus, "text", "doc_id")
    target = corpus.filter(F.col("lang") == "en").select("doc_id")
    wts = dsir_bucket_weights(feats, target, "doc_id")
    scored = (
        feats.join(F.broadcast(wts), "bucket")
        .groupBy("doc_id")
        .agg(davg_floor_micros(F.col("weight")).alias("score"))
    )
    return (
        scored.join(docs.select("doc_id", "lang", "source"), "doc_id")
        .select("doc_id", "lang", "source", "score")
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(_DSIR_TOP)
    )


# ---------------------------------------------------------------------------
# BM25
# ---------------------------------------------------------------------------

_BM25_TERMS = ("spark", "vector", "stream", "merge")
_BM25_TOP = 20
_BM25_K1 = "1.2"
_BM25_B_DL = "0.75"  # b
_BM25_B_C = "0.25"  # 1 - b


@register(
    "bm25_doc_ranking",
    "ext:selection,A3-ext,O3-ext",
    f"BM25 ranked retrieval for the query {' '.join(_BM25_TERMS)!r}: rational "
    "idf (N-df+.5)/(df+.5) — the log-free monotone twin of Robertson idf — "
    "and k1=1.2, b=0.75 length normalization; per-term scores floor to micro "
    f"units and SUM exactly per doc; top {_BM25_TOP}. The postings build "
    "filters to the query's terms map-side, immediately after tokenization "
    "and BEFORE any shuffle, so the shuffled stream is query-sized, never "
    "corpus-sized; N/avgdl ride one broadcast row.",
    oracle=f"""
        WITH corpus AS (
          SELECT doc_id, lang, source,
                 CAST(len({_TOKS_SQL}) AS BIGINT) AS dl
          FROM documents WHERE text IS NOT NULL
        ),
        stats AS (
          SELECT COUNT(*) AS n, CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
          FROM corpus
        ),
        toks AS (
          SELECT doc_id, unnest({_TOKS_SQL}) AS term
          FROM documents WHERE text IS NOT NULL
        ),
        tf AS (
          SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
          FROM toks
          WHERE term IN {str(tuple(_BM25_TERMS))}
          GROUP BY 1, 2
        ),
        dfreq AS (
          SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
          FROM tf GROUP BY 1
        ),
        per_term AS (
          SELECT tf.doc_id,
                 CAST(floor(
                   (CAST(2 * stats.n - 2 * dfreq.df + 1 AS DOUBLE)
                    / CAST(2 * dfreq.df + 1 AS DOUBLE))
                   * ((CAST(tf.tf AS DOUBLE) * 2.2)
                      / (CAST(tf.tf AS DOUBLE)
                         + ({_BM25_K1} * ({_BM25_B_C}
                            + (({_BM25_B_DL} * CAST(corpus.dl AS DOUBLE))
                               / stats.avgdl)))))
                   * 1000000.0) AS BIGINT) AS s_micros
          FROM tf
          JOIN dfreq USING (term)
          JOIN corpus ON tf.doc_id = corpus.doc_id
          CROSS JOIN stats
        )
        SELECT p.doc_id, c.lang, c.source,
               CAST(COUNT(*) AS BIGINT) AS matched_terms,
               CAST(SUM(p.s_micros) AS DOUBLE) / 1000000.0 AS score
        FROM per_term p JOIN corpus c USING (doc_id)
        GROUP BY 1, 2, 3
        ORDER BY score DESC, p.doc_id
        LIMIT {_BM25_TOP}
    """,
)
def bm25_doc_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    corpus = docs.select(
        "doc_id", "lang", "source",
        word_count(F.col("text")).cast("bigint").alias("dl"),
    )
    stats = corpus.agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    toks = docs.select(
        "doc_id",
        F.explode(
            F.split(F.trim(F.lower(F.col("text"))), r"\s+")
        ).alias("term"),
    )
    tf = (
        toks.filter(F.col("term").isin(*_BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(
        F.countDistinct("doc_id").cast("bigint").alias("df")
    )
    tfd = F.col("tf").cast("double")
    dld = F.col("dl").cast("double")
    idf = (
        (F.lit(2) * F.col("n") - F.lit(2) * F.col("df") + F.lit(1))
        .cast("double")
        / (F.lit(2) * F.col("df") + F.lit(1)).cast("double")
    )
    s = idf * (
        (tfd * F.lit(2.2))
        / (
            tfd
            + (
                F.lit(1.2)
                * (F.lit(0.25) + ((F.lit(0.75) * dld) / F.col("avgdl")))
            )
        )
    )
    per_term = (
        tf.join(F.broadcast(dfreq), "term")
        .join(corpus.select("doc_id", "dl"), "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.floor(s * F.lit(1000000.0)).cast("bigint").alias("s_micros"),
        )
    )
    return (
        per_term.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("matched_terms"),
            (F.sum("s_micros").cast("double") / F.lit(1000000.0)).alias(
                "score"
            ),
        )
        .join(corpus.select("doc_id", "lang", "source"), "doc_id")
        .select("doc_id", "lang", "source", "matched_terms", "score")
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(_BM25_TOP)
    )


# ---------------------------------------------------------------------------
# Bloom prefilter
# ---------------------------------------------------------------------------


@register(
    "dedup_bloom_prefilter",
    "ext:selection,A6-ext,J8-analog",
    "Bloom-filter dedup prefilter for incremental ingest: the corpus "
    "(doc_id % 10 != 0) lights k=4 sha256-derived bit positions per content "
    f"fingerprint in an m=2^20 space; the arriving batch (doc_id %% 10 == 0) "
    "passes iff ALL its positions are lit — only candidates pay the exact "
    "dedup join. One summary row: batch size, candidates, true duplicates, "
    "false positives (with the FP ratio the m/k sizing predicts), and the "
    "structurally-impossible false-negative count as a visible zero "
    "invariant. The position set is bounded by min(k*n, m) rows and "
    "broadcasts; the corpus is scanned once, never per batch.",
    oracle=f"""
        WITH keyed AS (
          SELECT doc_id, {_FINGERPRINT_SQL} AS fp
          FROM documents WHERE text IS NOT NULL
        ),
        corpus AS (SELECT * FROM keyed WHERE doc_id % 10 != 0),
        batch AS (SELECT * FROM keyed WHERE doc_id % 10 = 0),
        bloom AS (
          SELECT DISTINCT unnest([
            {", ".join(_h64_sql(f"bloom{i}|", "fp") + f" % {BLOOM_M_BITS}" for i in range(BLOOM_K))}
          ]) AS pos
          FROM corpus
        ),
        probes AS (
          SELECT doc_id, fp, unnest([
            {", ".join(_h64_sql(f"bloom{i}|", "fp") + f" % {BLOOM_M_BITS}" for i in range(BLOOM_K))}
          ]) AS pos
          FROM batch
        ),
        hits AS (
          SELECT p.doc_id, CAST(COUNT(b.pos) AS BIGINT) AS h
          FROM probes p LEFT JOIN bloom b ON p.pos = b.pos
          GROUP BY 1
        ),
        flagged AS (
          SELECT batch.doc_id,
                 (hits.h = {BLOOM_K}) AS bloom_pass,
                 EXISTS (SELECT 1 FROM corpus c WHERE c.fp = batch.fp)
                   AS is_dup
          FROM batch JOIN hits USING (doc_id)
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_batch,
               CAST(SUM(CASE WHEN bloom_pass THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_candidates,
               CAST(SUM(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_true_dup,
               CAST(SUM(CASE WHEN bloom_pass AND NOT is_dup THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_false_pos,
               CAST(SUM(CASE WHEN is_dup AND NOT bloom_pass THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_false_neg,
               CASE WHEN SUM(CASE WHEN is_dup THEN 0 ELSE 1 END) = 0 THEN 0.0
                    ELSE CAST(SUM(CASE WHEN bloom_pass AND NOT is_dup
                                       THEN 1 ELSE 0 END) AS DOUBLE)
                         / SUM(CASE WHEN is_dup THEN 0 ELSE 1 END)
               END AS fp_ratio
        FROM flagged
    """,
)
def dedup_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    keyed = docs.select("doc_id", fingerprint(F.col("text")).alias("fp"))
    corpus = keyed.filter(F.col("doc_id") % 10 != 0)
    batch = keyed.filter(F.col("doc_id") % 10 == 0)
    bloom = bloom_build(corpus, "fp")
    probed = bloom_probe(batch, bloom, "fp")
    truth = (
        probed.join(
            corpus.select(F.col("fp").alias("fp"))
            .distinct()
            .withColumn("_in_corpus", F.lit(True)),
            "fp",
            "left",
        )
        .withColumn("is_dup", F.coalesce(F.col("_in_corpus"), F.lit(False)))
    )
    bp = F.col("bloom_pass")
    dup = F.col("is_dup")
    non_dup = F.sum(F.when(dup, 0).otherwise(1))
    fp_cnt = F.sum(F.when(bp & ~dup, 1).otherwise(0))
    return truth.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_batch"),
        F.sum(F.when(bp, 1).otherwise(0)).cast("bigint").alias("n_candidates"),
        F.sum(F.when(dup, 1).otherwise(0)).cast("bigint").alias("n_true_dup"),
        fp_cnt.cast("bigint").alias("n_false_pos"),
        F.sum(F.when(dup & ~bp, 1).otherwise(0))
        .cast("bigint")
        .alias("n_false_neg"),
        F.when(non_dup == 0, F.lit(0.0))
        .otherwise(fp_cnt.cast("double") / non_dup)
        .alias("fp_ratio"),
    )


# ---------------------------------------------------------------------------
# BPE merge-pair counting
# ---------------------------------------------------------------------------

_BPE_TOP = 50


@register(
    "bpe_merge_candidates",
    "ext:selection,A7-ext",
    "The first BPE tokenizer-training step (arXiv:1508.07909): adjacent "
    "character-pair counts over the WORD-FREQUENCY table (Zipf-bounded, "
    "built from one corpus scan — merge iterations never rescan the corpus), "
    f"top {_BPE_TOP} merge candidates. The iterative fit (operators/"
    "selection.py::bpe_fit) replays this aggregate per merge round and is "
    "pinned against a pure-Python reference in tests/test_selection.py.",
    oracle=f"""
        WITH w AS (
          SELECT unnest({_TOKS_SQL}) AS word
          FROM documents WHERE text IS NOT NULL
        ),
        freq AS (SELECT word, COUNT(*) AS cnt FROM w GROUP BY 1),
        pairs AS (
          SELECT substr(word, i, 1) || ' ' || substr(word, i + 1, 1) AS pair,
                 cnt
          FROM freq, unnest(generate_series(1, length(word) - 1)) AS t(i)
        )
        SELECT pair, CAST(SUM(cnt) AS BIGINT) AS pair_count
        FROM pairs GROUP BY 1
        ORDER BY pair_count DESC, pair
        LIMIT {_BPE_TOP}
    """,
)
def bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    freq = word_frequency_table(docs, "text")
    return (
        adjacent_pair_counts(chars_vocab(freq))
        .orderBy(F.col("pair_count").desc(), F.col("pair").asc())
        .limit(_BPE_TOP)
    )


# ---------------------------------------------------------------------------
# BPE encode (apply the committed tokenizer model)
# ---------------------------------------------------------------------------

_ENC_SPARK = bpe_encode_sql(bpe_symbols_spark("word"))
_ENC_DUCK = bpe_encode_sql(bpe_symbols_duck("word"))
_NTOK_SPARK = f"cast(size(split(trim({_ENC_SPARK}), '  ')) as bigint)"
_NTOK_DUCK = f"CAST(len(string_split(trim({_ENC_DUCK}), '  ')) AS BIGINT)"


@register(
    "bpe_encode_fertility",
    "ext:selection,A3-ext",
    f"Apply the COMMITTED {len(BPE_MERGES_SF01)}-merge BPE model "
    "(operators/selection.py BPE_MERGES_SF01, learned by bpe_fit and "
    "re-derived from the corpus in tests) and report per-source tokenizer "
    "fertility: words, tokens, tokens-per-word, chars-per-token. Encoding "
    "is a chain of plain `replace` scans over the space-encoded symbol "
    "string — one SQL expression, NO UDF, valid verbatim on both engines — "
    "and runs over the per-source WORD-FREQUENCY table (Zipf-bounded), so "
    "the corpus is scanned once and merges never touch doc-sized data.",
    oracle=f"""
        WITH w AS (
          SELECT source, unnest({_TOKS_SQL}) AS word
          FROM documents WHERE text IS NOT NULL
        ),
        f AS (
          SELECT source, word, CAST(COUNT(*) AS BIGINT) AS cnt
          FROM w GROUP BY 1, 2
        ),
        e AS (SELECT source, word, cnt, {_NTOK_DUCK} AS n_toks FROM f)
        SELECT source,
               CAST(SUM(cnt) AS BIGINT) AS n_words,
               CAST(SUM(cnt * n_toks) AS BIGINT) AS n_tokens,
               CAST(CAST(SUM(cnt * n_toks) AS BIGINT) AS DOUBLE)
                 / CAST(SUM(cnt) AS BIGINT) AS fertility,
               CAST(CAST(SUM(cnt * length(word)) AS BIGINT) AS DOUBLE)
                 / CAST(SUM(cnt * n_toks) AS BIGINT) AS chars_per_token
        FROM e
        GROUP BY source
        ORDER BY source
    """,
)
def bpe_encode_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    freq = (
        docs.select(
            "source",
            F.explode(
                F.split(F.trim(F.lower(F.col("text"))), r"\s+")
            ).alias("word"),
        )
        .groupBy("source", "word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    enc = freq.withColumn("n_toks", F.expr(_NTOK_SPARK))
    return (
        enc.groupBy("source")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_words"),
            F.sum(F.col("cnt") * F.col("n_toks"))
            .cast("bigint")
            .alias("n_tokens"),
            (
                F.sum(F.col("cnt") * F.col("n_toks")).cast("bigint")
                .cast("double")
                / F.sum("cnt").cast("bigint")
            ).alias("fertility"),
            (
                F.sum(F.col("cnt") * F.length("word")).cast("bigint")
                .cast("double")
                / F.sum(F.col("cnt") * F.col("n_toks")).cast("bigint")
            ).alias("chars_per_token"),
        )
        .orderBy("source")
    )


_BPE_VOCAB_TOP = 30


@register(
    "bpe_token_vocabulary",
    "ext:selection,A7-ext",
    f"Realized token vocabulary of the committed BPE model: encode the "
    "word-frequency table through the replace-chain and count occurrences "
    f"per emitted token; top {_BPE_VOCAB_TOP} by count. Shows the learned "
    "merges surfacing as whole-word tokens ('spark', 'window', 'table') "
    "while rare words stay character-split. The explode is over the "
    "Zipf-bounded vocab, never the corpus.",
    oracle=f"""
        WITH w AS (
          SELECT unnest({_TOKS_SQL}) AS word
          FROM documents WHERE text IS NOT NULL
        ),
        f AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt FROM w GROUP BY 1),
        e AS (
          SELECT cnt,
                 unnest(string_split(trim({_ENC_DUCK}), '  ')) AS token
          FROM f
        )
        SELECT token, CAST(SUM(cnt) AS BIGINT) AS n_occurrences
        FROM e
        GROUP BY token
        ORDER BY n_occurrences DESC, token
        LIMIT {_BPE_VOCAB_TOP}
    """,
)
def bpe_token_vocabulary(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    freq = word_frequency_table(docs, "text")
    return (
        freq.select(
            "cnt",
            F.explode(F.expr(f"split(trim({_ENC_SPARK}), '  ')")).alias(
                "token"
            ),
        )
        .groupBy("token")
        .agg(F.sum("cnt").cast("bigint").alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), F.col("token").asc())
        .limit(_BPE_VOCAB_TOP)
    )
