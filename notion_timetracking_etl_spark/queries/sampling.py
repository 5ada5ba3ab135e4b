"""Registered corpus-sampling queries (engine extension): deterministic
stratified capping and weighted multi-source mixing over ``documents``.

Both selections are hash-ordered (``operators.sampling``), so the DuckDB
oracle replays the EXACT row selection — not just statistics — via the same
``md5`` draws.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from ..operators.sampling import (
    hash_draw,
    topk_per_group,
    weight_threshold_hex,
    weighted_mix,
)
from ..sources.tpch import load_table
from .helpers import ordered_small
from .registry import register

STRATUM_CAP = 20

# a mixing recipe: crawl sources at full/three-quarter/half/quarter/decimated
# rates; every source not named is dropped (weight 0)
MIX_WEIGHTS = {
    "src0": 1.0,
    "src1": 0.75,
    "src2": 0.5,
    "src3": 0.25,
    "src4": 0.1,
    "src5": 0.05,
}


def _mix_keep_sql() -> str:
    """The keep-predicate as SQL — same 8-hex-digit threshold compare."""
    cases = []
    for source, weight in MIX_WEIGHTS.items():
        thresh = weight_threshold_hex(weight)
        cond = (
            "TRUE"
            if thresh is None
            else f"substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '{thresh}'"
        )
        cases.append(f"WHEN source = '{source}' THEN {cond}")
    return "CASE " + " ".join(cases) + " ELSE FALSE END"


@register(
    "sample_stratified",
    "O3-ext,A7-ext",
    "Deterministic stratified sampling: cap every language stratum at "
    f"{STRATUM_CAP} documents chosen by md5 hash order — the class-balancing "
    "step of a training-corpus build, exactly reproducible across runs, "
    "partitionings and engines. Spark side uses the salted two-phase "
    "topk_per_group (skew-proof: a 90%%-one-language crawl never lands one "
    "stratum in one task); the oracle replays the selection with a plain "
    "window over the same md5 draws.",
    oracle=f"""
        SELECT doc_id, lang, CAST(rn AS BIGINT) AS sample_rank
        FROM (
          SELECT doc_id, lang,
                 row_number() OVER (
                   PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                 ) AS rn
          FROM documents
        )
        WHERE rn <= {STRATUM_CAP}
        ORDER BY lang, sample_rank
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sampled = topk_per_group(
        docs.select("doc_id", "lang", hash_draw(F.col("doc_id")).alias("_draw")),
        ["lang"],
        [F.col("_draw"), F.col("doc_id")],
        STRATUM_CAP,
        rank_col="sample_rank",
    )
    # bounded output: ≤ cap × |languages| rows regardless of corpus size
    return ordered_small(
        sampled.select(
            "doc_id", "lang", F.col("sample_rank").cast("bigint")
        ),
        "lang",
        "sample_rank",
    )


@register(
    "sample_weighted_mix",
    "P-ext,A7-ext",
    "Weighted multi-source mixing: keep each document iff its uniform md5 "
    "draw falls under its source's sampling weight (full/0.75/0.5/0.25/0.1/"
    "0.05; unlisted sources dropped) — the interleave-datasets-by-weight "
    "recipe of corpus assembly as ONE map-side filter, no shuffle, no RNG "
    "state. Output: per-source kept-count plus doc_id/n_chars checksums "
    "pinning the exact kept set.",
    oracle=f"""
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_kept,
               CAST(sum(doc_id) AS BIGINT) AS doc_id_checksum,
               CAST(sum(n_chars) AS BIGINT) AS chars_kept
        FROM documents
        WHERE {_mix_keep_sql()}
        GROUP BY source
        ORDER BY source
    """,
)
def sample_weighted_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    kept = weighted_mix(docs, "source", "doc_id", MIX_WEIGHTS)
    return ordered_small(
        kept.groupBy("source").agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("doc_id").cast("bigint").alias("doc_id_checksum"),
            F.sum("n_chars").cast("bigint").alias("chars_kept"),
        ),
        "source",
    )


# canonical held-out split: 90/5/5 by disjoint md5 hash ranges
SPLIT_BOUNDS = (("train", 0.90), ("val", 0.95))  # remainder = test


def _split_case_sql() -> str:
    t1 = weight_threshold_hex(SPLIT_BOUNDS[0][1])
    t2 = weight_threshold_hex(SPLIT_BOUNDS[1][1])
    return (
        "CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)"
        f" < '{t1}' THEN 'train'"
        " WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)"
        f" < '{t2}' THEN 'val' ELSE 'test' END"
    )


@register(
    "sample_corpus_split",
    "P-ext,A7-ext",
    "Deterministic train/val/test assignment (90/5/5): each document's "
    "split is a pure function of md5(doc_id) against disjoint hash ranges "
    "— the canonical held-out split that stays stable as the corpus grows "
    "(new docs never reshuffle old assignments, unlike randomSplit whose "
    "outcome depends on partitioning). Map-side only; output pins per-split "
    "counts and checksums of the exact membership.",
    oracle=f"""
        SELECT {_split_case_sql()} AS split,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(doc_id) AS BIGINT) AS doc_id_checksum,
               CAST(sum(n_chars) AS BIGINT) AS chars_total
        FROM documents
        GROUP BY split
        ORDER BY split
    """,
)
def sample_corpus_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    draw = F.substring(hash_draw(F.col("doc_id")), 1, 8)
    split = (
        F.when(draw < F.lit(weight_threshold_hex(SPLIT_BOUNDS[0][1])), "train")
        .when(draw < F.lit(weight_threshold_hex(SPLIT_BOUNDS[1][1])), "val")
        .otherwise("test")
    )
    return ordered_small(
        docs.withColumn("split", split)
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("doc_id").cast("bigint").alias("doc_id_checksum"),
            F.sum("n_chars").cast("bigint").alias("chars_total"),
        ),
        "split",
    )


@register(
    "sample_weighted_reservoir",
    "O3-ext,P-ext",
    "Exact weighted sampling WITHOUT replacement (A-Res, Efraimidis-"
    "Spirakis): every document gets priority ln(u)/w (u = deterministic "
    "md5 uniform, w = n_chars), and the 100 largest priorities are the "
    "sample — longer documents proportionally likelier, no rand(), no "
    "replacement, repartition-stable. Priority is map-side arithmetic; "
    "selection is a global top-k (TakeOrdered — never a full sort). The "
    "raw priority is NOT exposed: ln differs by 1 ulp between libms on "
    "rare inputs, which cannot flip the ORDER (adjacent priorities sit "
    "thousands of ulps apart — pinned in tests) but would break a hash on "
    "the double itself. The oracle replays draw, ln, divide, tie-break.",
    oracle="""
        SELECT rank, doc_id, n_chars
        FROM (
          SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
                 CAST(row_number() OVER (ORDER BY
                      ln((CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                                   1, 13)) AS BIGINT) AS DOUBLE)
                          + 1.0) / 4503599627370496.0)
                      / CAST(n_chars AS DOUBLE) DESC, doc_id)
                      AS BIGINT) AS rank
          FROM documents
          WHERE n_chars > 0
        ) ranked
        WHERE rank <= 100
        ORDER BY rank
    """,
)
def sample_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..operators.sampling import ares_key

    docs = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    keyed = docs.select(
        "doc_id",
        F.col("n_chars").cast("bigint").alias("n_chars"),
        ares_key(F.col("doc_id"), F.col("n_chars")).alias("lnkey"),
    )
    top = (
        keyed.orderBy(F.col("lnkey").desc(), "doc_id")
        .limit(100)
    )
    w = Window.orderBy(F.col("lnkey").desc(), "doc_id")
    # rank attaches AFTER the limit: the window input is the bounded top-100,
    # never the corpus
    return ordered_small(
        top.withColumn("rank", F.row_number().over(w).cast("bigint")).select(
            "rank", "doc_id", "n_chars"
        ),
        "rank",
    )
