"""Readers for the driver-generated TPC-H-ish testdata (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one Parquet file each under an sf directory.

Scale note: these are plain ``spark.read.parquet`` scans so Catalyst predicate
pushdown / column pruning apply unchanged when the paths point at a 100 TB
partitioned lake instead of local files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def ensure_nanos_readable(spark: SparkSession) -> None:
    """Pin the parquet timestamp reading contract. Two generator variants
    exist across driver rounds and both must read as plain TIMESTAMP whose
    stored value IS the UTC-epoch micros (DuckDB's reading of the same file,
    so ``unix_micros(ts)`` == ``epoch_us(ts)`` row-for-row):

    - TIMESTAMP(NANOS): unreadable without ``nanosAsLong`` (throws
      PARQUET_TYPE_ILLEGAL); arrives as long nanos, converted below.
    - TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark 4 infers
      TIMESTAMP_NTZ by default, which breaks every instant function
      (``unix_micros`` etc.) and diverges from the oracle's naive-as-UTC
      reading; ``inferTimestampNTZ=false`` restores the classic mapping
      where the stored micros are taken as the instant, no tz math at all
      (so no session-timezone or DST hazard on a vanilla session).

    Both confs are runtime-settable, so callers work on ANY session —
    including ones not built by session.build_session (e.g. a test
    harness's own SparkSession)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # orders/lineitem date columns are timestamp-annotated too — pin the
    # contract for every table, not just events.
    ensure_nanos_readable(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # TIMESTAMP(NANOS) read as long nanos (spark.sql.legacy.parquet.
        # nanosAsLong) → truncate to micros, same as DuckDB's ns→us read.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TPCH_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql use."""
    for name in TPCH_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
