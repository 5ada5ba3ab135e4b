"""JSONL dataset reader + partition discovery (SURVEY S4/S5).

Layout mirrors the reference's date-partitioned dirs
``<base>/data/{raw|canon}/<dataset>/<YYYY-MM-DD>/*.jsonl``
(reference: src/cli/index.ts:67,104-119; reader src/normalize/io.ts:22-38;
latest-dir pick src/normalize/io.ts:5-12 = lexicographic max subdir).

Spark's JSON source is line-delimited natively, so S4 is one schema'd
``spark.read.json`` over the whole date dir — multi-file concat, predicate
pushdown, and parallel split reads all come free. At lake scale the same
layout is a Hive-style ``date=YYYY-MM-DD`` partition and S5 becomes partition
pruning; the lexicographic max keeps ISO dates correct either way.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def dataset_dir(base_dir: str, kind: str, dataset: str, date: str | None = None) -> str:
    parts = [base_dir, "data", kind, dataset]
    if date is not None:
        parts.append(date)
    return os.path.join(*parts)


def latest_partition(base_dir: str, kind: str, dataset: str) -> str | None:
    """Lexicographic max of date-named subdirs (ISO dates sort correctly)."""
    root = dataset_dir(base_dir, kind, dataset)
    if not os.path.isdir(root):
        return None
    dates = sorted(e for e in os.listdir(root) if os.path.isdir(os.path.join(root, e)))
    return dates[-1] if dates else None


def read_jsonl(
    spark: SparkSession,
    schema: StructType,
    base_dir: str,
    kind: str,
    dataset: str,
    date: str | None = None,
) -> DataFrame:
    """Read one dataset partition (default: latest) through an explicit schema.

    Absent fields parse to null — the schema-on-read behavior every §2.8
    extractor is written against.
    """
    if date is None:
        date = latest_partition(base_dir, kind, dataset)
        if date is None:
            raise FileNotFoundError(
                f"no partitions under {dataset_dir(base_dir, kind, dataset)}"
            )
    return spark.read.schema(schema).json(dataset_dir(base_dir, kind, dataset, date))
