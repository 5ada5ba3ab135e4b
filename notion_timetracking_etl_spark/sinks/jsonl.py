"""JSONL sink (SURVEY S6).

One JSON object per line, newline-terminated, written to the partitioned
layout of ``sources/jsonl.py`` (reference: src/sinks/jsonlSink.ts:3-5 +
src/lib/fs.ts:8-12 — serialize each record, join with newlines, trailing
newline).

``df.write.json`` is the scale path: every partition writes its own file in
parallel, which *is* the multi-file concat shape S4 reads back. No driver
collection at any size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..sources.jsonl import dataset_dir


def write_jsonl(
    df: DataFrame,
    base_dir: str,
    kind: str,
    dataset: str,
    date: str,
    mode: str = "overwrite",
) -> str:
    """Write a dataset partition; returns the directory written."""
    path = dataset_dir(base_dir, kind, dataset, date)
    df.write.mode(mode).json(path)
    return path
