"""Local Spark↔DuckDB parity harness.

Mirrors the driver's correctness gate: for each registry entry, run the Spark
builder and the DuckDB oracle over the same sf directory and compare row count,
column names, and an order-insensitive value hash.
"""

from __future__ import annotations

import datetime as _dt
import math
from dataclasses import dataclass

import duckdb

from notion_timetracking_etl_spark.sources.tpch import TPCH_TABLES


@dataclass
class ParityResult:
    name: str
    ok: bool
    detail: str


def _norm_cell(v) -> str:
    if v is None:
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # repr round-trips doubles exactly; -0.0 normalized
        if v == 0.0:
            v = 0.0
        return repr(v)
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (_dt.datetime, _dt.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def _canonical(rows, cols) -> list[str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        out.append("\x01".join(_norm_cell(row[i]) for i in order))
    out.sort()
    return out


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TPCH_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def compare_query(spark, con, spec, sf_dir: str) -> ParityResult:
    sdf = spec.spark(spark, sf_dir)
    s_cols = [c.lower() for c in sdf.columns]
    s_rows = [tuple(r) for r in sdf.collect()]
    if spec.oracle is None:
        return ParityResult(spec.name, True, f"rows-only: {len(s_rows)} rows")
    res = con.execute(spec.oracle)
    d_cols = [d[0].lower() for d in res.description]
    d_rows = res.fetchall()
    if sorted(s_cols) != sorted(d_cols):
        return ParityResult(
            spec.name, False, f"schema mismatch: spark={sorted(s_cols)} duck={sorted(d_cols)}"
        )
    if len(s_rows) != len(d_rows):
        return ParityResult(
            spec.name, False, f"row count mismatch: spark={len(s_rows)} duck={len(d_rows)}"
        )
    s_canon = _canonical(s_rows, s_cols)
    d_canon = _canonical(d_rows, d_cols)
    if s_canon != d_canon:
        diffs = [
            (a, b) for a, b in zip(s_canon, d_canon) if a != b
        ][:3]
        return ParityResult(
            spec.name,
            False,
            "value mismatch; first diffs (spark vs duck): "
            + " || ".join(f"{a!r} <> {b!r}" for a, b in diffs),
        )
    return ParityResult(spec.name, True, f"match: {len(s_rows)} rows")
