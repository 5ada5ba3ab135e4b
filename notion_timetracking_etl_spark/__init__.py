"""notion_timetracking_etl_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of ``theHaruspex/notion-timetracking-etl`` (see SURVEY.md):

- ``functions/``  — the scalar Column-builder library (SURVEY §2.8, F1–F36)
- ``sources/``    — readers: JSONL/Parquet partitioned datasets, TPC-H testdata,
                    a driver-side Notion API adapter (SURVEY §2.1, S1–S5)
- ``operators/``  — DataFrame→DataFrame transforms: normalize, quality rules,
                    interval/occupancy ops, dedup, similarity, text analysis
- ``plans/``      — end-to-end derive pipelines (the 7-table star schema)
- ``queries/``    — the oracle-checked query registry consumed by
                    ``__spark_entry__.py`` (each entry: Spark builder + DuckDB SQL)
- ``sinks/``      — JSONL, Excel, Power BI push (wipe+reload, governor, registry)
- ``streaming/``  — Structured Streaming variants (extension; reference has none)

Everything is DataFrame/SQL-first: logical plans are declared with the PySpark
DataFrame API and Catalyst/Tungsten pick the physical strategy. Python UDFs are
avoided in hot paths; the few unavoidable ones are Arrow-batched pandas UDFs.
"""

__version__ = "0.1.0"
