"""Sinks: JSONL (S6), Excel (S7), Power BI push dataset (S8–S11)."""
