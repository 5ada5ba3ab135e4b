"""Notion payload extraction (F1–F12) — filled in the normalize milestone."""
