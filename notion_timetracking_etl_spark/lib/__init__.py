"""Driver-side utilities shared by sources and sinks (retry, rate limiting)."""
