"""Column-function library: the reference's per-row Python helpers
re-expressed as native Catalyst expressions (zero Python UDFs here)."""
