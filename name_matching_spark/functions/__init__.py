"""Vectorized batch kernels + pandas UDF wrappers (the Arrow fast path)."""
