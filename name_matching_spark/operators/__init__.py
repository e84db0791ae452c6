"""DataFrame-level operators: normalize, blocking, pair generation, scoring,
clustering, dedup, similarity search, text analysis."""
