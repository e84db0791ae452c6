"""name_matching_spark — a PySpark-native record-linkage / entity-resolution engine.

A from-scratch rebuild of the *semantics* of Kirachon/Name_Matching
(reference at /root/reference, read-only) on idiomatic Spark:

- blocking keys as DataFrame columns + salted self-joins (skew-split),
- pairwise scoring as vectorized pandas/Arrow UDFs (numpy batch kernels),
- transitive clustering via large-star/small-star label propagation,
- checkpoint-resumable per blocking-key partition range.

Nothing here is a code port: the reference is a single-node pandas/Numba
engine; this package expresses the same computations as Spark logical
plans and Arrow-vectorized batch kernels.
"""

__version__ = "0.1.0"
