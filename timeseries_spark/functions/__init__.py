"""Column-expression building blocks (no UDFs — SQL higher-order functions).

Mirrors the reference's no-UDF discipline (SURVEY.md §2.10): everything here
compiles to Catalyst expressions that run inside whole-stage codegen.
"""

from timeseries_spark.functions.arrays import harmonic_score, top_k_desc
from timeseries_spark.functions.vectors import cosine_similarity, dot, l2_norm

__all__ = ["harmonic_score", "top_k_desc", "cosine_similarity", "dot", "l2_norm"]
