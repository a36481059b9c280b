"""Training-data-pipeline extension operators (BASELINE.json north star).

Beyond the reference's own surface: deduplication (exact / MinHash-LSH /
SimHash / n-gram Jaccard), similarity search over embeddings, text
analysis, and multimodal column plumbing — each designed for 100 TB scale
(inverted-index joins instead of all-pairs, banded LSH instead of global
comparisons, HOF kernels instead of Python loops).
"""
