"""Training-data-pipeline operators (north-star surface beyond the
reference's own inventory): fuzzy deduplication (MinHash-LSH, SimHash,
n-gram Jaccard) and vector similarity search (brute-force cosine,
sign-LSH bucketed ANN).

Everything is native Column expressions over arrays — no Python UDFs —
and every hash primitive is md5-derived so an external SQL engine can
verify results bit-for-bit (the oracle-gate requirement).
"""
