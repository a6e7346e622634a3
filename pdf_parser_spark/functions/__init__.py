"""Training-data pipeline operators beyond the reference's own surface:
deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard), embedding
similarity search, text analysis (language-ID, quality scoring, token
counts, fingerprinting), and multimodal binary-column plumbing.

Design rule: every operator that claims SQL-expressibility uses only
*engine-portable* primitives (md5 for hashing, decimal-cast sums for exact
monetary aggregation, integer-derived ratios) so the DuckDB oracle in
``__spark_entry__.oracle_sql()`` reproduces Spark's output bit-for-bit.
"""
