"""Training-data pipelines over the driver's ``documents`` / ``embeddings``
tables: full-text stats + ad-hoc BM25, deduplication (exact / MinHash-LSH /
SimHash / n-gram Jaccard), similarity search, text analysis, and multimodal
plumbing. Each pipeline is a streaming Ray Data expression; SQL-expressible
ones are oracle-checked via ``__ray_entry__.oracle_sql``."""
