"""LLM-data-pipeline operators over the ``documents`` / ``embeddings``
fixtures: deduplication (exact / normalized / MinHash-LSH / SimHash),
text analysis (stats, language-ID, token counting, fingerprinting,
quality scoring), embedding similarity search (brute-force and
bucketed ANN), and multimodal binary-column plumbing.

Everything is expressed as DataFrame column expressions and bucketed
joins — no all-pairs cross joins, no Python in the hot path — so the
same plans hold at the 100 TB target (see each module's scale notes).
"""
