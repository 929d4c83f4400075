"""Scalar/vector function library.

- ``numeric``    cross-engine-deterministic aggregation helpers
- ``text``       text analysis (tokens, quality, lang-id, fingerprint)
- ``similarity`` embedding cosine / ANN search
- ``dedup``      exact + MinHash/SimHash/n-gram near-dup detection
- ``multimodal`` opaque binary columns + pandas-UDF plumbing
"""
