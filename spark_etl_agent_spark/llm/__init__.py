"""LLM-training-data pipeline operators (north-star extensions).

The reference has none of these; they are the BASELINE.json-mandated
extensions: deduplication (exact / normalized / MinHash-LSH / SimHash),
embedding similarity search (brute-force + LSH/IVF scale paths), text
analysis (language ID, quality scoring, token counting, fingerprinting)
and multimodal binary columns — every operator a pure DataFrame program
designed for 100 TB (no driver collects, shuffle only on bounded keys,
broadcast for small sides).
"""
