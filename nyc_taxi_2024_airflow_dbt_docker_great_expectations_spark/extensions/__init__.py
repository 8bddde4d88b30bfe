"""Large-scale training-data-pipeline operators (beyond the reference surface).

- ``dedup``: exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine
- ``similarity``: brute-force cosine top-k; LSH-bucketed ANN
- ``text``: language-ID, quality scoring, token counting, fingerprinting
- ``multimodal``: opaque binary columns + Pandas-UDF decode plumbing
"""
