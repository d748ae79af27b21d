"""LLM-data-pipeline operators (SURVEY.md §2.8): the driver-mandated
extension surface, designed for 100 TB.

- ``dedup``      : exact, n-gram Jaccard, MinHash+LSH, SimHash
- ``similarity`` : brute-force cosine top-k, random-hyperplane LSH ANN
- ``text``       : tokenization, stats, language-ID, quality scoring,
                   TF-IDF, winnowing fingerprints
- ``multimodal`` : binary payload + typed metadata columns, stubbed
                   decoders with real Spark plumbing
- ``temporal``   : sessionization, as-of join
"""
