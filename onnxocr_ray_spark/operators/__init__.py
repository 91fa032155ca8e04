"""DataFrame -> DataFrame operators.

extract.py     three-stage extraction pipeline (detect/classify/recognize/
               assemble) with skew handling — the engine's flagship
dedup.py       corpus deduplication (exact, minhash-LSH, simhash, n-gram
               Jaccard, embedding near-dup)
similarity.py  embedding similarity search (brute-force + LSH-bucketed ANN)
textstats.py   language-ID, quality scoring, token counts, fingerprints
relational.py  SQL-expressible relational analogs of SURVEY.md §2 operators
multimodal.py  binary-payload plumbing (decode/feature stubs, real schemas)
"""
