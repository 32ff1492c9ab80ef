"""Column-function library: text analysis, similarity, minhash/LSH, multimodal.

These are the beyond-reference LLM-training-data-pipeline operators
(BASELINE.json "north_star"): everything here is designed to run as
JVM-side Catalyst expressions where possible, Arrow-batched Pandas UDFs
otherwise, and to be oracle-checkable (a DuckDB-portable construction
exists for each checked operator).
"""
