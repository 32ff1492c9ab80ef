"""PySpark-native event-streaming analytics engine.

A brand-new engine with the query and data-processing capabilities of
the reference toy event-streaming pipeline (generate -> Kinesis-style
envelope -> decode -> dedup -> enrich -> NDJSON staging -> batch
deduplicating compaction -> partitioned Parquet -> metrics), rebuilt
idiomatically on Spark DataFrames / SQL / Structured Streaming, and
extended with LLM-training-data-pipeline operators (dedup family,
similarity search, multimodal columns, text analysis) designed for
100 TB scale.

Package layout
--------------
- ``session``   : SparkSession factory tuned for local[32] testing and
                  documented for cluster scale.
- ``schemas``   : fixed StructType constants (never re-infer in prod).
- ``config``    : event taxonomy (types x subtypes x field generators).
- ``sources``   : synthetic generator, Kinesis envelope codec, NDJSON IO.
- ``operators`` : enrichment, dedup, metrics, partitioned writes.
- ``functions`` : text analysis, similarity, minhash/LSH, multimodal.
- ``plans``     : end-to-end batch pipeline + the query catalog.
- ``streaming`` : Structured Streaming ingest with watermarked dedup.
"""

__version__ = "0.1.0"
