"""uc_historic_data_importer_spark — a PySpark-native rebuild of the data
processing capabilities of dwp/uc-historic-data-importer ("HDI").

The reference (read-only at /root/reference/) is a Kotlin + Spring Batch
one-shot ETL: S3-listed encrypted gzipped Mongo-dump JSONL → per-record
normalization → versioned HBase cells + per-file manifest CSVs. This package
re-expresses every stage as idiomatic Spark DataFrame operators (see
SURVEY.md §2 for the operator inventory and §7 for the architecture), plus
the large-scale training-data extensions (dedup / similarity / text
analysis / multimodal plumbing) a 100 TB pipeline needs.

Layout:
    session.py     SparkSession factory (UTC, AQE, tuned shuffle)
    functions/     scalar/column helpers: canonical JSON, dates, keys, hashes
    operators/     DataFrame -> DataFrame stages: transforms, keying,
                   filters, envelope, latest-per-key, dedup, similarity,
                   text analysis, multimodal
    sources/       listing + pairing, encrypted-stream source, JSONL
    sinks.py       KV parquet sink (latest-wins view), manifest CSV
    plans/         pipeline composition + run modes
    streaming/     Structured Streaming variants
"""

__version__ = "0.1.0"
