"""hbase_to_mongo_export_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query/data-processing capabilities of the
reference ETL pipeline ``dwp/hbase-to-mongo-export`` (a Kotlin/Spring-Batch
HBase→S3 snapshot exporter), re-expressed Spark-first:

- the reference's scan→parse→decrypt→normalize→sanitise→sink dataflow
  becomes a declarative DataFrame pipeline (``plans.export``);
- everything the reference lacks (joins, aggregations, windows, sorts, set
  ops, streaming) comes from Spark SQL / Catalyst (``operators``);
- LLM-training-data operators (dedup, similarity search, text analysis,
  multimodal columns) are first-class (``operators``, ``functions``).

Layout:
    session.py     SparkSession factory tuned for the workload
    sources/       parquet/HBase-shaped source loading + envelope parsing
    functions/     scalar kernels: crypto, normalize, sanitise, text
    operators/     relational + LLM-pipeline operators
    plans/         end-to-end pipelines (the HTME export job)
    streaming/     Structured Streaming variants (incremental export)
"""

__version__ = "0.1.0"
