"""e_commerce_lakehouse_spark — a PySpark-native analytics engine.

A brand-new, Spark-first engine with the query and data-processing
capabilities of the VuLeHong/E-commerce-lakehouse reference (medallion
e-commerce lakehouse: batch star-schema ETL + event-stream processing),
extended with LLM-data-pipeline operators (dedup, similarity search,
text analysis, multimodal plumbing) designed for 100 TB scale.

Layout:
    session      — SparkSession builders (local test / cluster-tuned)
    schemas      — explicit StructType schemas for all tables & streams
    sources      — parquet/csv/json/jdbc/kafka readers, catalog helpers
    operators    — pure DataFrame -> DataFrame operator library
    functions    — scalar/column expression helpers (JVM-side, codegen-friendly)
    plans        — bronze/silver/gold pipeline compositions
    streaming    — Structured Streaming: parse, windows, sinks, rerank
"""

__version__ = "0.1.0"
