"""edu_online_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the zhengkw/edu-online reference
(Scala Spark-Streaming demo for online-education analytics) on
DataFrames / Catalyst / Structured Streaming, extended with
LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal columns) designed for 100 TB scale.

Layout:
  session.py    SparkSession factory (AQE, Arrow, UTC)
  config.py     engine configuration
  schemas.py    explicit StructTypes for every source (replaces the
                reference's positional-convention "schemas", SURVEY §1.3)
  sources/      batch + streaming source adapters
  functions/    column-level helpers (pure, composable)
  operators/    the query library (batch-first, streaming-wrappable)
  streaming/    the four reference streaming jobs on Structured Streaming
  plans/        plan-inspection utilities (pushdown/codegen checks)
"""

__version__ = "0.1.0"
