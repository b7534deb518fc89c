"""postgres_cdc_plugin_spark — a PySpark-native engine with the query and
data-processing capabilities of hasura/postgres-cdc-plugin.

The reference (/root/reference) is a Postgres extension that captures row
changes via triggers and delivers JSON envelopes to webhooks
(cdc_webhook--1.0.sql:116-368). This package re-expresses that dataflow —
change-capture -> op filter -> column-diff filter -> credential join ->
envelope projection -> retrying HTTP / queue sink — natively on Spark
DataFrames + Structured Streaming, and surrounds it with the relational +
LLM-data-pipeline query surface needed to analyze captured change streams
at 100 TB scale (SURVEY.md §2.12).

Layout:
  session.py     SparkSession factory (AQE, UTC, arrow)
  config.py      SubscriptionConfig + the 8 reference validation rules
  envelope.py    change-event envelope schema + builders
  operators/     batch operator surface (cdc, analytics, dedup, text,
                 similarity, multimodal)
  streaming/     capture -> deliver -> queue -> credstore streaming layer
  registry.py    QUERIES/ORACLE_SQL registry consumed by __spark_entry__
"""

__version__ = "0.1.0"
