"""azure_data_engineering_spark — a PySpark-native analytics engine.

A brand-new engine with the query/data-processing capabilities of the
reference repo ``shanjin14/Azure_Data_Engineering`` (an Azure Functions
ETL service: Excel→CSV conversion, blob archive/retention, Postgres
COPY/upsert — see SURVEY.md), re-expressed Spark-first:

- DataFrame/SQL declarative plans; Catalyst + AQE pick the physical
  strategy (predicate pushdown, column pruning, broadcast selection).
- Operator library (`operators/`) covering the relational surface the
  reference delegates to Postgres (SURVEY.md §2B), plus north-star
  LLM-pipeline operators (dedup, similarity search, text analysis,
  multimodal plumbing).
- Connectors (`sources/`) for pipe-CSV, Excel (gated), JDBC upsert
  (mirrors SharedCode/PGHelperFunction.py:44-77 MERGE semantics).
- Structured Streaming (`streaming/`) for the events stream.

Everything is designed for a multi-executor cluster at ~100 TB:
broadcast-only-dims, partial aggregation, no driver-side collects in
operator paths, Pandas UDFs only where built-ins cannot express the
semantics.
"""

from azure_data_engineering_spark.session import get_spark
from azure_data_engineering_spark.catalog import TABLES, load_table, load_tables, register_views

__all__ = ["get_spark", "TABLES", "load_table", "load_tables", "register_views"]
