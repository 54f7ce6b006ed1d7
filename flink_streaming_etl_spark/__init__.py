"""flink_streaming_etl_spark — a PySpark-native analytics engine with the
capability surface of EchoAGI/flink-streaming-etl (reference: a Flink-SQL CDC
streaming-ETL pipeline; see SURVEY.md).

Design stance (SURVEY.md §7): batch-first relational core on DataFrame/Spark
SQL (Catalyst does the optimizing), with CDC/changelog semantics as a thin
runtime layer (Debezium envelope parse → latest-state materialization →
recompute-per-batch → keyed upsert sink) on Structured Streaming.
"""

__version__ = "0.1.0"

from flink_streaming_etl_spark.session import get_spark  # noqa: F401
from flink_streaming_etl_spark.catalog import load_tables, TABLES  # noqa: F401
