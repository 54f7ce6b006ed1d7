"""File-format sources: CSV / JSON-lines / ORC / parquet behind one helper.

The reference consumes Kafka + JDBC only (SURVEY §2.1); a standalone
analytics engine also ingests files. Design rules, all scale-driven:

- **Explicit schema, always.** Schema inference is a full extra pass over
  the data (at 100 TB: a second 100 TB scan) and infers different types on
  different samples — nondeterministic pipelines. Callers pass a DDL
  string or StructType.
- **PERMISSIVE + corrupt-record column** for text formats: one bad line
  must not poison a batch (same contract as the Debezium parser,
  sources/debezium.py). Corrupt rows are quarantined, not dropped — the
  caller decides.
- Columnar formats (parquet/ORC) keep predicate pushdown and column
  pruning; text formats (CSV/JSON) prune columns at parse time but can't
  skip row groups — the helper exists so pipelines can land text once and
  re-materialize columnar (`to_columnar`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

CORRUPT_COL = "_corrupt_record"


def _with_corrupt(schema: StructType | str, spark: SparkSession) -> StructType:
    if isinstance(schema, str):
        schema = StructType.fromDDL(schema)
    if CORRUPT_COL not in schema.fieldNames():
        schema = schema.add(CORRUPT_COL, "string")
    return schema


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    return (
        spark.read.schema(_with_corrupt(schema, spark))
        .option("header", header)
        .option("sep", sep)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .csv(path)
    )


def read_jsonl(spark: SparkSession, path: str, schema: StructType | str) -> DataFrame:
    return (
        spark.read.schema(_with_corrupt(schema, spark))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    # ORC is self-describing; schema enforcement happens by selecting, and
    # pushdown/pruning work as for parquet.
    return spark.read.orc(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantine): clean rows lose the corrupt column; quarantine
    keeps the full row (raw line + whatever parsed) for replay/repair.

    The parse is persisted first: Spark refuses raw-file plans whose only
    referenced source column is the internal corrupt-record column
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN), and its
    documented pattern is cache-then-split. At 100 TB don't split the raw
    read — land the parse columnar once (``to_columnar``) and split the
    columnar copy; this helper is the per-batch form (each micro-batch's
    parse fits in memory)."""
    if CORRUPT_COL not in df.columns:
        return df, df.limit(0)
    df = df.persist()
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull())
    return clean, bad


def to_columnar(df: DataFrame, path: str, fmt: str = "parquet") -> None:
    """Land a text-format read as columnar — the one-time cost that buys
    pushdown + pruning for every later scan."""
    df.write.mode("overwrite").format(fmt).save(path)
