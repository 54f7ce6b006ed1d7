"""Table registry + catalog shim.

Reference parity (SURVEY.md §2.7):
- D1 `CREATE TABLE ... WITH (options)`      → ``TableRegistry.create_table``
- D2 `PRIMARY KEY ... NOT ENFORCED`          → ``TableSpec.primary_key`` metadata
  (drives upsert keys; Spark has no PK, reference flink-ddl.sql:9)
- D3 computed column `AS PROCTIME()`         → ``proc_time`` generated on read
- D4 `CREATE CATALOG` (jdbc)                 → ``JdbcCatalog`` shim
- D5 `CREATE TABLE ... LIKE (INCL/EXCL OPTIONS)` → ``create_table_like``
  (reference README.md:215-225, 252-254)
- D6 `USE CATALOG`                           → ``CatalogManager.use_catalog``
- D7 session-scoped metadata, DDL runs no job → registry is plain in-memory
  dicts; ``materialize`` is the only call that touches Spark.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field, replace
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

#: Tables the driver generates (TESTDATA.md). One parquet file each.
TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


#: (session id, sf_dir) → loaded DataFrames. DataFrames are immutable plan
#: handles; reusing them skips re-reading parquet footers and re-planning
#: the repartition probe on every registry call (measurable per-query
#: driver-side overhead when a bench run touches 30+ queries).
_LOAD_CACHE: dict[tuple[int, str, bool], dict[str, DataFrame]] = {}


def load_tables(
    spark: SparkSession, sf_dir: str, register: bool = True
) -> dict[str, DataFrame]:
    """Load the driver-generated parquet tables lazily (scan-time column
    pruning and predicate pushdown stay available to Catalyst)."""
    cache_key = (id(spark), os.path.abspath(sf_dir), register)
    if cache_key in _LOAD_CACHE:
        cached = _LOAD_CACHE[cache_key]
        if register:
            # ALWAYS re-register on a hit: a later load_tables at a
            # DIFFERENT sf_dir overwrites the session's temp views
            # (createOrReplaceTempView), so a cached register=True call
            # that skipped this left spark.sql() queries silently reading
            # the other corpus (caught by the sf0.01 gate running after
            # sf0.001 tests: sql_pricing_summary read sf0.001 views).
            for name, df in cached.items():
                df.createOrReplaceTempView(name)
        return dict(cached)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # events.parquet carries TIMESTAMP(NANOS), which Spark's parquet reader
    # rejects; read nanos as long and convert to a micro timestamp (what
    # DuckDB does implicitly).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    cpus = spark.sparkContext.defaultParallelism
    dfs: dict[str, DataFrame] = {}
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            df = spark.read.parquet(path)
            for field in df.schema.fields:
                if field.name == "ts" and field.dataType.simpleString() == "bigint":
                    df = df.withColumn(
                        "ts", F.timestamp_micros(F.expr("ts div 1000"))
                    )
            # Single-row-group files scan as ONE split, serializing all
            # map-side work onto one core. Only the tables with genuinely
            # CPU-heavy map sides (per-shingle hashing, vector math) earn
            # the extra exchange; relational tables keep their scan
            # partitioning — their map side is cheap projection and the
            # groupBy/join shuffle parallelizes them anyway. At cluster
            # scale data arrives in thousands of splits and this branch
            # never fires.
            if name in ("documents", "embeddings") and df.rdd.getNumPartitions() < cpus:
                df = df.repartition(cpus)
            dfs[name] = df
            if register:
                df.createOrReplaceTempView(name)
    _LOAD_CACHE[cache_key] = dict(dfs)
    return dfs


@dataclass(frozen=True)
class TableSpec:
    """Session-scoped table metadata, mirroring a Flink `CREATE TABLE`.

    ``options`` carries connector config (reference flink-ddl.sql:11-18);
    ``primary_key`` drives upsert materialization (flink-ddl.sql:9);
    ``proc_time`` adds a processing-time column (flink-ddl.sql:10).
    """

    name: str
    schema: StructType
    options: dict[str, str] = field(default_factory=dict)
    primary_key: tuple[str, ...] = ()
    proc_time: str | None = None


class TableRegistry:
    """In-memory, session-scoped table catalog (reference README.md:342,346:
    DDL mutates session metadata only and launches no job)."""

    def __init__(self) -> None:
        self._tables: dict[str, TableSpec] = {}

    def create_table(
        self,
        name: str,
        schema: StructType,
        options: dict[str, str] | None = None,
        primary_key: tuple[str, ...] | str = (),
        proc_time: str | None = None,
    ) -> TableSpec:
        if isinstance(primary_key, str):
            primary_key = (primary_key,)
        spec = TableSpec(name, schema, dict(options or {}), tuple(primary_key), proc_time)
        self._tables[name] = spec
        return spec

    def create_table_like(
        self,
        name: str,
        like: str,
        including_options: bool = False,
        options: dict[str, str] | None = None,
    ) -> TableSpec:
        """`CREATE TABLE a LIKE b (INCLUDING|EXCLUDING OPTIONS)`
        (reference README.md:215-225 EXCLUDING, :252-254 INCLUDING)."""
        src = self._tables[like]
        opts = dict(src.options) if including_options else {}
        opts.update(options or {})
        spec = replace(src, name=name, options=opts)
        self._tables[name] = spec
        return spec

    def get(self, name: str) -> TableSpec:
        return self._tables[name]

    def drop(self, name: str) -> None:
        self._tables.pop(name, None)

    def names(self) -> list[str]:
        return sorted(self._tables)

    def materialize(
        self, spark: SparkSession, name: str, reader: Callable[[SparkSession, TableSpec], DataFrame]
    ) -> DataFrame:
        """Turn a spec into a DataFrame via a connector-specific reader and
        add the proc-time computed column if declared."""
        spec = self._tables[name]
        df = reader(spark, spec)
        if spec.proc_time:
            df = df.withColumn(spec.proc_time, F.current_timestamp())
        return df


class JdbcCatalog:
    """Shim for the reference's JDBC catalog (README.md:109-126): table
    metadata is served by the external database, tables load on demand."""

    def __init__(self, base_url: str, default_database: str, username: str, password: str):
        self.base_url = base_url
        self.default_database = default_database
        self.username = username
        self.password = password

    def _jdbc_options(
        self,
        table: str,
        partition_column: str | None = None,
        num_partitions: int | None = None,
        bounds: tuple[int, int] | None = None,
        fetchsize: int = 10_000,
    ) -> dict[str, str]:
        """Option set for `spark.read.format("jdbc")` (pure function —
        connection only happens at `.load()`). Mirrors the reference's
        connector block (flink-ddl.sql:84-94: driver/url/user/password/
        table-name). The partitioning options are the scale knob Flink's
        lookup cache never needed: a full-dimension snapshot at 100 TB
        scale must read in parallel ranges, not one executor."""
        opts = {
            "url": f"{self.base_url}/{self.default_database}",
            "dbtable": table,
            "user": self.username,
            "password": self.password,
            "fetchsize": str(fetchsize),
        }
        if partition_column and num_partitions and bounds:
            opts.update(
                partitionColumn=partition_column,
                numPartitions=str(num_partitions),
                lowerBound=str(bounds[0]),
                upperBound=str(bounds[1]),
            )
        return opts

    def load(self, spark: SparkSession, table: str, **partition_kwargs) -> DataFrame:
        return (
            spark.read.format("jdbc")
            .options(**self._jdbc_options(table, **partition_kwargs))
            .load()
        )


class CatalogManager:
    """`CREATE CATALOG` / `USE CATALOG` (reference README.md:109-126,260)."""

    def __init__(self) -> None:
        self.catalogs: dict[str, object] = {"default_catalog": TableRegistry()}
        self.current = "default_catalog"

    def create_catalog(self, name: str, catalog: object) -> None:
        self.catalogs[name] = catalog

    def use_catalog(self, name: str) -> None:
        if name not in self.catalogs:
            raise KeyError(f"unknown catalog: {name}")
        self.current = name

    @property
    def current_catalog(self) -> object:
        return self.catalogs[self.current]


class TtlDimensionCache:
    """Dimension lookup table with a TTL-bounded snapshot cache.

    Emulates the reference's JDBC lookup cache (`lookup.cache.max-rows`=3000,
    `lookup.cache.ttl`=10s, flink-ddl.sql:91-93): the dimension side of a
    stream enrichment join is re-read at most once per TTL and broadcast to
    the join. ``loader`` is any () -> DataFrame (JDBC, parquet, ...).
    """

    def __init__(self, loader: Callable[[], DataFrame], ttl_seconds: float = 10.0,
                 max_retries: int = 3):
        self.loader = loader
        self.ttl = ttl_seconds
        self.max_retries = max_retries
        self._cached: DataFrame | None = None
        self._loaded_at = float("-inf")

    def snapshot(self) -> DataFrame:
        now = time.monotonic()
        if self._cached is None or now - self._loaded_at > self.ttl:
            err: Exception | None = None
            for _ in range(self.max_retries):
                try:
                    self._cached = self.loader()
                    err = None
                    break
                except Exception as exc:  # retry per lookup.max-retries
                    err = exc
            if err is not None:
                raise err
            self._loaded_at = now
        return self._cached

    def join(self, stream_df: DataFrame, on: list[str] | str, how: str = "inner") -> DataFrame:
        """Enrichment join against the (broadcast) cached dimension."""
        return stream_df.join(F.broadcast(self.snapshot()), on=on, how=how)


def dimension_cache_from_env(
    spark: SparkSession,
    table: str,
    fallback_loader: Callable[[], DataFrame],
    ttl_seconds: float = 10.0,
    max_retries: int = 3,
) -> TtlDimensionCache:
    """The live-JDBC dimension path, one env var away (same pattern as the
    Kafka branch in `CdcSource.stream_changelog`): with
    ``SPARK_GRAFT_JDBC_URL=jdbc:mysql://host:3306`` set, the TTL cache
    re-reads the dimension from the live database each refresh
    (reference's lookup table, flink-ddl.sql:79-94); otherwise the given
    fallback loader (parquet fixture) serves snapshots. DB name, user and
    password come from SPARK_GRAFT_JDBC_{DB,USER,PASSWORD}."""
    url = os.environ.get("SPARK_GRAFT_JDBC_URL")
    if url:
        cat = JdbcCatalog(
            url,
            os.environ.get("SPARK_GRAFT_JDBC_DB", "crm"),
            os.environ.get("SPARK_GRAFT_JDBC_USER", "root"),
            os.environ.get("SPARK_GRAFT_JDBC_PASSWORD", ""),
        )
        return TtlDimensionCache(
            lambda: cat.load(spark, table), ttl_seconds, max_retries
        )
    return TtlDimensionCache(fallback_loader, ttl_seconds, max_retries)
