"""Batch relational core — the reference's six continuous queries
(SURVEY.md §2.2-2.3) re-expressed over the driver testdata schema, plus the
flagship pricing-summary rollup.

Schema mapping (reference → testdata): orders→orders, users→customer,
products→part, order_items→lineitem. The reference's ES "views" are just the
query results; its `status <> 'closed'` filter maps to
`o_orderstatus <> 'F'`.

Determinism-for-oracle rules used throughout (the driver hash-compares
against DuckDB):
- Money aggregates are summed in DECIMAL (exact, order-independent), then
  either kept DECIMAL or converted to double *after* the exact sum.
- Averages = exact decimal sum cast to double, divided by the count —
  a single IEEE op, bit-identical in any engine.
- String aggs sort their inputs (`LISTAGG` has no deterministic order).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from flink_streaming_etl_spark.functions import day_bucket, salt_bucket

DEC = "decimal(18,2)"


def _dec(c: str) -> Column:
    return F.col(c).cast(DEC)


# ---------------------------------------------------------------------------
# Flagship: pricing summary (TPC-H Q1 shape) — scan-heavy agg, the classic
# "does partial aggregation + codegen hold up" probe.


def pricing_summary(lineitem: DataFrame) -> DataFrame:
    """Fixed-point int64 kernel: every money column carries ≤2 decimals, so
    cents (and cent-products for the discount/tax composites) are exact in
    int64 — the sums are order-independent integers, converted to double
    only at output. int64 aggregation keeps the hot loop in primitive
    codegen (decimal(>18) accumulators fall off the compact-long fast path
    to BigDecimal — measured ~1.6x slower map-side, and ~0.5 s more
    optimizer/codegen time per plan). round() before the cast is safe
    here: x*100 of a 2-dp value lands within 1e-9 of an integer, never on
    a .5 halfway case, so every engine rounds it identically. Bounds:
    charge is ≤1e11 per row ⇒ ≤6e16 over 6e5 rows, inside int64; the
    oracle mirrors the exact op sequence (int sum → double → divide) so
    the final IEEE roundings agree bit-for-bit."""
    cents = lambda c: F.round(F.col(c) * 100).cast("long")  # noqa: E731
    pc, dc, tc = cents("l_extendedprice"), cents("l_discount"), cents("l_tax")
    cnt = F.count(F.lit(1))
    sum_qty = F.sum(cents("l_quantity"))
    sum_base = F.sum(pc)
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit("2000-12-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            (sum_qty / 100.0).alias("sum_qty"),
            (sum_base / 100.0).alias("sum_base_price"),
            (F.sum(pc * (100 - dc)) / 10000.0).alias("sum_disc_price"),
            (F.sum(pc * (100 - dc) * (100 + tc)) / 1000000.0).alias("sum_charge"),
            ((sum_qty / 100.0) / cnt).alias("avg_qty"),
            ((sum_base / 100.0) / cnt).alias("avg_price"),
            ((F.sum(dc) / 100.0) / cnt).alias("avg_disc"),
            cnt.alias("count_order"),
        )
    )


PRICING_SUMMARY_SQL = """
SELECT l_returnflag, l_linestatus,
       SUM(CAST(round(l_quantity * 100) AS BIGINT)) / 100.0 AS sum_qty,
       SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0 AS sum_base_price,
       SUM(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))) / 10000.0 AS sum_disc_price,
       SUM(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT)) * (100 + CAST(round(l_tax * 100) AS BIGINT))) / 1000000.0 AS sum_charge,
       (SUM(CAST(round(l_quantity * 100) AS BIGINT)) / 100.0) / COUNT(*) AS avg_qty,
       (SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0) / COUNT(*) AS avg_price,
       (SUM(CAST(round(l_discount * 100) AS BIGINT)) / 100.0) / COUNT(*) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# order_view — streaming enrichment join (reference flink-ddl.sql:179-190):
# orders JOIN users projected with renamed columns. P1+P3.


def order_enrich_join(orders: DataFrame, customer: DataFrame) -> DataFrame:
    # customer is the small side at any scale factor → broadcast; at real
    # scale a sort-merge join on the (already co-partitioned) key is what
    # AQE would pick — either way no driver-side logic.
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey, "inner")
        .select(
            F.col("o_orderkey").alias("id"),
            F.col("o_totalprice").alias("order_amount"),
            F.col("o_orderstatus").alias("order_status"),
            F.col("o_orderpriority").alias("order_channel"),
            F.col("c_name").alias("user_name"),
            F.col("c_mktsegment").alias("user_segment"),
            F.col("o_orderdate").alias("ctime"),
        )
    )


ORDER_ENRICH_JOIN_SQL = """
SELECT o_orderkey AS id,
       o_totalprice AS order_amount,
       o_orderstatus AS order_status,
       o_orderpriority AS order_channel,
       c_name AS user_name,
       c_mktsegment AS user_segment,
       o_orderdate AS ctime
FROM orders JOIN customer ON o_custkey = c_custkey
"""


# ---------------------------------------------------------------------------
# user_view / product_view — plain projections (flink-ddl.sql:192,194). P1.


def user_view(customer: DataFrame) -> DataFrame:
    return customer.select(
        F.col("c_custkey").alias("id"),
        F.col("c_name").alias("name"),
        F.col("c_mktsegment").alias("segment"),
        F.col("c_acctbal").alias("acctbal"),
    )


USER_VIEW_SQL = """
SELECT c_custkey AS id, c_name AS name, c_mktsegment AS segment,
       c_acctbal AS acctbal
FROM customer
"""


def product_view(part: DataFrame) -> DataFrame:
    return part.select(
        F.col("p_partkey").alias("id"),
        F.col("p_name").alias("name"),
        F.col("p_brand").alias("brand"),
        F.col("p_retailprice").alias("price"),
    )


PRODUCT_VIEW_SQL = """
SELECT p_partkey AS id, p_name AS name, p_brand AS brand,
       p_retailprice AS price
FROM part
"""


# ---------------------------------------------------------------------------
# user_order_stats_view — per-user per-day SUM/COUNT excluding cancelled
# orders (flink-ddl.sql:197-211). A1+A3 semantics; the reference's manual
# two-level salted rollup (A2) is the *_salted variant below.


def user_day_stats(orders: DataFrame) -> DataFrame:
    return (
        orders.filter(F.col("o_orderstatus") != "F")
        .groupBy(
            F.col("o_custkey").alias("id"),
            day_bucket("o_orderdate").alias("cday"),
        )
        .agg(
            F.sum(_dec("o_totalprice")).cast("double").alias("order_amount_day"),
            F.count(F.lit(1)).alias("order_count_day"),
        )
    )


USER_DAY_STATS_SQL = """
SELECT o_custkey AS id, strftime(o_orderdate, '%Y-%m-%d') AS cday,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS order_amount_day,
       COUNT(*) AS order_count_day
FROM orders WHERE o_orderstatus <> 'F'
GROUP BY 1, 2
"""


def user_day_stats_salted(orders: DataFrame, buckets: int = 256) -> DataFrame:
    """The reference's hand-rolled split aggregation (flink-ddl.sql:197-211):
    inner agg over (key, salt-bucket) partials, outer re-agg (A2+A6).

    On Spark this is strictly redundant — hash aggregation is already
    partial+final and AQE splits skewed partitions — so the engine's test
    contract is that this equals :func:`user_day_stats` exactly.
    """
    partial = (
        orders.filter(F.col("o_orderstatus") != "F")
        .groupBy(
            F.col("o_custkey").alias("id"),
            day_bucket("o_orderdate").alias("cday"),
            salt_bucket(F.col("o_orderkey"), buckets).alias("bucket"),
        )
        .agg(
            F.sum(_dec("o_totalprice")).alias("amount"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )
    return partial.groupBy("id", "cday").agg(
        F.sum("amount").cast("double").alias("order_amount_day"),
        F.sum("cnt").alias("order_count_day"),
    )


# ---------------------------------------------------------------------------
# order_stats_view — per-day totals with retraction semantics
# (flink-ddl.sql:214-227): totals must drop when an order flips to closed.
# In batch recompute form that's simply "filter then aggregate".


def day_stats(orders: DataFrame) -> DataFrame:
    return (
        orders.filter(F.col("o_orderstatus") != "F")
        .groupBy(day_bucket("o_orderdate").alias("id"))
        .agg(
            F.sum(_dec("o_totalprice")).cast("double").alias("amount"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )


DAY_STATS_SQL = """
SELECT strftime(o_orderdate, '%Y-%m-%d') AS id,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS amount,
       COUNT(*) AS cnt
FROM orders WHERE o_orderstatus <> 'F'
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# product_stats_view — fact-to-fact join + per-product rollup
# (flink-ddl.sql:243-259). P4+A2.


def product_stats(lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    # Both sides are fact-sized: this is the one genuinely shuffle-bound
    # join in the reference workload. l_orderkey/o_orderkey are the natural
    # co-partitioning keys; AQE handles skewed orders.
    open_orders = orders.filter(F.col("o_orderstatus") != "F").select("o_orderkey")
    return (
        lineitem.join(open_orders, lineitem.l_orderkey == open_orders.o_orderkey, "inner")
        .groupBy(F.col("l_partkey").alias("id"))
        .agg(
            F.count(F.lit(1)).alias("quantity"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("amount"),
        )
    )


PRODUCT_STATS_SQL = """
SELECT l_partkey AS id, COUNT(*) AS quantity,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS amount
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderstatus <> 'F'
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# order_view_items — LISTAGG (A4) and COLLECT(ROW(...)) (A5) per order
# (flink-ddl.sql:124-132). LISTAGG is order-sensitive → sort for determinism.


def listagg_items(lineitem: DataFrame) -> DataFrame:
    return lineitem.groupBy(F.col("l_orderkey").alias("id")).agg(
        F.array_join(
            F.sort_array(F.collect_list(F.col("l_partkey").cast("string"))), ","
        ).alias("order_items"),
        F.count(F.lit(1)).alias("n_items"),
    )


LISTAGG_ITEMS_SQL = """
SELECT l_orderkey AS id,
       string_agg(CAST(l_partkey AS VARCHAR), ',' ORDER BY CAST(l_partkey AS VARCHAR)) AS order_items,
       COUNT(*) AS n_items
FROM lineitem GROUP BY 1
"""


def collect_items(lineitem: DataFrame) -> DataFrame:
    """COLLECT(ROW(product_id, price, quantity)) → array<struct> per order
    (flink-ddl.sql:129-132; ES target schema flink-ddl.sql:113-117).
    Sorted for determinism. Struct-array results are rows-only-checked by
    the driver (no portable cross-engine hash for nested arrays)."""
    item = F.struct(
        F.col("l_partkey").alias("product_id"),
        F.col("l_extendedprice").alias("price"),
        F.col("l_quantity").cast("long").alias("quantity"),
    )
    return lineitem.groupBy(F.col("l_orderkey").alias("id")).agg(
        F.array_sort(F.collect_list(item)).alias("order_items")
    )


def collect_items_flat(lineitem: DataFrame) -> DataFrame:
    """Driver-hashable twin of ``collect_items``: the same sorted
    COLLECT(ROW(...)) aggregation, with the struct array flattened to one
    deterministic string per order (``pid:price:qty`` items joined by "|").
    The driver's canonicalizer can't hash nested arrays (pandas
    "unhashable type: list"), so this projection carries the full content
    of the nested result through an exact cross-engine string compare.
    Price is pinned to DECIMAL(18,2) text so both engines print identically."""
    item = F.struct(
        F.col("l_partkey").alias("product_id"),
        F.col("l_extendedprice").alias("price"),
        F.col("l_quantity").cast("long").alias("quantity"),
    )
    as_text = F.transform(
        F.array_sort(F.collect_list(item)),
        lambda x: F.concat_ws(
            ":",
            x["product_id"].cast("string"),
            x["price"].cast("decimal(18,2)").cast("string"),
            x["quantity"].cast("string"),
        ),
    )
    return lineitem.groupBy(F.col("l_orderkey").alias("id")).agg(
        F.array_join(as_text, "|").alias("order_items"),
        F.count(F.lit(1)).alias("n_items"),
    )


COLLECT_ITEMS_FLAT_SQL = """
SELECT l_orderkey AS id,
       string_agg(
         CAST(l_partkey AS VARCHAR) || ':' ||
         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS VARCHAR) || ':' ||
         CAST(CAST(l_quantity AS BIGINT) AS VARCHAR),
         '|' ORDER BY l_partkey, l_extendedprice, CAST(l_quantity AS BIGINT)
       ) AS order_items,
       COUNT(*) AS n_items
FROM lineitem GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Latest-state per key — the batch shape of CDC upsert materialization
# (SURVEY.md §7: changelog → latest row per PK ordered by ts). Expressed on
# the events stream table: last event per user.


def latest_event_per_user(events: DataFrame) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("user_id").alias("id"),
            F.col("event_id").alias("last_event_id"),
            F.col("event_type").alias("last_event_type"),
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("last_ts"),
        )
    )


LATEST_EVENT_PER_USER_SQL = """
SELECT user_id AS id, event_id AS last_event_id, event_type AS last_event_type,
       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS last_ts
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# Dimension-chain broadcast join: region ⋈ nation ⋈ customer rollup — the
# lookup-join capability (S3/P5) in batch form; both dims broadcast.


def region_rollup(customer: DataFrame, nation: DataFrame, region: DataFrame) -> DataFrame:
    return (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"))
        .agg(
            F.count(F.lit(1)).alias("customers"),
            F.sum(_dec("c_acctbal")).cast("double").alias("total_acctbal"),
        )
    )


REGION_ROLLUP_SQL = """
SELECT r_name AS region_name, COUNT(*) AS customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Scalar-function battery (F1-F11) over events, incl. JSON extraction (the
# MongoDB path lands documents as JSON strings, flink-mongodb.sql:3).


def scalar_battery(events: DataFrame) -> DataFrame:
    return events.select(
        F.col("event_id").alias("id"),
        day_bucket("ts").alias("day"),                                    # F1
        F.date_format("ts", "yyyyMMdd").alias("day_compact"),             # F2
        F.floor(F.col("value")).cast("long").alias("value_floor"),        # F5
        F.pmod(F.floor(F.col("value") * 10).cast("long"), F.lit(256)).alias("bucket"),  # F7/F9
        F.get_json_object("props", "$.k").alias("prop_k"),                # F11
        F.upper(F.substring("event_type", 1, 3)).alias("type_prefix"),
        F.concat_ws("-", "event_type", F.col("user_id").cast("string")).alias("type_user"),
        F.when(F.col("event_type") == "purchase", F.lit("revenue"))
        .otherwise(F.lit("activity"))
        .alias("kind"),
    ).filter(F.col("event_type") != "error")                              # F10


SCALAR_BATTERY_SQL = """
SELECT event_id AS id,
       strftime(ts, '%Y-%m-%d') AS day,
       strftime(ts, '%Y%m%d') AS day_compact,
       CAST(floor(value) AS BIGINT) AS value_floor,
       ((CAST(floor(value * 10) AS BIGINT) % 256) + 256) % 256 AS bucket,
       json_extract_string(props, '$.k') AS prop_k,
       upper(substr(event_type, 1, 3)) AS type_prefix,
       event_type || '-' || CAST(user_id AS VARCHAR) AS type_user,
       CASE WHEN event_type = 'purchase' THEN 'revenue' ELSE 'activity' END AS kind
FROM events WHERE event_type <> 'error'
"""


# ---------------------------------------------------------------------------
# As-of join (beyond-reference): each event matched to the user's latest
# order at-or-before the event time — the enrichment pattern for feature
# backfill / point-in-time-correct training data.


def latest_order_asof(events: DataFrame, orders: DataFrame) -> DataFrame:
    """As-of (point-in-time) left join, expressed as union + windowed
    last_value — ONE shuffle on the join key, no range-join blowup:

    1. tag order rows 0 and event rows 1, union them;
    2. sort within each user by (ts, tag, orderkey) — an order at exactly
       the event timestamp sorts first, making the match inclusive (<=),
       and concurrent orders resolve to the highest orderkey;
    3. running last_value(..., ignoreNulls) carries the latest order's
       columns forward onto every later event row.

    At 100 TB this is the scale-correct as-of plan: a single hash exchange
    on user_id + per-partition sort, versus a range join's quadratic
    candidate generation. DuckDB's native ASOF JOIN is the oracle.
    """
    o = orders.select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").alias("ts"),
        "o_orderkey",
        "o_totalprice",
    )
    # Deduplicate concurrent orders per (user, ts) to the max orderkey so
    # both engines resolve ties identically.
    w_dedup = Window.partitionBy("user_id", "ts").orderBy(F.col("o_orderkey").desc())
    o = o.withColumn("_rn", F.row_number().over(w_dedup)).filter(F.col("_rn") == 1).drop("_rn")

    e = events.select("user_id", "ts", "event_id")
    tagged = o.select(
        "user_id", "ts", F.lit(None).cast("long").alias("event_id"),
        "o_orderkey", "o_totalprice", F.lit(0).alias("_tag"),
    ).unionByName(
        e.select(
            "user_id", "ts", "event_id",
            F.lit(None).cast("long").alias("o_orderkey"),
            F.lit(None).cast("double").alias("o_totalprice"),
            F.lit(1).alias("_tag"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "_tag", F.col("o_orderkey").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged.select(
        "user_id", "ts", "event_id", "_tag",
        F.last("o_orderkey", ignorenulls=True).over(w).alias("order_key"),
        F.last("o_totalprice", ignorenulls=True).over(w).alias("order_amount"),
    )
    return carried.filter(F.col("_tag") == 1).select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("event_ts"),
        "order_key",
        "order_amount",
    )


LATEST_ORDER_ASOF_SQL = """
WITH o AS (
  SELECT o_custkey AS user_id, o_orderdate AS ts, o_orderkey, o_totalprice
  FROM (
    SELECT *, row_number() OVER (PARTITION BY o_custkey, o_orderdate
                                 ORDER BY o_orderkey DESC) AS rn
    FROM orders
  ) WHERE rn = 1
)
SELECT e.event_id,
       e.user_id,
       strftime(e.ts, '%Y-%m-%d %H:%M:%S.%f') AS event_ts,
       o.o_orderkey AS order_key,
       o.o_totalprice AS order_amount
FROM events e
ASOF LEFT JOIN o ON e.user_id = o.user_id AND e.ts >= o.ts
"""


# ---------------------------------------------------------------------------
# Textual SQL surface: the same engine through spark.sql over the session
# catalog's registered views (D7) — how a reference user's SQL text ports.


SQL_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def sql_pricing_summary(spark, _unused=None):
    """`spark.sql` twin of :func:`pricing_summary` (reduced column set) —
    proves the registered-view catalog path (D7) yields the same plans the
    DataFrame API builds."""
    return spark.sql(SQL_PRICING_SUMMARY)


SQL_PRICING_SUMMARY_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# Salted join — the join-side twin of the reference's salted aggregation
# (A2, flink-ddl.sql:209). AQE's skew-join split handles *partition*-level
# skew by subdividing oversized partitions, but a single pathological key
# (one user with 10% of a 100 TB fact table) still lands every probe row
# on the tasks holding that key's build row. Salting replicates the small
# side N ways and scatters the big side uniformly across the replicas:
# hot-key rows spread over N tasks at the cost of an N-times-larger build
# side. Correct for inner/left joins on the big side (each big row meets
# exactly one replica of its key).


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``key`` with an ``n_salts``-way salt.

    The big side's salt must only be *uniform*, not content-derived —
    hashing the full row spreads even identical rows. The small side
    replicates via explode(sequence), a codegen'd row multiplier."""
    salt = F.pmod(F.hash(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    b = big.withColumn("_salt", salt)
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return b.join(s, [key, "_salt"], how).drop("_salt")
