"""Analytics extensions beyond the reference's operator inventory.

The reference (SURVEY.md §2.3 note) exercises *no* grouping sets, window
functions, semi/anti joins, set operations, pivots, or range joins — a user
migrating real workloads onto this engine needs them, so they are first-class
here: each has a DataFrame builder, a DuckDB oracle, and a plan expectation
(tests/test_plans.py).

Determinism rules follow operators/relational.py: decimal sums (order
independent), no round() (q6 floor-quantization), no transcendental
functions in oracle-compared outputs (log/exp differ across libm
implementations — ratio-based idf instead), explicit tie-breaks in every
window ORDER BY.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from flink_streaming_etl_spark.functions import q6, q6_sql
from flink_streaming_etl_spark.operators._cache import memo_persist

DEC = "decimal(18,2)"


def _dec(c: str) -> Column:
    return F.col(c).cast(DEC)


# ---------------------------------------------------------------------------
# ROLLUP / grouping sets. Spark's rollup() and DuckDB's ROLLUP both emit
# NULL for the rolled-up level; GROUPING() disambiguates real NULLs. The
# grouped columns are coalesced to 'ALL' so the hash-compare never sees
# engine-specific NULL stringification. Scale: rollup is a single shuffle —
# Spark expands grouping sets map-side (Expand node) then one hash agg; at
# 100 TB the expand multiplies rows 3x pre-shuffle, still partial-agg'd.


def revenue_rollup(customer: DataFrame, nation: DataFrame, region: DataFrame) -> DataFrame:
    joined = (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.grouping_id().alias("lvl"),
            F.sum(_dec("c_acctbal")).cast("double").alias("acctbal_sum"),
            F.count(F.lit(1)).alias("n_customers"),
        )
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region_name"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation_name"),
            "lvl",
            "acctbal_sum",
            "n_customers",
        )
    )


REVENUE_ROLLUP_SQL = """
SELECT COALESCE(r_name, 'ALL') AS region_name,
       COALESCE(n_name, 'ALL') AS nation_name,
       GROUPING(r_name, n_name) AS lvl,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS acctbal_sum,
       COUNT(*) AS n_customers
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
"""


# ---------------------------------------------------------------------------
# Window-function battery: rank / row_number / lag / cumulative sum over one
# partition spec (per-customer order history). One shuffle on o_custkey
# serves all four functions — Spark evaluates them in a single Window node.
# The cumulative sum is decimal (exact under the frame's sequential scan);
# ORDER BY carries o_orderkey as total tie-break so every engine sees the
# same frame.


def window_battery(orders: DataFrame) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.row_number().over(w).alias("order_seq"),
        F.rank().over(
            Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc())
        ).alias("price_rank"),
        F.lag(_dec("o_totalprice"), 1).over(w).cast("double").alias("prev_price"),
        F.sum(_dec("o_totalprice")).over(w).cast("double").alias("spend_to_date"),
    )


WINDOW_BATTERY_SQL = """
SELECT o_orderkey,
       o_custkey,
       ROW_NUMBER() OVER w AS order_seq,
       RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS price_rank,
       CAST(LAG(CAST(o_totalprice AS DECIMAL(18,2)), 1) OVER w AS DOUBLE) AS prev_price,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS spend_to_date
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


# ---------------------------------------------------------------------------
# Semi / anti joins — the "does the other side have a match" pair. Spark
# plans LEFT SEMI / LEFT ANTI natively (no row duplication, build side only
# keeps keys); broadcastable when the filter side is small. At 100 TB the
# orders side would broadcast its distinct custkeys (bloom-filter-like)
# rather than shuffling customer.


def customers_without_orders(customer: DataFrame, orders: DataFrame) -> DataFrame:
    open_orders = orders.filter(F.col("o_orderstatus") != "F").select("o_custkey")
    return (
        customer.join(open_orders, customer.c_custkey == open_orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


CUSTOMERS_WITHOUT_ORDERS_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE NOT EXISTS (
  SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus <> 'F'
)
"""


def big_spender_customers(customer: DataFrame, orders: DataFrame) -> DataFrame:
    big = orders.filter(F.col("o_totalprice") > 400000.0).select("o_custkey")
    return (
        customer.join(big, customer.c_custkey == big.o_custkey, "left_semi")
        .select("c_custkey", "c_name", "c_acctbal")
    )


BIG_SPENDER_CUSTOMERS_SQL = """
SELECT c_custkey, c_name, c_acctbal
FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
"""


# ---------------------------------------------------------------------------
# Set operations: UNION / INTERSECT / EXCEPT over two customer cohorts
# (machinery segment vs urgent-order placers), tagged so one relation
# carries all three results. Each set op is one shuffle on the full row;
# Spark rewrites INTERSECT/EXCEPT to semi/anti joins under the hood.


def customer_cohort_setops(customer: DataFrame, orders: DataFrame) -> DataFrame:
    seg = customer.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )
    urgent = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("custkey"))
        .distinct()
    )
    return (
        seg.union(urgent).distinct().withColumn("cohort", F.lit("either"))
        .unionByName(seg.intersect(urgent).withColumn("cohort", F.lit("both")))
        .unionByName(seg.subtract(urgent).withColumn("cohort", F.lit("seg_only")))
    )


CUSTOMER_COHORT_SETOPS_SQL = """
WITH seg AS (SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
     urgent AS (SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT')
SELECT custkey, 'either' AS cohort FROM (SELECT custkey FROM seg UNION SELECT custkey FROM urgent)
UNION ALL
SELECT custkey, 'both' AS cohort FROM (SELECT custkey FROM seg INTERSECT SELECT custkey FROM urgent)
UNION ALL
SELECT custkey, 'seg_only' AS cohort FROM (SELECT custkey FROM seg EXCEPT SELECT custkey FROM urgent)
"""


# ---------------------------------------------------------------------------
# Pivot: order counts + decimal revenue by status x priority. Pivot values
# are pinned (never inferred) — inference is an extra job and nondeterministic
# column order. Conditional-aggregation oracle, same aliases.

_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


def order_priority_pivot(orders: DataFrame) -> DataFrame:
    short = {p: p.split("-")[0] for p in _PRIORITIES}  # p1..p5 column stems
    return (
        orders.groupBy("o_orderstatus")
        .pivot("o_orderpriority", _PRIORITIES)
        .agg(F.count(F.lit(1)))
        .select(
            "o_orderstatus",
            *[F.coalesce(F.col(f"`{p}`"), F.lit(0)).alias(f"p{short[p]}_cnt") for p in _PRIORITIES],
        )
    )


ORDER_PRIORITY_PIVOT_SQL = """
SELECT o_orderstatus,
       COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS p1_cnt,
       COUNT(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS p2_cnt,
       COUNT(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS p3_cnt,
       COUNT(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS p4_cnt,
       COUNT(*) FILTER (WHERE o_orderpriority = '5-LOW') AS p5_cnt
FROM orders
GROUP BY o_orderstatus
"""


# ---------------------------------------------------------------------------
# Interval (range) join: for each purchase event, count same-user clicks in
# the preceding hour. Equi key (user_id) + range predicate on ts — Spark
# plans the equi part as a hash/sort-merge join and evaluates the range as a
# post-join filter, so state stays bounded by the per-user partition. At
# 100 TB the right move is the same plus a coarse time-bucket equi key
# (bucket join pruning the cross product); user_id alone bounds it here.


def clicks_before_purchase(events: DataFrame) -> DataFrame:
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("u"),
        F.col("ts").alias("pts"),
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("ts").alias("cts")
    )
    joined = purchases.join(
        clicks,
        (purchases.u == clicks.cu)
        & (clicks.cts >= purchases.pts - F.expr("INTERVAL 1 HOUR"))
        & (clicks.cts < purchases.pts),
        "left",
    )
    return joined.groupBy("purchase_id", F.col("u").alias("user_id")).agg(
        F.count("cts").alias("clicks_1h_before")
    )


CLICKS_BEFORE_PURCHASE_SQL = """
SELECT p.event_id AS purchase_id,
       p.user_id AS user_id,
       COUNT(c.ts) AS clicks_1h_before
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON c.user_id = p.user_id
 AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts < p.ts
GROUP BY p.event_id, p.user_id
"""


# ---------------------------------------------------------------------------
# TF-IDF top terms per document. idf is the BM25-style *ratio*
# (N - df + 0.5)/(df + 0.5) — deliberately log-free: ln() comes from libm
# and differs across engines in the last ulp, which flips q6 boundaries;
# one division + one multiply are exact IEEE ops on identical inputs.
# Two shuffles: token explode→(doc,term) count, then df by term (broadcast
# back — the vocabulary is tiny relative to the corpus).


def tfidf_top_terms(documents: DataFrame, k: int = 3) -> DataFrame:
    tokens = documents.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.lower("text"), "[^a-z]+"), lambda t: t != "")
        ).alias("term"),
    )
    # tf feeds BOTH the df rollup and the scoring join — persist so the
    # tokenize+explode pass (the expensive part) runs once. At cluster scale
    # this is the pipeline's materialized stage boundary.
    tf = tokens.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf")).persist()
    df_rel = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    # doc_id is the table's key: plain count() == COUNT(DISTINCT doc_id) and
    # resolves from parquet row-group metadata — no shuffle.
    n_docs = documents.count()
    scored = tf.join(F.broadcast(df_rel), "term").withColumn(
        "score",
        q6(
            F.col("tf")
            * (
                (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            )
        ),
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("doc_id", "term", "tf", "df", "score", "rk")
    )


def tfidf_top_terms_sql(k: int = 3) -> str:
    score = q6_sql(
        "tf * ((SELECT CAST(COUNT(DISTINCT doc_id) AS DOUBLE) FROM documents) - df + 0.5) / (df + 0.5)"
    )
    return f"""
WITH tokens AS (
  SELECT doc_id, t.term
  FROM documents,
       LATERAL (SELECT UNNEST(string_split_regex(lower(text), '[^a-z]+')) AS term) t
  WHERE t.term <> ''
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM tokens GROUP BY doc_id, term
), dfr AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
), scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, dfr.df,
         {score} AS score
  FROM tf JOIN dfr USING (term)
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rk
  FROM scored
)
SELECT doc_id, term, tf, df, score, rk FROM ranked WHERE rk <= {k}
"""


# ---------------------------------------------------------------------------
# Corpus bigram frequencies — adjacent-token pairs per document, global
# top-N. Bigrams via codegen-friendly arrays_zip(slice, slice) (no HOF
# lambda over a re-evaluated split: see the measured re-inlining trap in
# operators/dedup.py); one shuffle for the count, top-N via a single-
# partition sort of the (tiny) distinct-bigram relation.


def bigram_top(documents: DataFrame, n: int = 20) -> DataFrame:
    toks = documents.select(
        F.filter(F.split(F.lower("text"), "[^a-z]+"), lambda t: t != "").alias("w")
    ).filter(F.size("w") >= 2)
    pairs = toks.select(
        F.explode(
            F.arrays_zip(
                F.slice("w", 1, F.size("w") - 1).alias("a"),
                F.slice("w", 2, F.size("w") - 1).alias("b"),
            )
        ).alias("p")
    ).select(F.concat_ws(" ", "p.a", "p.b").alias("bigram"))
    counted = pairs.groupBy("bigram").agg(F.count(F.lit(1)).alias("cnt"))
    # top-k via TakeOrderedAndProject (per-partition heap), not a global
    # window over every distinct bigram; rank window covers only n rows
    top = counted.orderBy(F.col("cnt").desc(), "bigram").limit(n)
    w = Window.orderBy(F.col("cnt").desc(), F.col("bigram"))
    return top.withColumn("rk", F.row_number().over(w))


def bigram_top_sql(n: int = 20) -> str:
    return f"""
WITH toks AS (
  SELECT list_filter(string_split_regex(lower(text), '[^a-z]+'), t -> t <> '') AS w
  FROM documents
), pairs AS (
  SELECT w[i] || ' ' || w[i + 1] AS bigram
  FROM toks, LATERAL (SELECT UNNEST(range(1, len(w))) AS i)
  WHERE len(w) >= 2
), counted AS (
  SELECT bigram, COUNT(*) AS cnt FROM pairs GROUP BY bigram
)
SELECT bigram, cnt, rk FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY cnt DESC, bigram) AS rk FROM counted
) WHERE rk <= {n}
"""


# ---------------------------------------------------------------------------
# Correlation battery WITHOUT float-order sensitivity: Pearson r from exact
# decimal moment sums. o_totalprice/c_acctbal carry <=2 decimals, so every
# product x*y is exactly representable in DECIMAL(38,4) and the sums are
# order-independent; the final r = (n*Sxy - Sx*Sy)/(sqrt(...)*sqrt(...)) is
# a fixed sequence of IEEE doubles — bit-identical across engines (sqrt IS
# IEEE-exact, unlike log/exp). Never use engine-native corr()/stddev() in
# an oracle-compared output: their accumulation order is engine-defined.

DEC4 = "decimal(38,4)"


def segment_spend_correlation(customer: DataFrame, orders: DataFrame) -> DataFrame:
    spend = orders.groupBy("o_custkey").agg(
        F.sum(_dec("o_totalprice")).alias("spend_dec")
    )
    joined = customer.join(
        spend, customer.c_custkey == spend.o_custkey, "inner"
    ).select(
        "c_mktsegment",
        _dec("c_acctbal").alias("x"),
        F.col("spend_dec").cast(DEC).alias("y"),
    )
    moments = joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.col("x").cast(DEC4)).cast("double").alias("sx"),
        F.sum(F.col("y").cast(DEC4)).cast("double").alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast(DEC4)).cast("double").alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast(DEC4)).cast("double").alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast(DEC4)).cast("double").alias("syy"),
    )
    r = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.sqrt(F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * F.sqrt(F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return moments.select(
        "c_mktsegment",
        F.col("n").cast("long").alias("n_customers"),
        q6(r).alias("pearson_r"),
    )


SEGMENT_SPEND_CORRELATION_SQL = f"""
WITH spend AS (
  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS spend_dec
  FROM orders GROUP BY o_custkey
), joined AS (
  SELECT c_mktsegment,
         CAST(c_acctbal AS DECIMAL(18,2)) AS x,
         CAST(spend_dec AS DECIMAL(18,2)) AS y
  FROM customer JOIN spend ON c_custkey = o_custkey
), moments AS (
  SELECT c_mktsegment,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CAST(x AS DECIMAL(38,4))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(y AS DECIMAL(38,4))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(x * y AS DECIMAL(38,4))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(x * x AS DECIMAL(38,4))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(y * y AS DECIMAL(38,4))) AS DOUBLE) AS syy
  FROM joined GROUP BY c_mktsegment
)
SELECT c_mktsegment,
       CAST(n AS BIGINT) AS n_customers,
       {q6_sql('(n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))')} AS pearson_r
FROM moments
"""


# ---------------------------------------------------------------------------
# Approximate sketches — HLL distinct counts + quantile sketch per event
# type. Engine-specific estimators can't hash-match an oracle; the
# correctness contract is the error bound vs the exact answer
# (tests/test_extensions.py asserts |approx-exact|/exact <= 5% for HLL at
# rsd=0.02 and quantile rank error <= accuracy). This IS the 100 TB path:
# exact distinct-count shuffles every value, the sketch ships 1.5 KB per
# partition.


def sketch_profile(events: DataFrame) -> DataFrame:
    """Sketch profile with scalar-only output (value_p50/p95/p99 columns
    rather than one array column): every downstream consumer — including
    the driver's pandas canonicalizer, which can't hash list cells — gets
    hashable rows, and the quantile sketch still runs ONCE (Catalyst
    collapses the three element_at projections onto a single
    percentile_approx aggregate)."""
    s = events.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.percentile_approx("value", [0.5, 0.95, 0.99], 10000).alias("_q"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return s.select(
        "event_type",
        "approx_users",
        F.element_at("_q", 1).alias("value_p50"),
        F.element_at("_q", 2).alias("value_p95"),
        F.element_at("_q", 3).alias("value_p99"),
        "n_events",
    )


def sketch_profile_flat(events: DataFrame) -> DataFrame:
    """Single-string-quantiles twin of ``sketch_profile`` (kept for API
    stability now that the base op is scalar-only): the three quantiles
    pipe-joined into one string column. Sketches are engine-specific, so
    both stay rows-only checks."""
    s = sketch_profile(events)
    q = F.concat_ws(
        "|",
        *[F.round(F.col(c), 6).cast("string") for c in ("value_p50", "value_p95", "value_p99")],
    )
    return s.select("event_type", "approx_users", q.alias("value_quantiles"), "n_events")


# ---------------------------------------------------------------------------
# Range-frame rolling aggregate: 7-day trailing spend per customer. The
# RANGE frame is over epoch seconds on the Spark side and a calendar
# interval on the DuckDB side — identical inclusive bounds; peers (same
# timestamp) enter the frame together so ties can't reorder results. One
# shuffle on the key; the frame scan is a per-partition two-pointer pass.


def rolling_spend_7d(orders: DataFrame) -> DataFrame:
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").cast("timestamp").cast("long"))
        .rangeBetween(-7 * 86400, 0)
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_day"),
        F.sum(_dec("o_totalprice")).over(w).cast("double").alias("spend_7d"),
        F.count(F.lit(1)).over(w).cast("long").alias("orders_7d"),
    )


ROLLING_SPEND_7D_SQL = """
SELECT o_orderkey,
       o_custkey,
       strftime(o_orderdate, '%Y-%m-%d') AS order_day,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS spend_7d,
       CAST(COUNT(*) OVER w AS BIGINT) AS orders_7d
FROM orders
WINDOW w AS (
  PARTITION BY o_custkey ORDER BY o_orderdate
  RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW
)
"""


# ---------------------------------------------------------------------------
# Fixed-bin histogram: 10 bins over [0, 500) per event type — pure floor
# arithmetic (identical in any engine; width_bucket's edge semantics are
# not portable), one partial+final count agg. Sketch-free exact histogram:
# the shuffle carries (type x bin) partials only.

HIST_LO, HIST_HI, HIST_BINS = 0.0, 500.0, 10


def value_histogram(events: DataFrame) -> DataFrame:
    width = (HIST_HI - HIST_LO) / HIST_BINS
    bin_ = F.least(
        F.lit(HIST_BINS - 1),
        F.greatest(F.lit(0), F.floor((F.col("value") - HIST_LO) / width)),
    ).cast("long")
    return (
        events.groupBy("event_type", bin_.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "event_type",
            "bin",
            (F.lit(HIST_LO) + F.col("bin") * width).alias("bin_lo"),
            "n",
        )
    )


VALUE_HISTOGRAM_SQL = f"""
WITH binned AS (
  SELECT event_type,
         CAST(least({HIST_BINS - 1}, greatest(0, floor((value - {HIST_LO}) / {(HIST_HI - HIST_LO) / HIST_BINS}))) AS BIGINT) AS bin
  FROM events
)
SELECT event_type, bin,
       {HIST_LO} + bin * {(HIST_HI - HIST_LO) / HIST_BINS} AS bin_lo,
       COUNT(*) AS n
FROM binned GROUP BY event_type, bin
"""


# ---------------------------------------------------------------------------
# Snapshot diff: full-outer key join classifying added / removed / changed /
# unchanged — the batch face of CDC (what a MERGE planner consumes). The two
# snapshots here are deterministic derivations of `orders` (mod-key deletes
# and price bumps) so the oracle sees the same inputs; the operator itself
# takes any two keyed DataFrames. One shuffle per side on the key; at scale
# both snapshots bucketed by key make it exchange-free (sinks.write_bucketed).


def snapshot_diff(old: DataFrame, new: DataFrame, key: str, cmp_col: str) -> DataFrame:
    o = old.select(F.col(key).alias("k"), F.col(cmp_col).alias("old_val"))
    n = new.select(F.col(key).alias("nk"), F.col(cmp_col).alias("new_val"))
    j = o.join(n, o.k == n.nk, "full_outer")
    status = (
        F.when(F.col("k").isNull(), F.lit("added"))
        .when(F.col("nk").isNull(), F.lit("removed"))
        .when(F.col("old_val") != F.col("new_val"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(
        F.coalesce("k", "nk").alias(key),
        status.alias("status"),
        F.col("old_val").alias(f"old_{cmp_col}"),
        F.col("new_val").alias(f"new_{cmp_col}"),
    )


def orders_snapshot_diff(orders: DataFrame) -> DataFrame:
    old = orders.filter(F.col("o_orderkey") % 7 != 0)
    new = orders.filter(F.col("o_orderkey") % 11 != 0).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 5 == 0, F.col("o_totalprice") * 2
        ).otherwise(F.col("o_totalprice")),
    )
    return snapshot_diff(old, new, "o_orderkey", "o_totalprice")


ORDERS_SNAPSHOT_DIFF_SQL = """
WITH old AS (
  SELECT o_orderkey AS k, o_totalprice AS old_val FROM orders WHERE o_orderkey % 7 <> 0
), new AS (
  SELECT o_orderkey AS nk,
         CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice * 2 ELSE o_totalprice END AS new_val
  FROM orders WHERE o_orderkey % 11 <> 0
)
SELECT COALESCE(k, nk) AS o_orderkey,
       CASE WHEN k IS NULL THEN 'added'
            WHEN nk IS NULL THEN 'removed'
            WHEN old_val <> new_val THEN 'changed'
            ELSE 'unchanged' END AS status,
       old_val AS old_o_totalprice,
       new_val AS new_o_totalprice
FROM old FULL OUTER JOIN new ON k = nk
"""


# ---------------------------------------------------------------------------
# Table profiler: per-column null / distinct / range stats in ONE pass —
# the data-quality report every ingestion job runs first. All 6-per-column
# aggregates ride a single job; multiple COUNT(DISTINCT)s lower to one
# Expand (xNcols rows map-side) + one shuffle, the same shape Spark gives
# GROUPING SETS. Numeric and timestamp ranges surface as doubles (epoch
# seconds for time) — engine-native string rendering of doubles/timestamps
# is NOT portable, so non-numeric columns report NULL ranges rather than
# lossy casts.

_NUMERIC = {"long", "bigint", "int", "integer", "double", "float", "smallint"}


def profile_table(df: DataFrame, table_name: str, exact: bool = False) -> DataFrame:
    """Single-pass column profile. Default distinct counts are HLL
    (``approx_count_distinct``, rsd 2%): one ordinary aggregation, ~1.5 KB
    of sketch per column per partition. ``exact=True`` switches to
    ``countDistinct`` — Catalyst plans multi-column distinct via Expand,
    fanning every row out x#columns before the shuffle, which is the wrong
    default at 100 TB; it exists as the oracle twin (cross-engine exact
    value check) and for small-table use."""
    aggs, rows = [], []
    for f in df.schema.fields:
        # timestamp_ntz vs timestamp is a session-zone spelling, not a
        # semantic difference the report consumer cares about.
        c, t = f.name, f.dataType.simpleString().replace("timestamp_ntz", "timestamp")
        distinct = (
            F.countDistinct(c) if exact else F.approx_count_distinct(c, rsd=0.02)
        )
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__rows"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast("long").alias(f"{c}__nulls"),
            distinct.alias(f"{c}__distinct"),
        ]
        if t in _NUMERIC:
            lo, hi = F.min(F.col(c)).cast("double"), F.max(F.col(c)).cast("double")
        elif t.startswith("timestamp"):
            lo = F.min(F.col(c).cast("timestamp")).cast("double")
            hi = F.max(F.col(c).cast("timestamp")).cast("double")
        else:
            lo, hi = F.lit(None).cast("double"), F.lit(None).cast("double")
        aggs += [lo.alias(f"{c}__min"), hi.alias(f"{c}__max")]
        rows.append((c, t))
    one = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.lit(t).alias("dtype"),
                F.col(f"{c}__rows").alias("n_rows"),
                F.col(f"{c}__nulls").alias("n_nulls"),
                F.col(f"{c}__distinct").alias("n_distinct"),
                F.col(f"{c}__min").alias("min_val"),
                F.col(f"{c}__max").alias("max_val"),
            )
            for c, t in rows
        ]
    )
    return (
        one.select(F.explode(per_col).alias("s"))
        .select(F.lit(table_name).alias("table_name"), "s.*")
    )


def profile_orders(orders: DataFrame) -> DataFrame:
    """Exact variant — the oracle twin (COUNT(DISTINCT ...) matches SQL)."""
    return profile_table(orders, "orders", exact=True)


def profile_orders_hll(orders: DataFrame) -> DataFrame:
    """The scale default: HLL distinct counts, no Expand in the plan."""
    return profile_table(orders, "orders", exact=False)


PROFILE_ORDERS_SQL = """
SELECT 'orders' AS table_name, 'o_orderkey' AS column_name, 'bigint' AS dtype,
       COUNT(*) AS n_rows, COUNT(*) - COUNT(o_orderkey) AS n_nulls,
       COUNT(DISTINCT o_orderkey) AS n_distinct,
       CAST(MIN(o_orderkey) AS DOUBLE) AS min_val, CAST(MAX(o_orderkey) AS DOUBLE) AS max_val
FROM orders
UNION ALL
SELECT 'orders', 'o_custkey', 'bigint', COUNT(*), COUNT(*) - COUNT(o_custkey),
       COUNT(DISTINCT o_custkey), CAST(MIN(o_custkey) AS DOUBLE), CAST(MAX(o_custkey) AS DOUBLE)
FROM orders
UNION ALL
SELECT 'orders', 'o_orderstatus', 'string', COUNT(*), COUNT(*) - COUNT(o_orderstatus),
       COUNT(DISTINCT o_orderstatus), NULL, NULL
FROM orders
UNION ALL
SELECT 'orders', 'o_totalprice', 'double', COUNT(*), COUNT(*) - COUNT(o_totalprice),
       COUNT(DISTINCT o_totalprice), CAST(MIN(o_totalprice) AS DOUBLE), CAST(MAX(o_totalprice) AS DOUBLE)
FROM orders
UNION ALL
SELECT 'orders', 'o_orderdate', 'timestamp', COUNT(*), COUNT(*) - COUNT(o_orderdate),
       COUNT(DISTINCT o_orderdate), CAST(epoch(MIN(o_orderdate)) AS DOUBLE), CAST(epoch(MAX(o_orderdate)) AS DOUBLE)
FROM orders
UNION ALL
SELECT 'orders', 'o_orderpriority', 'string', COUNT(*), COUNT(*) - COUNT(o_orderpriority),
       COUNT(DISTINCT o_orderpriority), NULL, NULL
FROM orders
"""


# ---------------------------------------------------------------------------
# TPC-H-shape multi-join battery (extension). The reference's joins are all
# two-table equi-joins; a real analytics migration brings 3-6-table star
# joins where the *plan* is the product: dimension sides must broadcast,
# the fact-fact join must shuffle exactly once on the shared key, and the
# final top-k must not collect the full aggregate. Revenue uses the same
# int64-cents kernel as pricing_summary (operators/relational.py) so sums
# are order-independent and bit-identical to the DuckDB oracle.
#
# Scale (100 TB): lineitem⋈orders is the only big shuffle; customer/
# supplier/nation/region broadcast (<1 GB even at sf100k for nation/region,
# customer at real TPC-H 100TB is ~15B rows — there the customer filter
# keeps the semi-join side small enough for a bloom/AQE strategy, and the
# code keeps the join declarative so Catalyst can choose). The top-10 is
# a TakeOrderedAndProject: per-partition heap, no global sort.


def _revenue_cents() -> Column:
    pc = F.round(F.col("l_extendedprice") * 100).cast("long")
    dc = F.round(F.col("l_discount") * 100).cast("long")
    return pc * (100 - dc)


_REVENUE_CENTS_SQL = (
    "CAST(round(l_extendedprice * 100) AS BIGINT)"
    " * (100 - CAST(round(l_discount * 100) AS BIGINT))"
)


def shipping_priority(
    customer: DataFrame, orders: DataFrame, lineitem: DataFrame, k: int = 10
) -> DataFrame:
    """TPC-H Q3 shape: top-k open orders by revenue for one market segment.

    Filters are applied *before* the joins so they push into the parquet
    scans; the deterministic tie-break (revenue desc, date, orderkey) makes
    top-k stable across engines.
    """
    cut = F.lit("1998-06-01").cast("timestamp")
    cust = customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    ords = orders.filter(F.col("o_orderdate") < cut).select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
    )
    items = lineitem.filter(F.col("l_shipdate") > cut).select(
        "l_orderkey", _revenue_cents().alias("_rev")
    )
    return (
        # cust (1/5 of customers) is broadcast-small at bench SF and auto-
        # broadcasts; unhinted so a 100 TB run can fall back to shuffle.
        items.join(ords, items.l_orderkey == ords.o_orderkey)
        .join(cust, ords.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg((F.sum("_rev") / 10000.0).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(k)
    )


def shipping_priority_sql(k: int = 10) -> str:
    """Oracle twin of :func:`shipping_priority` — ``k`` is interpolated so
    a non-default top-k can't silently diverge from the registered SQL."""
    return f"""
SELECT l_orderkey, o_orderdate, o_orderpriority,
       SUM({_REVENUE_CENTS_SQL}) / 10000.0 AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT {k}
"""


SHIPPING_PRIORITY_SQL = shipping_priority_sql()


def local_supplier_volume(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
) -> DataFrame:
    """TPC-H Q5 shape: revenue per nation where customer and supplier sit
    in the same nation, one region, one year. Exercises a 6-table join
    with a non-key equality (c_nationkey = s_nationkey) applied post-join.
    """
    y0 = F.lit("1996-01-01").cast("timestamp")
    y1 = F.lit("1997-01-01").cast("timestamp")
    asia_nations = (
        nation.join(region, nation.n_regionkey == region.r_regionkey)
        .filter(F.col("r_name") == "ASIA")
        .select("n_nationkey", "n_name")
    )
    ords = orders.filter((F.col("o_orderdate") >= y0) & (F.col("o_orderdate") < y1)).select(
        "o_orderkey", "o_custkey"
    )
    items = lineitem.select("l_orderkey", "l_suppkey", _revenue_cents().alias("_rev"))
    return (
        items.join(ords, items.l_orderkey == ords.o_orderkey)
        .join(F.broadcast(supplier.select("s_suppkey", "s_nationkey")),
              items.l_suppkey == F.col("s_suppkey"))
        # customer is NOT hinted: at 100 TB it is billions of rows — the
        # join stays declarative so AQE picks shuffle-hash vs broadcast
        # from runtime stats (at test SF it auto-broadcasts anyway).
        .join(customer.select("c_custkey", "c_nationkey"),
              (ords.o_custkey == F.col("c_custkey"))
              & (F.col("c_nationkey") == F.col("s_nationkey")))
        .join(F.broadcast(asia_nations), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg((F.sum("_rev") / 10000.0).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


LOCAL_SUPPLIER_VOLUME_SQL = f"""
SELECT n_name, SUM({_REVENUE_CENTS_SQL}) / 10000.0 AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


# ---------------------------------------------------------------------------
# Funnel analysis — strictly-ordered stage progression (view → click →
# purchase: each stage's first event must come AFTER the previous stage's
# first event). The sequential dependency makes this a chained conditional-
# min aggregation: stage N's per-user table joins back to events filtered
# to stage N+1's type. All three aggregations shuffle on user_id, so at
# 100 TB the exchange is reused (same key, same partitioning — Catalyst
# plans one Exchange per branch over the SAME scan, and the per-user
# intermediate is one row per user, pruned to two columns). The collect-
# events-per-user-array alternative is one shuffle but unbounded per-user
# state under heavy-user skew; chained aggs keep state at one timestamp
# per user per stage.


def funnel_stages(events: DataFrame) -> DataFrame:
    """(stage, stage_order, n_users) for the ordered funnel
    view → click → purchase."""
    t_view = (
        events.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    t_click = (
        events.filter(F.col("event_type") == "click")
        .join(t_view, "user_id")
        .filter(F.col("ts") > F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    t_purchase = (
        events.filter(F.col("event_type") == "purchase")
        .join(t_click, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )

    def _count(df: DataFrame, stage: str, order: int) -> DataFrame:
        return df.agg(
            F.lit(stage).alias("stage"),
            F.lit(order).cast("int").alias("stage_order"),
            F.count(F.lit(1)).cast("long").alias("n_users"),
        )

    return (
        _count(t_view, "view", 1)
        .unionByName(_count(t_click, "click", 2))
        .unionByName(_count(t_purchase, "purchase", 3))
    )


FUNNEL_STAGES_SQL = """
WITH t_view AS (
  SELECT user_id, MIN(ts) AS t0 FROM events WHERE event_type = 'view' GROUP BY user_id
),
t_click AS (
  SELECT e.user_id, MIN(e.ts) AS t1
  FROM events e JOIN t_view v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts > v.t0
  GROUP BY e.user_id
),
t_purchase AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN t_click c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.t1
  GROUP BY e.user_id
)
SELECT 'view' AS stage, CAST(1 AS INT) AS stage_order, COUNT(*) AS n_users FROM t_view
UNION ALL
SELECT 'click', 2, COUNT(*) FROM t_click
UNION ALL
SELECT 'purchase', 3, COUNT(*) FROM t_purchase
"""


# ---------------------------------------------------------------------------
# Cohort retention — users bucketed by first-seen week (vs a fixed epoch
# anchor, not a global-min subquery: the anchor keeps the op a pure
# two-aggregation plan with no extra all-reduce) × activity-week offset.
# COUNT(DISTINCT user_id) inside each (cohort, offset) cell is exact —
# Spark plans it as a two-phase Expand/agg; the first-seen table joins
# back on user_id, the same key as its own groupBy, so the join reuses
# the aggregation's partitioning (no second shuffle of the big side).

_COHORT_ANCHOR = "2024-01-01"


def cohort_retention(events: DataFrame) -> DataFrame:
    first_seen = events.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("d0"))
    anchor = F.lit(_COHORT_ANCHOR).cast("date")
    return (
        events.select("user_id", F.to_date("ts").alias("d"))
        .join(first_seen, "user_id")
        .select(
            F.floor(F.datediff(F.col("d0"), anchor) / 7).cast("long").alias("cohort_week"),
            F.floor(F.datediff(F.col("d"), F.col("d0")) / 7).cast("long").alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct("user_id").cast("long").alias("n_users"))
    )


COHORT_RETENTION_SQL = f"""
WITH first_seen AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS d0 FROM events GROUP BY user_id
)
SELECT CAST(FLOOR(date_diff('day', DATE '{_COHORT_ANCHOR}', d0) / 7.0) AS BIGINT) AS cohort_week,
       CAST(FLOOR(date_diff('day', d0, CAST(e.ts AS DATE)) / 7.0) AS BIGINT) AS week_offset,
       COUNT(DISTINCT e.user_id) AS n_users
FROM events e JOIN first_seen f ON e.user_id = f.user_id
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Winsorization — outlier clipping at exact per-group percentiles, the
# numeric-feature twin of text quality filtering. Percentiles are
# nearest-rank (value at ceil(p·n)), the same cross-engine-deterministic
# trick as text.length_percentiles: interpolating percentile functions
# differ between engines, rank arithmetic does not. One window shuffle on
# the group key to rank, a ~|groups|-row bounds table broadcast back, and
# a codegen'd clamp — the big side is scanned twice but shuffled once.


def winsorize_values(events: DataFrame, lo_p: float = 0.01, hi_p: float = 0.99) -> DataFrame:
    # NULL values are excluded from ranking on BOTH engines: Spark windows
    # sort NULLS FIRST ascending, DuckDB NULLS LAST, so a nullable value
    # column would shift every rank and diverge the bounds cross-engine.
    # (A NULL value row still appears in the output — its clamp is NULL.)
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    ranked = (
        events.select("event_id", "event_type", "value")
        .filter(F.col("value").isNotNull())
        .withColumn("rank", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(Window.partitionBy("event_type")))
    )
    at = lambda p: F.max(  # noqa: E731 — nearest-rank
        F.when(F.col("rank") == F.ceil(F.col("n") * p), F.col("value"))
    )
    bounds = ranked.groupBy("event_type").agg(at(lo_p).alias("lo"), at(hi_p).alias("hi"))
    clipped = F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi"))
    return (
        events.select("event_id", "event_type", "value")
        .join(F.broadcast(bounds), "event_type")
        .select(
            "event_id",
            "event_type",
            "value",
            clipped.alias("value_winsorized"),
            (clipped != F.col("value")).alias("was_clipped"),
        )
    )


def winsorize_values_sql(lo_p: float = 0.01, hi_p: float = 0.99) -> str:
    return f"""
WITH ranked AS (
  SELECT event_id, event_type, value,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rank,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events
  WHERE value IS NOT NULL
),
bounds AS (
  SELECT event_type,
         MAX(CASE WHEN rank = CEIL(n * {lo_p}) THEN value END) AS lo,
         MAX(CASE WHEN rank = CEIL(n * {hi_p}) THEN value END) AS hi
  FROM ranked GROUP BY event_type
)
SELECT e.event_id, e.event_type, e.value,
       LEAST(GREATEST(e.value, b.lo), b.hi) AS value_winsorized,
       LEAST(GREATEST(e.value, b.lo), b.hi) <> e.value AS was_clipped
FROM events e JOIN bounds b ON e.event_type = b.event_type
"""


# ---------------------------------------------------------------------------
# Rolling 7-day active users — the distinct-over-sliding-window metric
# (WAU per day). COUNT(DISTINCT) doesn't compose over RANGE frames, so the
# textbook formulation is a range join (day grid × activity pairs) — at
# 100 TB that's |days|·|pairs| comparisons. This plan is linear instead:
# each distinct (day, user) pair explodes into the ≤7 report days it
# contributes to (map-side sequence), then one distinct-count per report
# day. The oracle keeps the range-join formulation — same relation, two
# shapes, hash-compared.


def rolling_wau(events: DataFrame, window_days: int = 7) -> DataFrame:
    pairs = events.select(F.to_date("ts").alias("d"), "user_id").distinct()
    observed = pairs.select("d").distinct()
    contrib = pairs.select(
        F.explode(
            F.expr(f"sequence(d, date_add(d, {window_days - 1}), interval 1 day)")
        ).alias("report_day"),
        "user_id",
    )
    return (
        contrib.join(
            F.broadcast(observed.withColumnRenamed("d", "report_day")),
            "report_day",
            "left_semi",  # only report days that actually occur in the data
        )
        .groupBy("report_day")
        .agg(F.count_distinct("user_id").cast("long").alias("wau"))
        # dates round-trip the oracle's pandas bridge as timestamps — emit
        # the ISO string so both engines hash the same cell
        .select(F.date_format("report_day", "yyyy-MM-dd").alias("report_day"), "wau")
    )


def rolling_wau_sql(window_days: int = 7) -> str:
    return f"""
WITH pairs AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
days AS (SELECT DISTINCT d FROM pairs)
SELECT strftime(days.d, '%Y-%m-%d') AS report_day, COUNT(DISTINCT p.user_id) AS wau
FROM days JOIN pairs p
  ON p.d BETWEEN days.d - INTERVAL {window_days - 1} DAY AND days.d
GROUP BY days.d
"""


# ---------------------------------------------------------------------------
# Banded interval join — the 100 TB plan for time-range joins. The direct
# formulation (clicks_before_purchase above: equi on user + range residual)
# makes Spark evaluate every click x purchase pair WITHIN a user — fine for
# consumer traffic, quadratic for a power user / bot key. Banding restores
# a pure equi-join: each click maps to its one hour bucket, each purchase
# fans out to the (exactly two) buckets its 1-hour lookback can touch, the
# join key becomes (user, bucket), and the exact range check runs as a
# residual filter on candidates that are already hour-colocated. Candidate
# volume per purchase is bounded by the user's events in TWO hours, not
# their lifetime history. Oracle: identical relation to
# CLICKS_BEFORE_PURCHASE_SQL (the banding is plan, not semantics).


def clicks_before_purchase_banded(events: DataFrame) -> DataFrame:
    """Same result as :func:`clicks_before_purchase`, banded-equi-join plan.

    Bucket arithmetic: with window [pts-1h, pts) and 1h buckets, a
    qualifying click's bucket floor(cts/3600) can only be floor(pts/3600)
    or floor(pts/3600)-1, so each purchase explodes to exactly those two
    (user, bucket) keys — constant fan-out, no range-join blowup."""
    sec = F.col("pts").cast("long")
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("u"),
            F.col("ts").alias("pts"),
        )
        .withColumn(
            "bucket",
            F.explode(F.array(F.floor(sec / 3600) - 1, F.floor(sec / 3600))),
        )
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"),
        F.col("ts").alias("cts"),
        F.floor(F.col("ts").cast("long") / 3600).alias("bucket"),
    )
    hits = (
        purchases.join(
            clicks, (purchases.u == clicks.cu) & (purchases.bucket == clicks.bucket)
        )
        .filter(
            (F.col("cts") >= F.col("pts") - F.expr("INTERVAL 1 HOUR"))
            & (F.col("cts") < F.col("pts"))
        )
        .groupBy("purchase_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    base = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id"
    )
    return base.join(hits, "purchase_id", "left").select(
        "purchase_id",
        "user_id",
        F.coalesce("n", F.lit(0)).cast("long").alias("clicks_1h_before"),
    )


# ---------------------------------------------------------------------------
# Okapi BM25 top terms (Robertson et al., TREC-3) — the retrieval-grade
# upgrade of tfidf_top_terms: same log-free idf ratio (cross-engine ulp
# safety, see tfidf note), plus the BM25 saturation (k1) and document-
# length normalization (b) that tf-idf lacks. All arithmetic is division/
# multiply on exact integers and the two literals k1, b — identical IEEE
# expression trees on both engines, q6-quantized.

BM25_K1 = 1.2
BM25_B = 0.75


def bm25_top_terms(documents: DataFrame, k: int = 3) -> DataFrame:
    from flink_streaming_etl_spark.operators.text import _lm_tokens, lm_tf_relation

    # shared memoized (doc_id, term, tf) substrate — identical plan to the
    # unigram-LM rollup, so BM25 and fluency share ONE cached relation.
    tf = lm_tf_relation(_lm_tokens(documents))
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    df_rel = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = documents.count()
    # empty corpus → SUM is NULL; 1 keeps the plan valid (no rows score)
    total_tokens = tf.agg(F.sum("tf")).collect()[0][0] or 1
    # dl/avgdl computed as dl * n_docs / total_tokens — exact ints into one
    # multiply + one divide, no intermediate avgdl rounding difference.
    norm = (
        F.lit(float(BM25_K1)) * (F.lit(1.0) - F.lit(float(BM25_B)))
        + F.lit(float(BM25_K1)) * F.lit(float(BM25_B))
        * (F.col("dl") * F.lit(float(n_docs)) / F.lit(float(total_tokens)))
    )
    idf = (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    # (k1 + 1.0) folds in-plan, mirroring the SQL's in-engine addition (a
    # Python-side precomputed 2.2 literal could round differently).
    score = q6(
        idf
        * (F.col("tf") * (F.lit(float(BM25_K1)) + F.lit(1.0)))
        / (F.col("tf") + norm)
    )
    scored = (
        tf.join(F.broadcast(df_rel), "term")
        .join(dl, "doc_id")
        .withColumn("score", score)
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("doc_id", "term", "tf", "df", "dl", "score", "rk")
    )


def bm25_top_terms_sql(k: int = 3) -> str:
    # ::DOUBLE on the k1/b literals: DuckDB would otherwise parse 1.2 as
    # DECIMAL(2,1) and run exact decimal arithmetic where Spark runs IEEE
    # double — identical expression trees require identical operand types.
    k1, b = f"({BM25_K1}::DOUBLE)", f"({BM25_B}::DOUBLE)"
    score = q6_sql(
        f"((nd.n - df + 0.5) / (df + 0.5))"
        f" * (tf * ({k1} + 1.0))"
        f" / (tf + ({k1} * (1.0 - {b}) + {k1} * {b} * (dl * nd.n / tt.t)))"
    )
    return f"""
WITH tokens AS (
  SELECT doc_id, t.term
  FROM documents,
       LATERAL (SELECT UNNEST(string_split_regex(lower(text), '[^a-z]+')) AS term) t
  WHERE t.term <> ''
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM tokens GROUP BY doc_id, term
), dlr AS (
  SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id
), dfr AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
), nd AS (SELECT CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS n FROM documents),
tt AS (SELECT CAST(SUM(tf) AS DOUBLE) AS t FROM tf),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, dfr.df, dlr.dl, {score} AS score
  FROM tf JOIN dfr USING (term) JOIN dlr USING (doc_id), nd, tt
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rk
  FROM scored
)
SELECT doc_id, term, tf, df, dl, score, rk FROM ranked WHERE rk <= {k}
"""


# ---------------------------------------------------------------------------
# Key-skew diagnostics — the report an engine operator reads before picking
# a shuffle strategy (salting factor, AQE skew-join thresholds): per-key
# row-count distribution for a join/agg key, as one summary row. Scale
# shape: the only data-scale stage is the per-key count (one shuffle with
# map-side combine); percentiles are then computed over the count HISTOGRAM
# (one row per distinct load value — bounded by max key load, not key
# count), so no global sort over the key relation ever happens. The
# nearest-rank percentile (winsorize precedent) becomes "smallest load
# whose cumulative key-frequency reaches ceil(n_keys·p)". max_share_ppm is
# exact integer arithmetic (long DIV), never a double near a boundary.


def key_skew_report(events: DataFrame, key: str = "user_id") -> DataFrame:
    per_key = events.groupBy(key).agg(F.count(F.lit(1)).alias("n"))
    stats = per_key.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("n").cast("long").alias("n_rows"),
        F.max("n").cast("long").alias("max_rows"),
        F.max_by(
            key, F.struct(F.col("n").alias("n"), (-F.col(key)).alias("nk"))
        ).cast("long").alias("hottest_key"),
    )
    hist = per_key.groupBy("n").agg(F.count(F.lit(1)).alias("freq"))
    # the histogram is load-value-sized (tiny); the global cumulative window
    # runs over it, never over the key relation
    cum = hist.withColumn(
        "cumfreq",
        F.sum("freq").over(
            Window.orderBy("n").rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    at = lambda p: F.min(  # noqa: E731 — nearest-rank over the histogram
        F.when(F.col("cumfreq") >= F.ceil(F.col("n_keys") * F.lit(p)), F.col("n"))
    ).cast("long")
    return (
        cum.crossJoin(F.broadcast(stats))
        .groupBy()
        .agg(
            F.max("n_keys").alias("n_keys"),
            F.max("n_rows").alias("n_rows"),
            F.max("max_rows").alias("max_rows"),
            at(0.5).alias("p50_rows"),
            at(0.9).alias("p90_rows"),
            at(0.99).alias("p99_rows"),
            F.max("hottest_key").alias("hottest_key"),
        )
        .select(
            "n_keys",
            "n_rows",
            "max_rows",
            "p50_rows",
            "p90_rows",
            "p99_rows",
            F.expr("CAST((max_rows * 1000000) DIV n_rows AS BIGINT)").alias(
                "max_share_ppm"
            ),
            "hottest_key",
        )
    )


KEY_SKEW_REPORT_SQL = """
WITH per_key AS (SELECT user_id AS k, COUNT(*) AS n FROM events GROUP BY 1),
stats AS (
  SELECT COUNT(*) AS n_keys, SUM(n) AS n_rows, MAX(n) AS max_rows FROM per_key
),
hot AS (SELECT k AS hottest_key FROM per_key ORDER BY n DESC, k LIMIT 1),
hist AS (SELECT n, COUNT(*) AS freq FROM per_key GROUP BY 1),
cum AS (
  SELECT n, SUM(freq) OVER (ORDER BY n
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumfreq
  FROM hist
)
SELECT CAST(s.n_keys AS BIGINT) AS n_keys,
       CAST(s.n_rows AS BIGINT) AS n_rows,
       CAST(s.max_rows AS BIGINT) AS max_rows,
       CAST(MIN(CASE WHEN c.cumfreq >= CEIL(s.n_keys * 0.5) THEN c.n END) AS BIGINT) AS p50_rows,
       CAST(MIN(CASE WHEN c.cumfreq >= CEIL(s.n_keys * 0.9) THEN c.n END) AS BIGINT) AS p90_rows,
       CAST(MIN(CASE WHEN c.cumfreq >= CEIL(s.n_keys * 0.99) THEN c.n END) AS BIGINT) AS p99_rows,
       CAST((s.max_rows * 1000000) // s.n_rows AS BIGINT) AS max_share_ppm,
       CAST(h.hottest_key AS BIGINT) AS hottest_key
FROM cum c, stats s, hot h
GROUP BY s.n_keys, s.n_rows, s.max_rows, h.hottest_key
"""


# ---------------------------------------------------------------------------
# Time-decayed engagement — per-user recency-weighted activity, the standard
# freshness signal behind retention dashboards and training-data recency
# weighting. Decay is harmonic (1 / (1 + age_days)) rather than exponential:
# same monotone shape, but rational arithmetic only — no exp()/pow() libm
# divergence across engines (this module's determinism rule). Contributions
# are floor-quantized to integer micro-units per event, so the per-user SUM
# is an exact bigint fold — order-independent, hash-stable.


def time_decay_engagement(events: DataFrame) -> DataFrame:
    """One reference-date scan (collects a single scalar) + one per-row
    projection + one user-keyed agg with map-side combine. Linear at any
    scale; the decayed contribution is computed inside the scan stage."""
    ref = events.agg(F.max(F.to_date("ts"))).collect()[0][0]
    age = F.datediff(F.lit(ref), F.to_date("ts"))
    contrib = F.floor(F.col("value") * F.lit(1000000.0) / (F.lit(1) + age)).cast("long")
    return (
        events.select("user_id", contrib.alias("c"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("c").cast("long").alias("engagement_micro"),
            (F.sum("c").cast("double") / F.lit(1000000.0)).alias("engagement"),
        )
    )


TIME_DECAY_ENGAGEMENT_SQL = """
WITH ref AS (SELECT MAX(CAST(ts AS DATE)) AS r FROM events),
per AS (
  SELECT user_id,
         CAST(floor(value * 1000000.0 / (1 + date_diff('day', CAST(ts AS DATE), ref.r))) AS BIGINT) AS c
  FROM events, ref
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(c) AS BIGINT) AS engagement_micro,
       CAST(SUM(c) AS DOUBLE) / 1000000.0 AS engagement
FROM per GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# TPC-H Q17 shape — "small-quantity order revenue": lineitems whose quantity
# is below 20% of their part's average. The classic correlated-scalar-
# subquery decorrelation: the per-part average becomes a part-keyed
# partial+final aggregate joined back on the equi key. The comparison is
# kept in exact integer/decimal cross-multiplied form
# (qty·5·cnt < sum_qty) — no division, no float, engine-identical.


def small_quantity_revenue(lineitem: DataFrame) -> DataFrame:
    per_part = lineitem.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(_dec("l_quantity")).alias("sum_qty"),
    )
    small = lineitem.join(per_part, "l_partkey").filter(
        _dec("l_quantity") * 5 * F.col("cnt") < F.col("sum_qty")
    )
    return small.agg(
        F.count(F.lit(1)).cast("long").alias("n_small_lines"),
        q6(F.sum(_dec("l_extendedprice")).cast("double") / F.lit(7.0)).alias(
            "avg_yearly"
        ),
    )


SMALL_QUANTITY_REVENUE_SQL = f"""
WITH per_part AS (
  SELECT l_partkey, COUNT(*) AS cnt,
         SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_small_lines,
       {q6_sql("CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0")} AS avg_yearly
FROM lineitem l JOIN per_part p ON l.l_partkey = p.l_partkey
WHERE CAST(l.l_quantity AS DECIMAL(18,2)) * 5 * p.cnt < p.sum_qty
"""


# ---------------------------------------------------------------------------
# TPC-H Q2 shape — cheapest supplier per part, as a partial-aggregating
# struct-argmin instead of a window: min(struct(price, suppkey)) gets
# map-side combine (the same plan discipline as the IVF coarse argmax), so
# the exchange carries one row per part per task, not every lineitem. The
# supplier attributes ride a broadcast dimension join.


def cheapest_supplier_per_part(
    lineitem: DataFrame, supplier: DataFrame
) -> DataFrame:
    price = q6(_dec("l_extendedprice").cast("double") / _dec("l_quantity"))
    best = (
        lineitem.select(
            "l_partkey",
            F.struct(
                price.alias("p"), F.col("l_suppkey").alias("s")
            ).alias("ps"),
        )
        .groupBy("l_partkey")
        .agg(F.min("ps").alias("best"))
    )
    return best.join(
        F.broadcast(supplier), best["best.s"] == supplier["s_suppkey"]
    ).select(
        "l_partkey",
        F.col("best.s").alias("s_suppkey"),
        "s_name",
        F.col("best.p").alias("unit_price"),
    )


CHEAPEST_SUPPLIER_PER_PART_SQL = f"""
WITH priced AS (
  SELECT l_partkey, l_suppkey,
         {q6_sql("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) / CAST(l_quantity AS DECIMAL(18,2))")} AS unit_price
  FROM lineitem
), ranked AS (
  SELECT l_partkey, l_suppkey, unit_price,
         ROW_NUMBER() OVER (PARTITION BY l_partkey ORDER BY unit_price, l_suppkey) AS rn
  FROM priced
)
SELECT r.l_partkey, r.l_suppkey AS s_suppkey, s.s_name, r.unit_price
FROM ranked r JOIN supplier s ON r.l_suppkey = s.s_suppkey
WHERE r.rn = 1
"""


# ---------------------------------------------------------------------------
# TPC-H Q6 shape — forecast revenue change: one filter+sum with EVERY
# predicate pushed into the parquet scan (date range, discount band,
# quantity cap — all scan-evaluable min/max envelope filters). The plan
# contract: no join, no window, partial+final agg over an already-pruned
# scan; revenue folds in exact DECIMAL before one cast out.


def forecast_revenue_change(lineitem: DataFrame) -> DataFrame:
    filtered = lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
        & (_dec("l_discount") >= F.lit("0.05").cast(DEC))
        & (_dec("l_discount") <= F.lit("0.07").cast(DEC))
        & (_dec("l_quantity") < F.lit(24).cast(DEC))
    )
    return filtered.agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum(_dec("l_extendedprice") * _dec("l_discount"))
        .cast("double")
        .alias("revenue"),
    )


FORECAST_REVENUE_CHANGE_SQL = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
  AND CAST(l_discount AS DECIMAL(18,2)) BETWEEN 0.05 AND 0.07
  AND CAST(l_quantity AS DECIMAL(18,2)) < 24
"""


# ---------------------------------------------------------------------------
# TPC-H Q13 shape — customer order-count distribution: left join customers
# to a filtered orders rollup, then histogram the per-customer counts.
# Two keyed aggregations with map-side combine; the customer join rides
# c_custkey (AQE-handled); the histogram relation is count-valued (tiny).


def customer_order_histogram(
    customer: DataFrame, orders: DataFrame
) -> DataFrame:
    per_cust = (
        orders.filter(F.col("o_orderstatus") != F.lit("F"))
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("c_count"))
    )
    joined = customer.join(
        per_cust, customer["c_custkey"] == per_cust["o_custkey"], "left"
    ).select(F.coalesce("c_count", F.lit(0)).alias("c_count"))
    return (
        joined.groupBy("c_count")
        .agg(F.count(F.lit(1)).cast("long").alias("n_customers"))
        .select(F.col("c_count").cast("long").alias("c_count"), "n_customers")
    )


CUSTOMER_ORDER_HISTOGRAM_SQL = """
WITH per_cust AS (
  SELECT o_custkey, COUNT(*) AS c_count
  FROM orders WHERE o_orderstatus <> 'F'
  GROUP BY o_custkey
)
SELECT CAST(COALESCE(p.c_count, 0) AS BIGINT) AS c_count,
       CAST(COUNT(*) AS BIGINT) AS n_customers
FROM customer c LEFT JOIN per_cust p ON c.c_custkey = p.o_custkey
GROUP BY COALESCE(p.c_count, 0)
"""


# ---------------------------------------------------------------------------
# TPC-H Q14 shape — promotion revenue share: conditional aggregation over a
# part-dimension join. Plan contract: the part columns ride a BROADCAST
# join (dimension vs lineitem fact), both legs fold in exact DECIMAL, the
# share divides once at the end (q6).


def promo_revenue_share(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    rev = _dec("l_extendedprice") * (F.lit(1).cast(DEC) - _dec("l_discount"))
    joined = lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-07-01"))
    ).join(F.broadcast(part.select("p_partkey", "p_type")),
           F.col("l_partkey") == F.col("p_partkey"))
    promo = F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast(DEC)))
    total = F.sum(rev)
    return joined.agg(
        promo.cast("double").alias("promo_revenue"),
        total.cast("double").alias("total_revenue"),
        q6(F.lit(100.0) * promo.cast("double") / total.cast("double")).alias(
            "promo_share_pct"
        ),
    )


PROMO_REVENUE_SHARE_SQL = f"""
WITH j AS (
  SELECT CAST(l_extendedprice AS DECIMAL(18,2))
           * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS rev,
         p.p_type
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE l.l_shipdate >= '1996-01-01' AND l.l_shipdate < '1996-07-01'
)
SELECT CAST(SUM(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END) AS DOUBLE) AS promo_revenue,
       CAST(SUM(rev) AS DOUBLE) AS total_revenue,
       {q6_sql("100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END) AS DOUBLE) / CAST(SUM(rev) AS DOUBLE)")} AS promo_share_pct
FROM j
"""


# ---------------------------------------------------------------------------
# TPC-H Q4 shape — order-priority checking: orders with at least one LATE
# lineitem (shipped > 60 days after the order date), counted per priority.
# The EXISTS decorrelates to a LEFT SEMI equi-join on the order key with
# the lateness predicate evaluated join-side — no aggregation-then-join
# detour, no pair blowup.


def late_order_priority_check(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    late = lineitem.select("l_orderkey", "l_shipdate")
    sel = orders.join(
        late,
        (orders["o_orderkey"] == late["l_orderkey"])
        & (late["l_shipdate"] > F.date_add(F.col("o_orderdate"), 60)),
        "left_semi",
    )
    return sel.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders")
    )


LATE_ORDER_PRIORITY_CHECK_SQL = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey
    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
)
GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# TPC-H Q18 shape — large-volume customers: a HAVING rollup on the fact
# side joined back to the dimension. The per-order quantity rollup gets
# partial+final aggregation; the surviving keys (tiny by construction)
# BROADCAST into the orders/customer joins, so neither big relation
# shuffles for the final assembly.

LARGE_ORDER_QTY_MIN = 120


def large_volume_customers(
    customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
    min_qty: int = LARGE_ORDER_QTY_MIN,
) -> DataFrame:
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("total_qty"))
        .filter(F.col("total_qty") >= F.lit(min_qty).cast(DEC))
    )
    return (
        orders.join(F.broadcast(big), orders["o_orderkey"] == big["l_orderkey"])
        .join(customer, orders["o_custkey"] == customer["c_custkey"])
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").cast("date").cast("string").alias("o_orderdate"),
            F.col("total_qty").cast("double").alias("total_qty"),
        )
    )


def large_volume_customers_sql(min_qty: int = LARGE_ORDER_QTY_MIN) -> str:
    return f"""
WITH big AS (
  SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) >= {min_qty}
)
SELECT c.c_custkey, c.c_name, o.o_orderkey,
       CAST(CAST(o.o_orderdate AS DATE) AS VARCHAR) AS o_orderdate,
       CAST(b.total_qty AS DOUBLE) AS total_qty
FROM orders o
JOIN big b ON o.o_orderkey = b.l_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
"""


# ---------------------------------------------------------------------------
# TPC-H Q7 shape — volume shipping between two nations: revenue flowing
# supplier-nation → customer-nation (both directions) by ship year.
# Scale discipline: the two nation dimensions are FILTERED to the pair
# before their broadcast joins, so lineitems outside the corridor die in
# the joins (semi-join effect), never reaching the aggregation; supplier
# is broadcast; only orders/lineitem shuffle, on their join keys.
# Revenue in exact integer cents (the cross-engine float rule).

TRADE_NATION_A = "NATION_1"
TRADE_NATION_B = "NATION_2"


def nation_trade_volume(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    nation_a: str = TRADE_NATION_A,
    nation_b: str = TRADE_NATION_B,
) -> DataFrame:
    pair = [nation_a, nation_b]
    n1 = nation.filter(F.col("n_name").isin(pair)).select(
        F.col("n_nationkey").alias("_snk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.filter(F.col("n_name").isin(pair)).select(
        F.col("n_nationkey").alias("_cnk"), F.col("n_name").alias("cust_nation")
    )
    j = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1998-01-01"))
        )
        .select(
            "l_orderkey",
            "l_suppkey",
            _revenue_cents().alias("_rev"),
            F.year("l_shipdate").alias("l_year"),
        )
        .join(
            orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            customer.select("c_custkey", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(supplier.select("s_suppkey", "s_nationkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("_snk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("_cnk"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    return j.groupBy("supp_nation", "cust_nation", "l_year").agg(
        (F.sum("_rev") / 10000.0).alias("revenue"),
        F.count(F.lit(1)).cast("long").alias("n_lines"),
    )


def nation_trade_volume_sql(
    nation_a: str = TRADE_NATION_A, nation_b: str = TRADE_NATION_B
) -> str:
    return f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l.l_shipdate) AS INT) AS l_year,
       SUM({_REVENUE_CENTS_SQL}) / 10000.0 AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
WHERE l.l_shipdate >= '1996-01-01' AND l.l_shipdate < '1998-01-01'
  AND n1.n_name IN ('{nation_a}', '{nation_b}')
  AND n2.n_name IN ('{nation_a}', '{nation_b}')
  AND n1.n_name <> n2.n_name
GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# TPC-H Q8 shape — national market share: of all PROMO-part revenue
# ordered in a two-year window, what fraction came from one nation's
# suppliers, per order year. The share is a conditional-sum ratio inside
# ONE aggregation (never two scans); part/supplier/nation broadcast; the
# date filter prunes orders at the scan. Exact integer cents.

MKT_SHARE_NATION = "NATION_3"
MKT_SHARE_PTYPE = "PROMO"


def market_share_report(
    lineitem: DataFrame,
    orders: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    part: DataFrame,
    target_nation: str = MKT_SHARE_NATION,
    p_type: str = MKT_SHARE_PTYPE,
) -> DataFrame:
    p = part.filter(F.col("p_type") == p_type).select("p_partkey")
    j = (
        lineitem.select(
            "l_orderkey", "l_partkey", "l_suppkey", _revenue_cents().alias("_rev")
        )
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01"))
                & (F.col("o_orderdate") < F.lit("1998-01-01"))
            ).select("o_orderkey", F.year("o_orderdate").alias("o_year")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(supplier.select("s_suppkey", "s_nationkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(
            F.broadcast(
                nation.select(
                    F.col("n_nationkey").alias("_snk"), F.col("n_name").alias("_sn")
                )
            ),
            F.col("s_nationkey") == F.col("_snk"),
        )
    )
    target = F.sum(F.when(F.col("_sn") == target_nation, F.col("_rev")).otherwise(F.lit(0)))
    total = F.sum("_rev")
    return j.groupBy("o_year").agg(
        (target / 10000.0).alias("nation_revenue"),
        (total / 10000.0).alias("total_revenue"),
        q6(target.cast("double") / total.cast("double")).alias("mkt_share"),
    )


def market_share_report_sql(
    target_nation: str = MKT_SHARE_NATION, p_type: str = MKT_SHARE_PTYPE
) -> str:
    tgt = f"SUM(CASE WHEN n.n_name = '{target_nation}' THEN {_REVENUE_CENTS_SQL} ELSE 0 END)"
    tot = f"SUM({_REVENUE_CENTS_SQL})"
    return f"""
SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS o_year,
       {tgt} / 10000.0 AS nation_revenue,
       {tot} / 10000.0 AS total_revenue,
       {q6_sql(f"CAST({tgt} AS DOUBLE) / CAST({tot} AS DOUBLE)")} AS mkt_share
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey AND p.p_type = '{p_type}'
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE o.o_orderdate >= '1996-01-01' AND o.o_orderdate < '1998-01-01'
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# TPC-H Q9 shape — product-type profit by nation and year. The reference
# schema has no partsupp/ps_supplycost, so cost is proxied as
# p_retailprice × quantity (same multi-join + LIKE-filter + two-level
# rollup shape); profit stays in exact 1e-4-dollar integer units until
# the final division. part (LIKE-filtered) and supplier/nation broadcast.

PROFIT_NAME_LIKE = "%gear%"


def product_type_profit(
    lineitem: DataFrame,
    orders: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    part: DataFrame,
    name_like: str = PROFIT_NAME_LIKE,
) -> DataFrame:
    p = part.filter(F.col("p_name").like(name_like)).select(
        "p_partkey", (F.round(F.col("p_retailprice") * 100)).cast("long").alias("_rc")
    )
    qty_c = F.round(F.col("l_quantity") * 100).cast("long")
    j = (
        lineitem.select(
            "l_orderkey",
            "l_partkey",
            "l_suppkey",
            _revenue_cents().alias("_rev"),
            qty_c.alias("_qc"),
        )
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            orders.select("o_orderkey", F.year("o_orderdate").alias("o_year")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(supplier.select("s_suppkey", "s_nationkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
    )
    profit_u = F.col("_rev") - F.col("_rc") * F.col("_qc")
    return (
        j.select("n_name", "o_year", profit_u.alias("_p"))
        .groupBy("n_name", "o_year")
        .agg(
            (F.sum("_p") / 10000.0).alias("profit"),
            F.count(F.lit(1)).cast("long").alias("n_lines"),
        )
    )


def product_type_profit_sql(name_like: str = PROFIT_NAME_LIKE) -> str:
    profit = (
        f"({_REVENUE_CENTS_SQL}"
        " - CAST(round(p.p_retailprice * 100) AS BIGINT)"
        " * CAST(round(l.l_quantity * 100) AS BIGINT))"
    )
    return f"""
SELECT n.n_name, CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS o_year,
       SUM({profit}) / 10000.0 AS profit,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey AND p.p_name LIKE '{name_like}'
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# TPC-H Q10 shape — returned-item reporting: top-k customers by revenue
# lost to returns in one quarter. Filters (returnflag on lineitem, date
# range on orders) push to both scans BEFORE the joins; nation broadcast;
# deterministic (revenue DESC, c_custkey) top-k.


def returned_item_report(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    nation: DataFrame,
    k: int = 20,
) -> DataFrame:
    items = lineitem.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", _revenue_cents().alias("_rev")
    )
    ords = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-04-01"))
    ).select("o_orderkey", "o_custkey")
    return (
        items.join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg((F.sum("_rev") / 10000.0).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(k)
    )


def returned_item_report_sql(k: int = 20) -> str:
    return f"""
SELECT c.c_custkey, c.c_name, c.c_acctbal, n.n_name,
       SUM({_REVENUE_CENTS_SQL}) / 10000.0 AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= '1996-01-01' AND o.o_orderdate < '1996-04-01'
GROUP BY 1, 2, 3, 4
ORDER BY revenue DESC, c.c_custkey
LIMIT {k}
"""


# ---------------------------------------------------------------------------
# TPC-H Q15 shape — top supplier(s): per-supplier quarterly revenue, then
# the suppliers achieving the maximum (the view + scalar-subquery query,
# decorrelated Spark-side as agg → broadcast-scalar equi-filter → dim
# join). Exact integer cents make "== max" engine-safe (no float ties).


def top_supplier_revenue(lineitem: DataFrame, supplier: DataFrame) -> DataFrame:
    per = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1996-04-01"))
        )
        .select("l_suppkey", _revenue_cents().alias("_rev"))
        .groupBy("l_suppkey")
        .agg(F.sum("_rev").alias("_rc"))
    )
    mx = per.agg(F.max("_rc").alias("_mx"))
    return (
        per.join(F.broadcast(mx), per["_rc"] == mx["_mx"])
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            (F.col("_rc") / 10000.0).alias("total_revenue"),
        )
    )


TOP_SUPPLIER_REVENUE_SQL = f"""
WITH rev AS (
  SELECT l_suppkey, SUM({_REVENUE_CENTS_SQL}) AS rc
  FROM lineitem l
  WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-04-01'
  GROUP BY 1
)
SELECT s.s_suppkey, s.s_name, rev.rc / 10000.0 AS total_revenue
FROM rev JOIN supplier s ON rev.l_suppkey = s.s_suppkey
WHERE rev.rc = (SELECT MAX(rc) FROM rev)
"""


# ---------------------------------------------------------------------------
# TPC-H Q22 shape — global sales opportunity: customers richer than the
# positive-balance average who never ordered, rolled up by nation. The
# scalar subquery decorrelates to a broadcast single-row join, and the
# comparison is the EXACT integer form c_acctbal·n > sum (multiplying
# through by the count instead of comparing against a float average —
# no cross-engine float-boundary flips); NOT EXISTS is a left-anti join.


IDLE_SINCE = "1999-01-01"  # "no recent orders" horizon (Q22's 7-year flavor)


def idle_rich_customers(customer: DataFrame, orders: DataFrame) -> DataFrame:
    bal_c = F.round(F.col("c_acctbal") * 100).cast("long")
    pos = customer.filter(F.col("c_acctbal") > 0).agg(
        F.sum(bal_c).alias("_sum"), F.count(F.lit(1)).alias("_n")
    )
    rich = (
        customer.select("c_custkey", "c_nationkey", bal_c.alias("_bc"))
        .join(F.broadcast(pos))
        .filter(F.col("_bc") * F.col("_n") > F.col("_sum"))
    )
    idle = rich.join(
        orders.filter(F.col("o_orderdate") >= F.lit(IDLE_SINCE)).select("o_custkey"),
        rich["c_custkey"] == F.col("o_custkey"),
        "left_anti",
    )
    return idle.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        (F.sum("_bc") / 100.0).alias("total_acctbal"),
    )


IDLE_RICH_CUSTOMERS_SQL = """
WITH pos AS (
  SELECT SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS s, COUNT(*) AS n
  FROM customer WHERE c_acctbal > 0
)
SELECT c.c_nationkey,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       SUM(CAST(round(c.c_acctbal * 100) AS BIGINT)) / 100.0 AS total_acctbal
FROM customer c, pos
WHERE CAST(round(c.c_acctbal * 100) AS BIGINT) * pos.n > pos.s
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderdate >= '1999-01-01')
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# TPC-H Q11 shape — important stock: parts whose traded value (from a
# nation group's suppliers) exceeds a fixed fraction of the group total.
# The HAVING-vs-global-scalar decorrelates to one broadcast single-row
# join, and the threshold comparison is exact integer (value·10000 >
# total·FRACTION·10000 → value·denominator > total, with the fraction a
# rational 1/1000). Supplier filter broadcast; one shuffle on l_partkey.

IMPORTANT_PARTS_FRACTION_DEN = 1000  # value > total/1000


def important_parts_share(
    lineitem: DataFrame,
    supplier: DataFrame,
    max_nationkey: int = 5,
    fraction_den: int = IMPORTANT_PARTS_FRACTION_DEN,
) -> DataFrame:
    supp = supplier.filter(F.col("s_nationkey") < max_nationkey).select("s_suppkey")
    val = (
        lineitem.select("l_partkey", "l_suppkey", _revenue_cents().alias("_rev"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .groupBy("l_partkey")
        .agg(F.sum("_rev").alias("_vc"))
    )
    tot = val.agg(F.sum("_vc").alias("_tc"))
    return (
        val.join(F.broadcast(tot))
        .filter(F.col("_vc") * fraction_den > F.col("_tc"))
        .select("l_partkey", (F.col("_vc") / 10000.0).alias("part_value"))
    )


def important_parts_share_sql(
    max_nationkey: int = 5, fraction_den: int = IMPORTANT_PARTS_FRACTION_DEN
) -> str:
    return f"""
WITH val AS (
  SELECT l.l_partkey, SUM({_REVENUE_CENTS_SQL}) AS vc
  FROM lineitem l
  WHERE EXISTS (SELECT 1 FROM supplier s
                WHERE s.s_suppkey = l.l_suppkey AND s.s_nationkey < {max_nationkey})
  GROUP BY 1
)
SELECT l_partkey, vc / 10000.0 AS part_value
FROM val, (SELECT SUM(vc) AS tc FROM val) t
WHERE vc * {fraction_den} > t.tc
"""


# ---------------------------------------------------------------------------
# TPC-H Q16 shape — parts/supplier relationship: distinct suppliers per
# (brand, type, size) bucket, excluding one brand, one type prefix, and
# suppliers with negative balance (the NOT IN subquery → broadcast
# left-anti join). The supplier-part pairs come from lineitem (the
# reference schema has no partsupp); COUNT(DISTINCT) gets Spark's
# two-phase expand plan automatically.

VARIETY_EXCL_BRAND = "Brand#1"
VARIETY_EXCL_TYPE = "PROMO"
VARIETY_SIZES = (1, 4, 9, 14, 19, 24)


def part_supplier_variety(
    lineitem: DataFrame, part: DataFrame, supplier: DataFrame
) -> DataFrame:
    p = part.filter(
        (F.col("p_brand") != VARIETY_EXCL_BRAND)
        & (F.col("p_type") != VARIETY_EXCL_TYPE)
        & (F.col("p_size").isin(list(VARIETY_SIZES)))
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad = supplier.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    pairs = (
        lineitem.select("l_partkey", "l_suppkey")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
    )
    return pairs.groupBy("p_brand", "p_type", "p_size").agg(
        F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt")
    )


PART_SUPPLIER_VARIETY_SQL = f"""
SELECT p.p_brand, p.p_type, p.p_size,
       CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_brand <> '{VARIETY_EXCL_BRAND}'
  AND p.p_type <> '{VARIETY_EXCL_TYPE}'
  AND p.p_size IN {VARIETY_SIZES}
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# TPC-H Q19 shape — discounted revenue under a DISJUNCTION of
# (brand, size-band, quantity-band) triplets. The plan contract: the OR
# of brand/size predicates prunes the broadcast part side, the quantity
# envelope (BETWEEN the min and max of all bands) pushes to the lineitem
# scan, and the exact triplet disjunction evaluates post-join — one
# broadcast join, no union-of-three-scans detour.


def disjunctive_promo_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    # quantity compares stay on the raw DOUBLE column (integer literal
    # bounds compare exactly on both engines) so the envelope [min qty,
    # max qty] pushes into the parquet scan — a decimal cast would block
    # pushdown and force a full-column read.
    bands = [
        ("Brand#1", 1, 10, 1, 11),
        ("Brand#2", 1, 20, 10, 20),
        ("Brand#3", 1, 30, 20, 30),
    ]
    p = part.select("p_partkey", "p_brand", "p_size")
    j = lineitem.filter(
        F.col("l_quantity").between(
            float(min(b[3] for b in bands)), float(max(b[4] for b in bands))
        )
    ).select(
        "l_partkey", F.col("l_quantity").alias("_q"), _revenue_cents().alias("_rev")
    ).join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    cond = None
    for brand, smin, smax, qmin, qmax in bands:
        c = (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(smin, smax)
            & F.col("_q").between(float(qmin), float(qmax))
        )
        cond = c if cond is None else (cond | c)
    return j.filter(cond).agg(
        (F.sum("_rev") / 10000.0).alias("revenue"),
        F.count(F.lit(1)).cast("long").alias("n_lines"),
    )


DISJUNCTIVE_PROMO_REVENUE_SQL = f"""
SELECT SUM({_REVENUE_CENTS_SQL}) / 10000.0 AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 1.0 AND 11.0)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 20
       AND l.l_quantity BETWEEN 10.0 AND 20.0)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 30
       AND l.l_quantity BETWEEN 20.0 AND 30.0)
"""


# ---------------------------------------------------------------------------
# TPC-H Q20 shape — potential part promotion: suppliers holding a
# dominant share (>1/2) of any green-named part's 1996 volume. The
# partsupp availability test of the original becomes a per-(part,
# supplier) vs per-part volume comparison ('red' parts — this generator's
# part names carry color adjectives, no 'forest'/'green') — same nested-IN semi-join
# chain, decorrelated to two aggregations sharing one shuffle key and an
# exact-integer dominance test, then a semi join into the supplier dim.

DOMINANT_NAME_LIKE = "%red%"


def dominant_part_suppliers(
    lineitem: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    name_like: str = DOMINANT_NAME_LIKE,
) -> DataFrame:
    p = part.filter(F.col("p_name").like(name_like)).select("p_partkey")
    qty_c = F.round(F.col("l_quantity") * 100).cast("long")
    base = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
        )
        .select("l_partkey", "l_suppkey", qty_c.alias("_qc"))
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
    )
    pair = base.groupBy("l_partkey", "l_suppkey").agg(F.sum("_qc").alias("_pq"))
    tot = pair.groupBy("l_partkey").agg(F.sum("_pq").alias("_tq"))
    dominant = (
        pair.join(tot, "l_partkey")
        .filter(F.col("_pq") * 2 > F.col("_tq"))
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).cast("long").alias("n_parts_dominated"))
    )
    return dominant.join(
        F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey")
    ).select("s_suppkey", "s_name", "n_parts_dominated")


def dominant_part_suppliers_sql(name_like: str = DOMINANT_NAME_LIKE) -> str:
    return f"""
WITH base AS (
  SELECT l.l_partkey, l.l_suppkey,
         CAST(round(l.l_quantity * 100) AS BIGINT) AS qc
  FROM lineitem l
  WHERE l.l_shipdate >= '1996-01-01' AND l.l_shipdate < '1997-01-01'
    AND EXISTS (SELECT 1 FROM part p
                WHERE p.p_partkey = l.l_partkey AND p.p_name LIKE '{name_like}')
), pair AS (
  SELECT l_partkey, l_suppkey, SUM(qc) AS pq FROM base GROUP BY 1, 2
), tot AS (
  SELECT l_partkey, SUM(pq) AS tq FROM pair GROUP BY 1
), dom AS (
  SELECT pair.l_suppkey, CAST(COUNT(*) AS BIGINT) AS n_parts_dominated
  FROM pair JOIN tot ON pair.l_partkey = tot.l_partkey
  WHERE pair.pq * 2 > tot.tq
  GROUP BY 1
)
SELECT s.s_suppkey, s.s_name, d.n_parts_dominated
FROM dom d JOIN supplier s ON d.l_suppkey = s.s_suppkey
"""


# ---------------------------------------------------------------------------
# TPC-H Q21 shape — suppliers who kept orders waiting: on finished
# multi-supplier orders, the UNIQUE supplier whose lineitem shipped last
# (the reference uses commit/receipt dates; this schema's lateness signal
# is the max ship date). The EXISTS (another supplier) / NOT EXISTS
# (another supplier shipping later) pair decorrelates to per-order
# aggregations: max ship date + distinct-supplier count, then a
# max-only line filter and a uniqueness test — three shuffles on
# l_orderkey, no correlated re-scans.


def waiting_orders_suppliers(
    orders: DataFrame, lineitem: DataFrame, supplier: DataFrame
) -> DataFrame:
    flines = lineitem.join(
        orders.filter(F.col("o_orderstatus") == "F").select("o_orderkey"),
        F.col("l_orderkey") == F.col("o_orderkey"),
        "left_semi",
    ).select("l_orderkey", "l_suppkey", "l_shipdate")
    om = flines.groupBy("l_orderkey").agg(
        F.max("l_shipdate").alias("_mx"),
        F.countDistinct("l_suppkey").alias("_ns"),
    )
    last = (
        flines.join(om, "l_orderkey")
        .filter((F.col("l_shipdate") == F.col("_mx")) & (F.col("_ns") >= 2))
        .groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("_nm"),
            F.max("l_suppkey").alias("_sk"),
        )
        .filter(F.col("_nm") == 1)
    )
    return (
        last.groupBy("_sk")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
        .join(F.broadcast(supplier), F.col("_sk") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "numwait")
    )


WAITING_ORDERS_SUPPLIERS_SQL = """
WITH flines AS (
  SELECT l.l_orderkey, l.l_suppkey, l.l_shipdate
  FROM lineitem l
  WHERE EXISTS (SELECT 1 FROM orders o
                WHERE o.o_orderkey = l.l_orderkey AND o.o_orderstatus = 'F')
), om AS (
  SELECT l_orderkey, MAX(l_shipdate) AS mx, COUNT(DISTINCT l_suppkey) AS ns
  FROM flines GROUP BY 1
), last AS (
  SELECT f.l_orderkey, COUNT(DISTINCT f.l_suppkey) AS nm, MAX(f.l_suppkey) AS sk
  FROM flines f JOIN om ON f.l_orderkey = om.l_orderkey
  WHERE f.l_shipdate = om.mx AND om.ns >= 2
  GROUP BY 1
), wait AS (
  SELECT sk, CAST(COUNT(*) AS BIGINT) AS numwait FROM last WHERE nm = 1 GROUP BY 1
)
SELECT s.s_suppkey, s.s_name, w.numwait
FROM wait w JOIN supplier s ON w.sk = s.s_suppkey
"""


# ---------------------------------------------------------------------------
# Daily anomaly z-scores — each (event_type, day)'s value total scored
# against its own trailing 7-day window: the metrics-pipeline anomaly
# gate. Engine-exact construction: daily totals fold in integer
# milli-units, the trailing mean/variance come from exact SUM/SUM-of-
# squares/COUNT window folds (never an engine-native stddev, whose
# accumulation algorithm differs between engines), z is one closed-form
# double expression on exact ints, bround-4. One shuffle (type, day),
# one ordered window per type.

ANOMALY_Z_THRESHOLD = 3.0


def anomaly_zscore_daily(
    events: DataFrame,
    z_threshold: float = ANOMALY_Z_THRESHOLD,
    value_scale: int = 1000,
) -> DataFrame:
    daily = (
        events.select(
            "event_type",
            F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
            F.round(F.col("value") * value_scale).cast("long").alias("_v"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("_v").alias("x"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-7, -1)
    )
    # Window folds stay EXACT (a double window sum would be
    # association-order-dependent across engines — the banned class; DuckDB
    # segment-tree window folds vs Spark's in-frame-order folds can round
    # differently). s2 = SUM(x*x) folds in DECIMAL, not long: a long*long
    # product silently wraps int64 once |x| > sqrt(2^63/7) ≈ 1.15e9
    # milli-units. decimal(19,0)² → decimal(38,0) holds any int64 product
    # exactly, and the 7-term window sum stays exact for |x| < sqrt(1e38/7)
    # ≈ 3.8e18 — the full practical int64 range. Both engines then convert
    # the ONE exact s2 value to double (correctly rounded, identical), which
    # is also exactly what the streaming twin's float(exact-int s2) does.
    xd = F.col("x").cast("decimal(19,0)")
    stats = daily.select(
        "event_type",
        "day",
        "x",
        F.count("x").over(w).alias("_n"),
        F.sum("x").over(w).alias("_s1"),
        F.sum(xd * xd).over(w).alias("_s2"),
        F.min("x").over(w).alias("_mn"),
        F.max("x").over(w).alias("_mx"),
    )
    n = F.col("_n").cast("double")
    s1d = F.col("_s1").cast("double")
    mean = s1d / n
    var = (F.col("_s2").cast("double") - s1d * s1d / n) / (n - 1)
    z = F.bround((F.col("x") - mean) / F.sqrt(var), 4)
    full = F.col("_n") == 7
    # zero-variance trailing window iff min == max — an EXACT integer
    # test with no products (never a float var≈0 compare); the anomaly
    # decision then falls back to exact deviation: any x differing from
    # a constant history is an infinite-z anomaly.
    var_zero = F.col("_mn") == F.col("_mx")
    return stats.select(
        "event_type",
        F.col("day").cast("string").alias("day"),
        (F.col("x") / float(value_scale)).alias("daily_value"),
        F.when(full & ~var_zero, z).alias("zscore"),
        F.when(
            full
            & (
                (~var_zero & (F.abs(z) > z_threshold))
                | (var_zero & (F.col("x") != F.col("_mn")))
            ),
            1,
        )
        .otherwise(0)
        .alias("is_anomaly"),
    )


def anomaly_zscore_daily_sql(
    z_threshold: float = ANOMALY_Z_THRESHOLD, value_scale: int = 1000
) -> str:
    return f"""
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         SUM(CAST(round(value * {value_scale}) AS BIGINT)) AS x
  FROM events GROUP BY 1, 2
), stats AS (
  SELECT event_type, day, x,
         COUNT(x) OVER w AS n,
         SUM(x) OVER w AS s1,
         SUM(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0))) OVER w AS s2,
         MIN(x) OVER w AS mn,
         MAX(x) OVER w AS mx
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
)
SELECT event_type,
       CAST(day AS VARCHAR) AS day,
       x / {value_scale}.0 AS daily_value,
       CASE WHEN n = 7 AND mn <> mx THEN
         round_even((x - s1::DOUBLE / n)
                    / sqrt((s2::DOUBLE - s1::DOUBLE * s1::DOUBLE / n) / (n - 1)), 4)
       END AS zscore,
       CASE WHEN n = 7 AND ((mn <> mx AND ABS(
         round_even((x - s1::DOUBLE / n)
                    / sqrt((s2::DOUBLE - s1::DOUBLE * s1::DOUBLE / n) / (n - 1)), 4)
       ) > {z_threshold}) OR (mn = mx AND x <> mn))
       THEN 1 ELSE 0 END AS is_anomaly
FROM stats
"""


# ---------------------------------------------------------------------------
# ROLLUP report — the grouping-sets surface: per (event_type, month)
# totals plus the event_type subtotals plus the grand total in ONE
# aggregation pass (Spark's rollup lowers to a single Expand+Aggregate —
# one shuffle for all three granularities, vs three self-joined
# aggregations hand-rolled). Aggregated-out levels are COALESCED to
# explicit sentinels so the oracle comparison never depends on
# engine-specific NULL canonicalization; values fold in exact integer
# milli-units.


def event_rollup_report(events: DataFrame) -> DataFrame:
    base = events.select(
        "event_type",
        F.date_format(F.date_trunc("month", F.col("ts")), "yyyy-MM").alias("month"),
        F.round(F.col("value") * 1000).cast("long").alias("_v"),
    )
    agg = base.rollup("event_type", "month").agg(
        F.grouping_id().alias("gid"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
        (F.sum("_v") / 1000.0).alias("total_value"),
    )
    return agg.select(
        F.coalesce("event_type", F.lit("(all)")).alias("event_type"),
        F.coalesce("month", F.lit("(all)")).alias("month"),
        F.col("gid").cast("int").alias("gid"),
        "n_events",
        "total_value",
    )


EVENT_ROLLUP_REPORT_SQL = """
WITH base AS (
  SELECT event_type,
         strftime(date_trunc('month', ts), '%Y-%m') AS month,
         CAST(round(value * 1000) AS BIGINT) AS v
  FROM events
)
SELECT COALESCE(event_type, '(all)') AS event_type,
       COALESCE(month, '(all)') AS month,
       CAST(GROUPING(event_type, month) AS INT) AS gid,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       SUM(v) / 1000.0 AS total_value
FROM base GROUP BY ROLLUP (event_type, month)
"""


# ---------------------------------------------------------------------------
# Daily pivot — one row per day, one column per event type (the
# dashboard-feed shape). Spark's pivot with an EXPLICIT value list stays
# a single Aggregate (no extra distinct-values job, and the output
# schema is static — the form that scales); totals are exact integer
# milli-unit sums surfaced as doubles.

PIVOT_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def event_type_pivot_daily(events: DataFrame) -> DataFrame:
    base = events.select(
        F.date_trunc("day", F.col("ts")).cast("date").cast("string").alias("day"),
        "event_type",
        F.round(F.col("value") * 1000).cast("long").alias("_v"),
    )
    agg = (
        base.groupBy("day")
        .pivot("event_type", PIVOT_EVENT_TYPES)
        .agg(F.sum("_v"))
    )
    return agg.select(
        "day",
        *[
            (F.coalesce(F.col(t), F.lit(0)) / 1000.0).alias(t)
            for t in PIVOT_EVENT_TYPES
        ],
    )


EVENT_TYPE_PIVOT_DAILY_SQL = """
WITH base AS (
  SELECT CAST(CAST(date_trunc('day', ts) AS DATE) AS VARCHAR) AS day,
         event_type,
         CAST(round(value * 1000) AS BIGINT) AS v
  FROM events
)
SELECT day,
       COALESCE(SUM(CASE WHEN event_type = 'click' THEN v END), 0) / 1000.0 AS click,
       COALESCE(SUM(CASE WHEN event_type = 'error' THEN v END), 0) / 1000.0 AS error,
       COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN v END), 0) / 1000.0 AS purchase,
       COALESCE(SUM(CASE WHEN event_type = 'signup' THEN v END), 0) / 1000.0 AS signup,
       COALESCE(SUM(CASE WHEN event_type = 'view' THEN v END), 0) / 1000.0 AS view
FROM base GROUP BY day
"""


# ---------------------------------------------------------------------------
# Event transition report (round 9): the first-order Markov transition
# matrix over each user's event sequence — the behavioral-analytics shape
# behind "what do users do after X" dashboards and session-model
# baselines. lead() over (user_id, ts, event_id) pairs each event with its
# successor (event_id breaks timestamp ties deterministically); counts per
# (from, to) and a per-from probability close the matrix. Scale shape:
# ONE user-keyed shuffle for the sequence window (unavoidable — the
# sequence lives per user), a map-side-combined pair count, and the
# probability window runs over the |event_types|² count relation, never
# the event stream.


def event_transition_report(events: DataFrame) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        events.select("user_id", "ts", "event_id", "event_type")
        .withColumn("to_type", F.lead("event_type").over(w))
        .filter(F.col("to_type").isNotNull())
    )
    counts = pairs.groupBy(
        F.col("event_type").alias("from_type"), "to_type"
    ).agg(F.count(F.lit(1)).cast("long").alias("n_transitions"))
    tot = F.sum("n_transitions").over(Window.partitionBy("from_type"))
    return counts.select(
        "from_type",
        "to_type",
        "n_transitions",
        q6(F.col("n_transitions") / tot).alias("p_transition"),
    )


EVENT_TRANSITION_REPORT_SQL = f"""
WITH pairs AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS to_type
  FROM events
),
counts AS (
  SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n_transitions
  FROM pairs WHERE to_type IS NOT NULL
  GROUP BY 1, 2
)
SELECT from_type, to_type, n_transitions,
       {q6_sql("n_transitions / (SUM(n_transitions) OVER (PARTITION BY from_type))")}
         AS p_transition
FROM counts
"""


# ---------------------------------------------------------------------------
# Market-basket association pairs (round 9): support + lift for parts
# co-ordered within one order — the classic association-rule OLAP shape
# (Agrawal & Srikant 1994's frequent-pair tier). Scale shape: the pair
# relation is the per-order self-join of the DISTINCT (order, part)
# relation, so pair volume is Σ_orders C(lines, 2) — LINEAR in orders,
# never |parts|², PROVIDED basket size is actually bounded: r9 verdict #4
# observed nothing enforced that, so one pathological mega-order (a
# crawler cart with 1e6 distinct parts) would contribute 5e11 pairs. The
# ``max_basket`` guard drops whole baskets above the cap BEFORE any
# counting (the same hot-key-cap discipline as every dedup tier), so the
# analyzed universe is "orders with a plausible basket" and C(max_basket,
# 2) bounds any order's pair contribution by contract.
# The two frequency joins key on the part dimension (broadcastable), and
# the order total rides in as one broadcast scalar. Lift is folded in
# doubles with a fixed multiplication order (never long·long, whose
# silent int64 wrap bit anomaly_zscore_daily in r7) so both engines agree
# bit-for-bit before the q6 floor.

BASKET_MIN_PAIR = 2
#: orders with more distinct parts than this are dropped wholesale —
#: TPC-H baskets top out at 7 lines, real retail carts at a few hundred;
#: anything past this is a crawler/bot artifact whose C(n,2) pair mass
#: would dominate the relation (r9 verdict #4).
BASKET_MAX_ITEMS = 200


def basket_lift_pairs(
    lineitem: DataFrame,
    min_pair: int = BASKET_MIN_PAIR,
    max_basket: int = BASKET_MAX_ITEMS,
) -> DataFrame:
    items0 = lineitem.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
    ).distinct()
    # basket-size cap (r9 verdict #4): left_semi against the under-cap
    # order keys; the groupBy reuses the ok partitioning the pair
    # self-join needs anyway, so the guard adds no extra shuffle of the
    # items relation.
    keep = (
        items0.groupBy("ok")
        .agg(F.count(F.lit(1)).alias("_sz"))
        .filter(F.col("_sz") <= max_basket)
        .select("ok")
    )
    # r14 note: a memo_persist of this relation was measured and REJECTED
    # (+25% wall at sf0.1) — AQE executes the four consumer branches
    # concurrently, so the persist's materialization barrier costs more
    # than the duplicated distinct+cap chain it avoids.
    items = items0.join(keep, "ok", "left_semi")
    n_orders = items.groupBy().agg(
        F.countDistinct("ok").cast("long").alias("_n")
    )
    part_counts = items.groupBy("pk").agg(
        F.count(F.lit(1)).cast("long").alias("_c")
    )
    a = items.select("ok", F.col("pk").alias("part_a"))
    b = items.select("ok", F.col("pk").alias("part_b"))
    pairs = (
        a.join(b, "ok")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pair"))
        .filter(F.col("n_pair") >= min_pair)
    )
    out = (
        pairs.join(
            part_counts.select(F.col("pk").alias("part_a"), F.col("_c").alias("n_a")),
            "part_a",
        )
        .join(
            part_counts.select(F.col("pk").alias("part_b"), F.col("_c").alias("n_b")),
            "part_b",
        )
        .join(F.broadcast(n_orders))
    )
    supp = q6(F.col("n_pair") / F.col("_n"))
    lift = q6(
        (F.col("n_pair").cast("double") * F.col("_n"))
        / (F.col("n_a").cast("double") * F.col("n_b"))
    )
    return out.select(
        "part_a", "part_b", "n_pair", "n_a", "n_b",
        supp.alias("support"), lift.alias("lift"),
    )


def basket_lift_pairs_sql(
    min_pair: int = BASKET_MIN_PAIR, max_basket: int = BASKET_MAX_ITEMS
) -> str:
    supp = q6_sql("n_pair / _n")
    lift = q6_sql("(CAST(n_pair AS DOUBLE) * _n) / (CAST(n_a AS DOUBLE) * n_b)")
    return f"""
WITH items0 AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
keep AS (SELECT ok FROM items0 GROUP BY ok HAVING COUNT(*) <= {max_basket}),
items AS (SELECT i.ok, i.pk FROM items0 i JOIN keep k ON i.ok = k.ok),
totals AS (SELECT CAST(COUNT(DISTINCT ok) AS BIGINT) AS _n FROM items),
part_counts AS (SELECT pk, CAST(COUNT(*) AS BIGINT) AS _c FROM items GROUP BY pk),
pairs AS (
  SELECT a.pk AS part_a, b.pk AS part_b, CAST(COUNT(*) AS BIGINT) AS n_pair
  FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
  GROUP BY 1, 2
  HAVING COUNT(*) >= {min_pair}
)
SELECT p.part_a, p.part_b, p.n_pair,
       ca._c AS n_a, cb._c AS n_b,
       {supp} AS support, {lift} AS lift
FROM pairs p
JOIN part_counts ca ON ca.pk = p.part_a
JOIN part_counts cb ON cb.pk = p.part_b
CROSS JOIN totals
"""


# ---------------------------------------------------------------------------
# RFM segmentation — the classic recency/frequency/monetary customer
# scoring (quartile 4 = best on each axis), computed per market segment.
# Exact across engines end to end: recency is integer days against the
# corpus max order date (one 1-row broadcast scalar), frequency is a
# count, monetary folds int64 cents (the pricing_summary discipline),
# and the quartile is rank arithmetic — q = 1 + (4·(rn−1)) DIV n over a
# deterministic (metric, custkey) ordering — never a float percentile.
#
# Scale: the per-customer rollup is one map-side-combined groupBy on
# o_custkey; the segment join broadcasts nothing big (customer dim is
# key-projected). The rank windows partition by c_mktsegment (5 values)
# — exact quartiles per segment cost a SINGLE-TASK per-segment sort,
# which is the wrong 100 TB plan, so the operator is two-regime behind a
# size guard (the _pin_vocab_build discipline, text.py): up to
# RFM_EXACT_MAX_ROWS customers the rank windows run (exact, the oracle
# regime); above it the windows are replaced by approx quartile
# THRESHOLDS per segment — one percentile_approx agg (a |segments|-row
# relation), broadcast back, map-side CASE assignment, NO window sort
# anywhere in the plan. Boundary tolerance: the threshold regime puts
# every customer with the SAME metric value in the same quartile, while
# rank arithmetic splits ties by custkey across a quartile boundary —
# so the regimes agree everywhere except rows whose metric value ties a
# quartile boundary (and exactly when n_seg % 4 == 0 with distinct
# values, they agree everywhere; pinned in tests/test_round11.py).

#: Above this many per-customer rows the exact rank windows (one task
#: per market segment — 5 tasks total) would each sort ~n/5 customers;
#: switch to percentile_approx thresholds + map-side CASE.
RFM_EXACT_MAX_ROWS = 20_000_000


def rfm_segmentation(
    orders: DataFrame, customer: DataFrame, *, approx: bool | None = None
) -> DataFrame:
    """Per-customer RFM quartile scores within market segment.

    Returns (c_custkey, c_mktsegment, recency_days, frequency, monetary,
    r_q, f_q, m_q, rfm_score); rfm_score = 100·r + 10·f + m.

    ``approx=None`` auto-selects: exact rank quartiles while the
    per-customer relation fits RFM_EXACT_MAX_ROWS (the count rides a
    memoized base, so the guard action is not a second scan), else the
    broadcast-threshold regime.
    """
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    per = orders.groupBy("o_custkey").agg(
        F.max(F.col("o_orderdate").cast("date")).alias("last_date"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(cents).alias("monetary_c"),
    )
    anchor = orders.agg(F.max(F.col("o_orderdate").cast("date")).alias("anchor"))
    base = (
        per.crossJoin(F.broadcast(anchor))
        .select(
            "o_custkey",
            F.datediff("anchor", "last_date").cast("long").alias("recency_days"),
            "frequency",
            "monetary_c",
        )
        .join(
            customer.select(
                F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
            ),
            "o_custkey",
        )
    )
    if approx is None:
        base = memo_persist("rfm_base", base)
        approx = base.count() > RFM_EXACT_MAX_ROWS
    if approx:
        scored = _rfm_approx_scored(base)
    else:
        wseg = Window.partitionBy("c_mktsegment")
        ranked = base.select(
            "*",
            F.row_number()
            .over(wseg.orderBy(F.asc("recency_days"), F.asc("o_custkey")))
            .alias("rn_r"),
            F.row_number()
            .over(wseg.orderBy(F.asc("frequency"), F.asc("o_custkey")))
            .alias("rn_f"),
            F.row_number()
            .over(wseg.orderBy(F.asc("monetary_c"), F.asc("o_custkey")))
            .alias("rn_m"),
            F.count(F.lit(1)).over(wseg).alias("n_seg"),
        )
        scored = ranked.select(
            F.col("o_custkey").alias("c_custkey"),
            "c_mktsegment",
            "recency_days",
            "frequency",
            (F.col("monetary_c") / 100.0).alias("monetary"),
            F.expr("4 - (4 * (rn_r - 1)) DIV n_seg").cast("int").alias("r_q"),
            F.expr("1 + (4 * (rn_f - 1)) DIV n_seg").cast("int").alias("f_q"),
            F.expr("1 + (4 * (rn_m - 1)) DIV n_seg").cast("int").alias("m_q"),
        )
    return scored.withColumn(
        "rfm_score",
        (F.col("r_q") * 100 + F.col("f_q") * 10 + F.col("m_q")).cast("int"),
    )


def _rfm_approx_scored(base: DataFrame) -> DataFrame:
    """The threshold regime: per-segment approx quartile boundaries
    (one agg over the per-customer relation → |segments| rows),
    broadcast back, quartile = 1 + number of boundaries exceeded. No
    window, no per-segment sort — every step is a map-side expression
    after one broadcast hash join."""

    def _thr(col: str, alias: str):
        return F.percentile_approx(col, [0.25, 0.5, 0.75] , 10_000).alias(alias)

    thr = base.groupBy("c_mktsegment").agg(
        _thr("recency_days", "t_r"), _thr("frequency", "t_f"), _thr("monetary_c", "t_m")
    )

    def _above(col: str, t: str) -> Column:
        return sum(
            F.when(F.col(col) > F.col(t)[i], 1).otherwise(0) for i in range(3)
        )

    return base.join(F.broadcast(thr), "c_mktsegment").select(
        F.col("o_custkey").alias("c_custkey"),
        "c_mktsegment",
        "recency_days",
        "frequency",
        (F.col("monetary_c") / 100.0).alias("monetary"),
        # recency: smaller is better -> invert the exceed count
        (F.lit(4) - _above("recency_days", "t_r")).cast("int").alias("r_q"),
        (F.lit(1) + _above("frequency", "t_f")).cast("int").alias("f_q"),
        (F.lit(1) + _above("monetary_c", "t_m")).cast("int").alias("m_q"),
    )


RFM_SEGMENTATION_SQL = """
WITH per AS (
  SELECT o_custkey,
         MAX(CAST(o_orderdate AS DATE)) AS last_date,
         COUNT(*) AS frequency,
         SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS monetary_c
  FROM orders GROUP BY o_custkey
),
anchor AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS anchor FROM orders),
base AS (
  SELECT p.o_custkey,
         CAST(date_diff('day', p.last_date, a.anchor) AS BIGINT) AS recency_days,
         p.frequency, p.monetary_c, c.c_mktsegment
  FROM per p CROSS JOIN anchor a
  JOIN customer c ON c.c_custkey = p.o_custkey
),
ranked AS (
  SELECT *,
    row_number() OVER (PARTITION BY c_mktsegment ORDER BY recency_days, o_custkey) AS rn_r,
    row_number() OVER (PARTITION BY c_mktsegment ORDER BY frequency, o_custkey) AS rn_f,
    row_number() OVER (PARTITION BY c_mktsegment ORDER BY monetary_c, o_custkey) AS rn_m,
    COUNT(*) OVER (PARTITION BY c_mktsegment) AS n_seg
  FROM base
)
SELECT c_custkey, c_mktsegment, recency_days, frequency, monetary,
       r_q, f_q, m_q,
       CAST(r_q * 100 + f_q * 10 + m_q AS INT) AS rfm_score
FROM (
  SELECT o_custkey AS c_custkey, c_mktsegment, recency_days, frequency,
         monetary_c / 100.0 AS monetary,
         CAST(4 - (4 * (rn_r - 1)) // n_seg AS INT) AS r_q,
         CAST(1 + (4 * (rn_f - 1)) // n_seg AS INT) AS f_q,
         CAST(1 + (4 * (rn_m - 1)) // n_seg AS INT) AS m_q
  FROM ranked
)
"""


# ---------------------------------------------------------------------------
# Burstiness report — per event type, how far the daily arrival process
# is from Poisson (Goh & Barabási burstiness; a training-data curation
# signal: bursty event/log sources are crawl artifacts or incidents, not
# steady behavior, and get down-weighted in mixtures). Everything folds
# as exact int64 (daily counts, their squares, the peak), and every
# emitted float is ONE division of exact integers — engine-identical
# IEEE, no rounding step needed:
#   mean_daily = S1/n,  fano = (n·S2 − S1²)/(n·S1)   [= var/mean],
#   peak_ratio = (peak·n)/S1                          [peak vs mean].
# Scale: two map-side-combined groupBys (events → daily counts → per-
# type moments); the moment relation is |types|·|days| — tiny. Bound:
# n·S2 needs |days|·Σc² inside int64 — fine until a single type logs
# ~10⁹ events/day for years; past that the fold widens to DECIMAL(38).


def burstiness_report(events: DataFrame) -> DataFrame:
    """Per-event-type daily-count dispersion: (event_type, n_days,
    total, peak, mean_daily, fano, peak_ratio). Fano 1 ≈ Poisson,
    >1 overdispersed/bursty."""
    daily = events.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("c"))
    per = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("c").alias("total"),
        F.sum(F.col("c") * F.col("c")).alias("s2"),
        F.max("c").alias("peak"),
    )
    return per.select(
        "event_type",
        "n_days",
        "total",
        "peak",
        (F.col("total") / F.col("n_days")).alias("mean_daily"),
        (
            (F.col("n_days") * F.col("s2") - F.col("total") * F.col("total"))
            / (F.col("n_days") * F.col("total"))
        ).alias("fano"),
        ((F.col("peak") * F.col("n_days")) / F.col("total")).alias("peak_ratio"),
    )


BURSTINESS_REPORT_SQL = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS c
  FROM events GROUP BY event_type, CAST(ts AS DATE)
),
per AS (
  SELECT event_type,
         COUNT(*) AS n_days,
         CAST(SUM(c) AS BIGINT) AS total,
         CAST(SUM(c * c) AS BIGINT) AS s2,
         MAX(c) AS peak
  FROM daily GROUP BY event_type
)
SELECT event_type, n_days, total, peak,
       CAST(total AS DOUBLE) / n_days AS mean_daily,
       CAST(n_days * s2 - total * total AS DOUBLE) / (n_days * total) AS fano,
       CAST(peak * n_days AS DOUBLE) / total AS peak_ratio
FROM per
"""


# ---------------------------------------------------------------------------
# Top event paths — classic product-analytics path analysis: gap-based
# sessions (the session_windows recipe: lag + running sum, exact in
# both engines), each session reduced to its first ``max_steps`` event
# types joined with '>', then the corpus-wide path frequency table,
# top-N by (count, path). The behavioral complement of the Markov
# transition matrix (event_transition_report gives edge probabilities;
# this gives the actual head of the full-path distribution). Scale: one
# user-keyed window pass (same shuffle session_windows already pays), a
# session-keyed fold, and a path-keyed count whose relation is bounded
# by |distinct paths| ≤ |event types|^max_steps in the worst case but
# the head is tiny; top-N is a TakeOrderedAndProject heap, never a
# global sort materialization. Deterministic: (ts, event_id) event
# order, (count DESC, path) tie-break.

PATH_GAP_MINUTES = 30
PATH_MAX_STEPS = 5
PATH_TOP_N = 20


def top_event_paths(
    events: DataFrame,
    gap_minutes: int = PATH_GAP_MINUTES,
    max_steps: int = PATH_MAX_STEPS,
    top_n: int = PATH_TOP_N,
) -> DataFrame:
    """Most frequent session-opening paths: (path, n_sessions)."""
    from pyspark.sql.window import Window as W

    gap_us = gap_minutes * 60 * 1_000_000
    w = W.partitionBy("user_id").orderBy(F.col("ts"), F.col("event_id"))
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    prev_us = F.lag(us).over(w)
    is_new = F.when(prev_us.isNull() | ((us - prev_us) > gap_us), 1).otherwise(0)
    sess = events.withColumn(
        "session_idx",
        F.sum(is_new).over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    evs = (
        sess.groupBy("user_id", "session_idx")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        us.alias("us"),
                        F.col("event_id").alias("eid"),
                        F.col("event_type").alias("t"),
                    )
                )
            ).alias("evs")
        )
        .select(
            F.concat_ws(
                ">", F.slice(F.transform("evs", lambda s: s["t"]), 1, max_steps)
            ).alias("path")
        )
    )
    return (
        evs.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), F.asc("path"))
        .limit(top_n)
    )


def top_event_paths_sql(
    gap_minutes: int = PATH_GAP_MINUTES,
    max_steps: int = PATH_MAX_STEPS,
    top_n: int = PATH_TOP_N,
) -> str:
    gap_us = gap_minutes * 60 * 1_000_000
    return f"""
WITH flagged AS (
  SELECT user_id, event_id, event_type, ts,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                   OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {gap_us}
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, event_id, event_type, ts,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM flagged
),
paths AS (
  SELECT array_to_string(
           list_slice(list(event_type ORDER BY epoch_us(ts), event_id),
                      1, {max_steps}), '>') AS path
  FROM sessions GROUP BY user_id, session_idx
)
SELECT path, COUNT(*) AS n_sessions
FROM paths GROUP BY path
ORDER BY n_sessions DESC, path
LIMIT {top_n}
"""


# ---------------------------------------------------------------------------
# Data-quality report — the Deequ/Great-Expectations-style declarative
# constraint check, the gate every production ingest runs before data
# reaches training or BI: per-column completeness, key uniqueness,
# domain membership, range sanity, and cross-table referential
# integrity, each reported as (check_name, n_checked, n_violations, passed).
# All counts are exact integers folded map-side; the referential check
# is one left-anti join on the key (broadcast when the dimension is
# small, AQE otherwise) — nothing here is corpus²; a 100 TB ingest pays
# one scan + one key join for the whole battery (the single-pass
# aggregations share the same scan via one agg projection).

DQ_ALLOWED_STATUS = ("O", "F", "P")


def data_quality_report(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """Constraint battery over orders (+customer for referential
    integrity): (check_name, n_checked, n_violations, passed)."""
    n = F.count(F.lit(1))
    one_pass = orders.agg(
        n.alias("n_rows"),
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0)).alias("v_custkey_null"),
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)).alias("v_price_nonpos"),
        F.sum(
            F.when(
                (F.col("o_orderdate") < F.lit("1992-01-01"))
                | (F.col("o_orderdate") >= F.lit("2005-01-01")),
                1,
            ).otherwise(0)
        ).alias("v_date_range"),
        F.sum(
            F.when(~F.col("o_orderstatus").isin(*DQ_ALLOWED_STATUS), 1).otherwise(0)
        ).alias("v_status_domain"),
        (n - F.count_distinct(F.col("o_orderkey"))).alias("v_key_dup"),
    ).first()
    orphans = (
        # null keys are the completeness check's finding, not an orphan
        orders.filter(F.col("o_custkey").isNotNull())
        .join(
            customer.select(F.col("c_custkey").alias("o_custkey")),
            "o_custkey",
            "left_anti",
        )
        .count()
    )
    spark = orders.sparkSession
    z = lambda v: 0 if v is None else v  # noqa: E731 — empty-corpus SUMs are NULL
    rows = [
        ("orderkey_unique", one_pass["n_rows"], z(one_pass["v_key_dup"])),
        ("custkey_complete", one_pass["n_rows"], z(one_pass["v_custkey_null"])),
        ("custkey_references_customer", one_pass["n_rows"], orphans),
        ("totalprice_positive", one_pass["n_rows"], z(one_pass["v_price_nonpos"])),
        ("orderdate_in_range", one_pass["n_rows"], z(one_pass["v_date_range"])),
        ("status_in_domain", one_pass["n_rows"], z(one_pass["v_status_domain"])),
    ]
    return spark.createDataFrame(
        [(c, int(nc), int(nv), bool(nv == 0)) for c, nc, nv in rows],
        "check_name string, n_checked long, n_violations long, passed boolean",
    )


DATA_QUALITY_REPORT_SQL = """
WITH one_pass AS (
  SELECT COUNT(*) AS n_rows,
         CAST(COALESCE(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS v_custkey_null,
         CAST(COALESCE(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END), 0) AS BIGINT) AS v_price_nonpos,
         CAST(COALESCE(SUM(CASE WHEN o_orderdate < TIMESTAMP '1992-01-01'
                        OR o_orderdate >= TIMESTAMP '2005-01-01' THEN 1 ELSE 0 END), 0) AS BIGINT) AS v_date_range,
         CAST(COALESCE(SUM(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END), 0) AS BIGINT) AS v_status_domain,
         CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS v_key_dup
  FROM orders
),
orphans AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS v FROM orders o
  WHERE o.o_custkey IS NOT NULL
    AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
)
SELECT check_name, n_checked, n_violations, n_violations = 0 AS passed FROM (
  SELECT 'orderkey_unique' AS check_name, n_rows AS n_checked, v_key_dup AS n_violations FROM one_pass
  UNION ALL SELECT 'custkey_complete', n_rows, v_custkey_null FROM one_pass
  UNION ALL SELECT 'custkey_references_customer', n_rows, orphans.v FROM one_pass, orphans
  UNION ALL SELECT 'totalprice_positive', n_rows, v_price_nonpos FROM one_pass
  UNION ALL SELECT 'orderdate_in_range', n_rows, v_date_range FROM one_pass
  UNION ALL SELECT 'status_in_domain', n_rows, v_status_domain FROM one_pass
)
"""


# ---------------------------------------------------------------------------
# k-anonymity report — the privacy gate a training-data exporter runs
# before tabular/user-derived data ships (Sweeney 2002: a row is
# k-anonymous iff at least k rows share its quasi-identifier
# combination; re-identification risk concentrates in the small
# equivalence classes). Output: one row per equivalence-class SIZE with
# how many classes and rows sit at that size, plus the at-risk flag for
# sizes below k — the histogram auditors actually read (min k, share of
# rows below threshold) falls out of it by inspection, and every number
# is an exact integer count.
#
# Scale: two map-side-combined groupBys (rows → class sizes → size
# histogram); the histogram relation is ≤ |distinct class sizes| — tiny.
# NULL quasi-identifier values form their own classes (SQL GROUP BY
# semantics in both engines — NULLs group together).

K_ANON_THRESHOLD = 5


def k_anonymity_report(
    customer: DataFrame, k: int = K_ANON_THRESHOLD
) -> DataFrame:
    """(class_size, n_classes, n_rows, at_risk) over the quasi-identifier
    (c_mktsegment, c_nationkey): how exposed is each equivalence class?"""
    classes = customer.groupBy("c_mktsegment", "c_nationkey").agg(
        F.count(F.lit(1)).alias("class_size")
    )
    return (
        classes.groupBy("class_size")
        .agg(F.count(F.lit(1)).alias("n_classes"))
        .select(
            F.col("class_size").cast("long").alias("class_size"),
            F.col("n_classes").cast("long").alias("n_classes"),
            (F.col("class_size") * F.col("n_classes"))
            .cast("long")
            .alias("n_rows"),
            (F.col("class_size") < k).alias("at_risk"),
        )
    )


def k_anonymity_report_sql(k: int = K_ANON_THRESHOLD) -> str:
    return f"""
WITH classes AS (
  SELECT c_mktsegment, c_nationkey, COUNT(*) AS class_size
  FROM customer GROUP BY 1, 2
)
SELECT CAST(class_size AS BIGINT) AS class_size,
       CAST(COUNT(*) AS BIGINT) AS n_classes,
       CAST(class_size * COUNT(*) AS BIGINT) AS n_rows,
       class_size < {k} AS at_risk
FROM classes GROUP BY class_size
"""


L_DIVERSITY_THRESHOLD = 3


def l_diversity_report(
    customer: DataFrame, l_threshold: int = L_DIVERSITY_THRESHOLD
) -> DataFrame:
    """Distinct l-diversity (Machanavajjhala et al. 2007) over the same
    quasi-identifier as k_anonymity_report, with the account-balance
    thousand-band as the sensitive attribute: a class whose members
    share too few distinct sensitive values leaks the attribute even
    when k-anonymous. (l_distinct, n_classes, n_rows, at_risk) — two
    map-side-combined groupBys, exact integer counts."""
    classes = (
        customer.select(
            "c_mktsegment",
            "c_nationkey",
            F.floor(F.col("c_acctbal") / 1000).cast("long").alias("_band"),
        )
        .groupBy("c_mktsegment", "c_nationkey")
        .agg(
            F.countDistinct("_band").alias("l_distinct"),
            F.count(F.lit(1)).alias("class_size"),
        )
    )
    return (
        classes.groupBy("l_distinct")
        .agg(
            F.count(F.lit(1)).alias("n_classes"),
            F.sum("class_size").alias("n_rows"),
        )
        .select(
            F.col("l_distinct").cast("long").alias("l_distinct"),
            F.col("n_classes").cast("long").alias("n_classes"),
            F.col("n_rows").cast("long").alias("n_rows"),
            (F.col("l_distinct") < l_threshold).alias("at_risk"),
        )
    )


def l_diversity_report_sql(l_threshold: int = L_DIVERSITY_THRESHOLD) -> str:
    return f"""
WITH classes AS (
  SELECT c_mktsegment, c_nationkey,
         COUNT(DISTINCT CAST(floor(c_acctbal / 1000) AS BIGINT)) AS l_distinct,
         COUNT(*) AS class_size
  FROM customer GROUP BY 1, 2
)
SELECT CAST(l_distinct AS BIGINT) AS l_distinct,
       CAST(COUNT(*) AS BIGINT) AS n_classes,
       CAST(SUM(class_size) AS BIGINT) AS n_rows,
       l_distinct < {l_threshold} AS at_risk
FROM classes GROUP BY l_distinct
"""


# ---------------------------------------------------------------------------
# CUSUM changepoint detection (Page 1954) over the daily revenue series
# per order priority — the monitoring-side complement of
# anomaly_zscore_daily (which scores single days; CUSUM accumulates
# small persistent shifts). The sequential recursion
# S_t = max(0, S_{t-1} + (x_t - mean)) has the classic closed form
# S_t = P_t - min_{j<=t} P_j over the deviation prefix P — which makes
# CUSUM pure window algebra: one running sum + one running min/max, no
# fold, no Python. All internal arithmetic is EXACT (decimal(38,0)
# scaled prefixes: P_t = n*prefix_t - t*total is n times the deviation
# prefix, integer-exact and wrap-safe at any corpus size); doubles
# appear only in the final ratio (correctly-rounded conversions of
# exact values are bit-identical cross-engine, the q6 discipline).
#
# Scale: the window runs over the POST-AGGREGATION day series (#days
# rows per key, thousands), not over raw orders — the heavy daily
# rollup beneath it is an ordinary map-side-combined groupBy. The
# 5-value partition key is fine HERE precisely because the partitioned
# relation is day-grain tiny (contrast rfm_segmentation's guard, which
# exists because its windows ran over the full customer relation).


def cusum_changepoints(orders: DataFrame) -> DataFrame:
    """Two-sided CUSUM per (o_orderpriority) daily-revenue series:
    (o_orderpriority, day, x_cents, excess_up, excess_down, alarm_up,
    alarm_down). ``excess_*`` is the CUSUM statistic in units of the
    series' average day (S_t / mean_day = n-scaled S / total, exact
    ints → one double division, q6-floored); the alarm threshold is
    half an average day: 2*S > total, an integer comparison."""
    daily = (
        orders.select(
            "o_orderpriority",
            F.date_trunc("day", F.col("o_orderdate")).cast("date").alias("day"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("_c"),
        )
        .groupBy("o_orderpriority", "day")
        .agg(F.sum("_c").alias("x_cents"))
    )
    totals = daily.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("_n"),
        # sum in decimal, not long: a long SUM can wrap before the cast
        # (the SQL twin sums in HUGEINT for the same reason)
        F.sum(F.col("x_cents").cast("decimal(38,0)")).alias("_total"),
    )
    w = Window.partitionBy("o_orderpriority").orderBy("day")
    run = (
        daily.join(totals, "o_orderpriority")
        .withColumn("_t", F.row_number().over(w))
        .withColumn(
            "_prefix",
            F.sum(F.col("x_cents").cast("decimal(38,0)")).over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .withColumn(
            "_p",
            F.col("_n").cast("decimal(38,0)") * F.col("_prefix")
            - F.col("_t").cast("decimal(38,0)") * F.col("_total"),
        )
    )
    pw = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # _p is the n-scaled deviation prefix, so S_unscaled = s/_n and the
    # average day is _total/_n: S_unscaled / avg_day = s / _total — the
    # n-scaling cancels against _total alone. Page's recursion
    # S_t = max(0, S_{t-1} + d_t) has closed form
    # S_t = P_t - min_{0<=j<=t} P_j with the VIRTUAL ZERO PREFIX P_0=0
    # included in the extremum — so the running min is clamped at 0
    # (and the max at 0 for the downward side); without the clamp a
    # series that starts above the overall mean understates the
    # statistic and alarms late.
    zero = F.lit(0).cast("decimal(38,0)")
    s_up = F.col("_p") - F.least(F.min("_p").over(pw), zero)
    s_dn = F.greatest(F.max("_p").over(pw), zero) - F.col("_p")
    return run.select(
        "o_orderpriority",
        F.col("day").cast("string").alias("day"),
        "x_cents",
        q6(s_up.cast("double") / F.col("_total").cast("double")).alias("excess_up"),
        q6(s_dn.cast("double") / F.col("_total").cast("double")).alias("excess_down"),
        (s_up * 2 > F.col("_total")).alias("alarm_up"),
        (s_dn * 2 > F.col("_total")).alias("alarm_down"),
    )


CUSUM_CHANGEPOINTS_SQL = """
WITH daily AS (
  SELECT o_orderpriority, CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS x_cents
  FROM orders GROUP BY 1, 2
), totals AS (
  SELECT o_orderpriority, COUNT(*) AS n,
         CAST(SUM(x_cents) AS HUGEINT) AS total
  FROM daily GROUP BY 1
), run AS (
  SELECT d.o_orderpriority, d.day, d.x_cents, t.n, t.total,
         ROW_NUMBER() OVER w AS tt,
         SUM(CAST(d.x_cents AS HUGEINT)) OVER (PARTITION BY d.o_orderpriority
              ORDER BY d.day ROWS UNBOUNDED PRECEDING) AS prefix
  FROM daily d JOIN totals t USING (o_orderpriority)
  WINDOW w AS (PARTITION BY d.o_orderpriority ORDER BY d.day)
), p AS (
  SELECT *, CAST(n AS HUGEINT) * prefix - CAST(tt AS HUGEINT) * total AS pp
  FROM run
), s AS (
  SELECT *,
         pp - LEAST(MIN(pp) OVER pw, 0) AS s_up,
         GREATEST(MAX(pp) OVER pw, 0) - pp AS s_dn,
         total AS st
  FROM p
  WINDOW pw AS (PARTITION BY o_orderpriority ORDER BY day ROWS UNBOUNDED PRECEDING)
)
SELECT o_orderpriority, CAST(day AS VARCHAR) AS day, x_cents,
       floor((CAST(s_up AS DOUBLE) / CAST(st AS DOUBLE)) * 1000000.0) / 1000000.0 AS excess_up,
       floor((CAST(s_dn AS DOUBLE) / CAST(st AS DOUBLE)) * 1000000.0) / 1000000.0 AS excess_down,
       s_up * 2 > st AS alarm_up,
       s_dn * 2 > st AS alarm_down
FROM s
"""


def dynamic_rule_hits(events: DataFrame) -> DataFrame:
    """Oracle-backed witness for the broadcast-rule evaluation kernel
    (streaming/rules.py): one deterministic rule per event type —
    threshold = the type's average value in cents (exact int sums, one
    correctly-rounded division) — evaluated with the same broadcast
    join the engine uses. Output: (rule_id, event_id, user_id, us,
    value) for every event at or above its type's average."""
    from flink_streaming_etl_spark.streaming.rules import evaluate_rules

    agg = (
        events.select(
            "event_type",
            F.round(F.col("value") * 100).cast("long").alias("_c"),
        )
        .groupBy("event_type")
        .agg(
            (F.sum("_c").cast("double") / F.count(F.lit(1)).cast("double") / 100.0)
            .alias("min_value"),
        )
    )
    rules = agg.select(
        F.row_number()
        .over(Window.orderBy("event_type"))
        .cast("long")
        .alias("rule_id"),
        "event_type",
        "min_value",
    )
    return evaluate_rules(events, rules)


DYNAMIC_RULE_HITS_SQL = """
WITH agg AS (
  SELECT event_type,
         CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE) / 100.0 AS min_value
  FROM events GROUP BY event_type
), rules AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY event_type) AS BIGINT) AS rule_id,
         event_type, min_value
  FROM agg
)
SELECT r.rule_id, e.event_id, e.user_id, epoch_us(e.ts) AS us, e.value
FROM events e JOIN rules r
  ON e.event_type = r.event_type AND e.value >= r.min_value
"""
