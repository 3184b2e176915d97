"""Extended relational coverage: deeper TPC-H-style joins/aggs, window analytics,
sessionization, and the CSV option-surface round-trip. All oracle-backed.
"""

from __future__ import annotations

import os
import re
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hudi_examples_spark.operators.relational import _dec, _dsum
from hudi_examples_spark.operators.spec import QuerySpec
from hudi_examples_spark.sources.readers import load_sf_table as t


def q4_order_priority(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS semi-join + priority counts."""
    o = t(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    l = t(spark, sf, "lineitem").select("l_orderkey").distinct()
    return (
        o.join(l, o.o_orderkey == l.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q4_ORACLE = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-07-01' AND o_orderdate < TIMESTAMP '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o.o_orderkey)
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def q7_nation_volume(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q7 shape: supplier-nation x customer-nation shipping volume by year."""
    l = t(spark, sf, "lineitem")
    o = t(spark, sf, "orders")
    c = t(spark, sf, "customer")
    s = t(spark, sf, "supplier")
    n1 = t(spark, sf, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = t(spark, sf, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("s_nk"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("c_nk"))
        .filter(F.col("supp_nation") < F.col("cust_nation"))
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("l_year")
        )
        .agg(_dsum(_dec("l_extendedprice") * (1 - _dec("l_discount")), "revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


Q7_ORACLE = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INT) AS l_year,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
     JOIN customer ON o_custkey = c_custkey
     JOIN supplier ON l_suppkey = s_suppkey
     JOIN nation n1 ON s_nationkey = n1.n_nationkey
     JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE n1.n_name < n2.n_name
GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""


def q14_promo_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q14 shape: conditional-aggregate ratio over a part join."""
    l = t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-02-01").cast("timestamp"))
    )
    p = t(spark, sf, "part")
    rev = _dec("l_extendedprice") * (1 - _dec("l_discount"))
    zero = F.lit(0).cast("decimal(38,4)")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            F.sum(F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(zero))
            .cast("double")
            .alias("__promo"),
            F.sum(rev).cast("double").alias("__total"),
        )
        .select(F.round(F.col("__promo") * 100.0 / F.col("__total"), 4).alias("promo_revenue_pct"))
    )


Q14_ORACLE = """
SELECT round(CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
                         THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
                         ELSE 0 END) AS DOUBLE) * 100.0
             / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 4) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-02-01'
"""


def q18_large_orders(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING on a grouped sum, re-joined to dimensions."""
    l = t(spark, sf, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 250)
    )
    o = t(spark, sf, "orders")
    c = t(spark, sf, "customer")
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.round("sum_qty", 2).alias("sum_qty"),
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


Q18_ORACLE = """
WITH big AS (
  SELECT l_orderkey, sum(l_quantity) AS sum_qty FROM lineitem
  GROUP BY l_orderkey HAVING sum(l_quantity) > 250
)
SELECT c_name, c_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       round(o_totalprice, 2) AS o_totalprice, round(sum_qty, 2) AS sum_qty
FROM big JOIN orders ON l_orderkey = o_orderkey
     JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
"""


def q19_bracket_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q19 shape: disjunctive multi-predicate join (brand x quantity brackets)."""
    l = t(spark, sf, "lineitem")
    p = t(spark, sf, "part")
    j = l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#1") & (F.col("l_quantity").between(1, 20)) & (F.col("p_size") <= 20))
        | ((F.col("p_brand") == "Brand#2") & (F.col("l_quantity").between(10, 30)) & (F.col("p_size") <= 30))
        | ((F.col("p_brand") == "Brand#3") & (F.col("l_quantity").between(20, 40)))
    )
    return j.filter(cond).agg(
        _dsum(_dec("l_extendedprice") * (1 - _dec("l_discount")), "revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


Q19_ORACLE = """
SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 20 AND p_size <= 20)
   OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 30 AND p_size <= 30)
   OR (p_brand = 'Brand#3' AND l_quantity BETWEEN 20 AND 40)
"""


def w_running_totals(spark: SparkSession, sf: str) -> DataFrame:
    """Window analytics: running event-count + value cumsum per user (§2.5 depth)."""
    e = t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id",
        "event_id",
        F.row_number().over(w).alias("seq"),
        F.round(F.sum(_dec("value")).over(w), 2).cast("double").alias("running_value"),
        F.lag("event_id", 1).over(w).alias("prev_event_id"),
    )


W_RUNNING_ORACLE = """
SELECT user_id, event_id,
       CAST(row_number() OVER w AS INT)   AS seq,
       CAST(round(sum(CAST(value AS DECIMAL(18,2))) OVER w, 2) AS DOUBLE) AS running_value,
       lag(event_id, 1) OVER w            AS prev_event_id
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
"""


def w_sessionization(spark: SparkSession, sf: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity) via lag + running session ids —
    the batch form of the streaming session-window operator."""
    e = t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts", 1).over(w))
    new_sess = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    sess = e.select(
        "user_id", "event_id", "ts", "value", new_sess.alias("is_new")
    ).withColumn("session_no", F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    return (
        sess.groupBy("user_id", "session_no")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _dsum(_dec("value"), "session_value"),
        )
        .orderBy("user_id", "session_no")
    )


W_SESSION_ORACLE = """
WITH seq AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR date_diff('second', lag(ts) OVER w, ts) > 1800
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS session_no
  FROM seq
)
SELECT user_id, CAST(session_no AS BIGINT) AS session_no, count(*) AS n_events,
       CAST(round(sum(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS session_value
FROM sess GROUP BY user_id, session_no ORDER BY user_id, session_no
"""


def w_interval_frames(spark: SparkSession, sf: str) -> DataFrame:
    """Interval (RANGE) window frames — the §2.5 surface the ROWS battery
    doesn't touch: a 30-day trailing revenue sum and order count per customer
    (``RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW``, expressed
    in Spark as a ``rangeBetween`` over epoch seconds — identical inclusive
    bounds since order dates are UTC-midnight timestamps), contrasted with a
    3-order ROWS frame over the same partition. RANGE frames include ORDER
    BY peers on both engines, so same-date orders agree by construction;
    sums run over DECIMAL(18,2) casts so frame totals are exact, not
    float-order-dependent.

    Shape: one shuffle keyed on the customer — both frames share the single
    Window exchange (PLANS.md shows 2 total: the window exchange plus the
    presentation orderBy); at 100 TB this is the canonical
    time-windowed-metrics scan, embarrassingly parallel across keys."""
    o = t(spark, sf, "orders").filter(F.col("o_custkey") % 50 == 0)
    w30 = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-30 * 86400, 0)
    )
    wr = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, 0)
    )
    return o.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("orderkey"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("odate"),
        F.round(F.sum(_dec("o_totalprice")).over(w30), 2).cast("double").alias("rev_30d"),
        F.count(F.lit(1)).over(w30).cast("bigint").alias("n_30d"),
        F.round(F.sum(_dec("o_totalprice")).over(wr), 2).cast("double").alias("sum_last3"),
    ).orderBy("custkey", "odate", "orderkey")


W_INTERVAL_ORACLE = """
SELECT o_custkey AS custkey, o_orderkey AS orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS odate,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w30, 2) AS DOUBLE) AS rev_30d,
       count(*) OVER w30 AS n_30d,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER wr, 2) AS DOUBLE) AS sum_last3
FROM orders
WHERE o_custkey % 50 = 0
WINDOW
  w30 AS (PARTITION BY o_custkey ORDER BY o_orderdate
          RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW),
  wr AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
ORDER BY custkey, odate, orderkey
"""


def s_csv_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """S5: CSV external-table option surface (sep='|', no header, explicit DDL —
    ``Datagen.py:39-72``) proven by a write→read round-trip against the oracle."""
    sub = t(spark, sf, "nation")
    out = os.path.join(
        tempfile.gettempdir(),
        "hudi_examples_spark_csv",
        re.sub(r"[^A-Za-z0-9]", "_", sf),
    )
    if os.path.exists(out):
        shutil.rmtree(out)
    sub.coalesce(1).write.option("sep", "|").option("header", "false").csv(out)
    from hudi_examples_spark.sources.readers import read_csv_ddl

    return read_csv_ddl(
        spark, out, "n_nationkey INT, n_name STRING, n_regionkey INT", sep="|"
    ).orderBy("n_nationkey")


S_CSV_ORACLE = "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey"


def s_orc_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """ORC source/sink: write the supplier dim as ORC, read it back with a
    declared schema — proves the columnar alternative format round-trips
    values exactly (oracle compares against the parquet original)."""
    sub = t(spark, sf, "supplier").select("s_suppkey", "s_name", "s_acctbal")
    out = os.path.join(
        tempfile.gettempdir(),
        "hudi_examples_spark_orc",
        re.sub(r"[^A-Za-z0-9]", "_", sf),
    )
    if os.path.exists(out):
        shutil.rmtree(out)
    sub.write.orc(out)
    from hudi_examples_spark.sources.readers import read_orc

    return read_orc(
        spark, out, "s_suppkey BIGINT, s_name STRING, s_acctbal DOUBLE"
    ).orderBy("s_suppkey")


S_ORC_ORACLE = """
SELECT s_suppkey, s_name, CAST(s_acctbal AS DOUBLE) AS s_acctbal
FROM supplier ORDER BY s_suppkey
"""


def a_grouping_sets(spark: SparkSession, sf: str) -> DataFrame:
    """GROUPING SETS ((priority,status),(priority),()) over orders — the
    multi-granularity report shape between plain GROUP BY and CUBE. One
    shuffle; Spark expands the sets map-side (Expand operator), so cost is
    ~|sets| × input rows of partial aggregation, no extra exchanges."""
    o = t(spark, sf, "orders")
    gd = o.groupingSets(
        [[F.col("o_orderpriority"), F.col("o_orderstatus")], [F.col("o_orderpriority")], []],
        "o_orderpriority",
        "o_orderstatus",
    )
    return (
        gd.agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .select(
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            "n_orders",
            "total_price",
        )
        .orderBy("priority", "status")
    )


A_GROUPING_SETS_ORACLE = """
SELECT coalesce(o_orderpriority, 'ALL') AS priority,
       coalesce(o_orderstatus, 'ALL') AS status,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS total_price
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus), (o_orderpriority), ())
ORDER BY priority, status
"""


def a_sketch_profile(
    spark: SparkSession, sf: str, oracle_mode: bool = False
) -> DataFrame:
    """Sketch-based profile per order priority: HyperLogLog++ distinct
    customers and approximate total-price quantiles. The 100 TB shape for
    distinct-count/quantile reporting: sketches merge associatively in
    partial aggregation (fixed-size state per group), so no exact
    distinct-shuffle of the full key set ever happens. The default
    (production) form is sketch-only — one aggregation pass, no exact
    distinct, no second scan.

    ``oracle_mode=True`` (the registered QuerySpec) is the gate-certifiable
    form: DuckDB's approx algorithms differ, so the sketch values themselves
    can never hash-match.  Instead it emits the exact distinct count / row
    count (hashable) plus `within_bounds` booleans asserting the sketch
    landed inside its published error bound — HLL++ rsd (0.02, checked at
    3×rsd) and percentile_approx rank error (checked at ±0.01 rank).  The
    oracle computes the exact columns and literal TRUEs; a sketch gone wrong
    flips a boolean and fails the hash.  The exact columns and the rank-check
    pass are gate instrumentation only — production never pays them (same
    gate/production split as dedup_minhash_lsh's hash families).  Tighter
    error-bound assertions live in tests/test_sketches.py."""
    o = t(spark, sf, "orders")
    if not oracle_mode:
        return (
            o.groupBy("o_orderpriority")
            .agg(
                F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx_customers"),
                F.percentile_approx("o_totalprice", [0.5, 0.95], 10000).alias("price_q"),
                F.count(F.lit(1)).alias("n_orders"),
            )
            .select(
                "o_orderpriority",
                "approx_customers",
                F.round(F.col("price_q")[0], 2).alias("p50_price"),
                F.round(F.col("price_q")[1], 2).alias("p95_price"),
                "n_orders",
            )
            .orderBy("o_orderpriority")
        )
    prof = (
        o.groupBy("o_orderpriority")
        .agg(
            F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx_customers"),
            F.count_distinct("o_custkey").alias("exact_customers"),
            F.percentile_approx("o_totalprice", [0.5, 0.95], 10000).alias("price_q"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .select(
            "o_orderpriority",
            "approx_customers",
            "exact_customers",
            F.col("price_q")[0].alias("p50_approx"),
            F.col("price_q")[1].alias("p95_approx"),
            "n_orders",
        )
        # materialize the 5-row profile once: it feeds both the rank check
        # and the final projection, and the rank booleans must validate the
        # SAME sketch execution they are joined with
        .localCheckpoint(eager=True)
    )
    # Rank-check the approx quantiles: fraction of rows <= returned value must
    # sit within eps of the target rank. One extra pass over orders with the
    # tiny (5-row) profile broadcast — no second shuffle of the fact table.
    ranks = (
        o.select("o_orderpriority", "o_totalprice")
        .join(
            F.broadcast(prof.select("o_orderpriority", "p50_approx", "p95_approx")),
            "o_orderpriority",
        )
        .groupBy("o_orderpriority")
        .agg(
            (
                F.sum(F.when(F.col("o_totalprice") <= F.col("p50_approx"), 1).otherwise(0))
                / F.count(F.lit(1))
            ).alias("p50_frac"),
            (
                F.sum(F.when(F.col("o_totalprice") <= F.col("p95_approx"), 1).otherwise(0))
                / F.count(F.lit(1))
            ).alias("p95_frac"),
        )
    )
    return (
        prof.join(F.broadcast(ranks), "o_orderpriority")
        .select(
            "o_orderpriority",
            "exact_customers",
            "n_orders",
            (
                F.abs(F.col("approx_customers") - F.col("exact_customers"))
                / F.col("exact_customers")
                <= F.lit(0.06)
            ).alias("customers_within_bounds"),
            ((F.col("p50_frac") >= 0.49) & (F.col("p50_frac") <= 0.51)).alias(
                "p50_rank_ok"
            ),
            ((F.col("p95_frac") >= 0.94) & (F.col("p95_frac") <= 0.96)).alias(
                "p95_rank_ok"
            ),
        )
        .orderBy("o_orderpriority")
    )


def _a_sketch_profile_oracle_mode(spark: SparkSession, sf: str) -> DataFrame:
    """The registered (driver-gated) variant: exact columns + within-bounds
    booleans; production default stays sketch-only."""
    return a_sketch_profile(spark, sf, oracle_mode=True)


A_SKETCH_ORACLE = """
SELECT o_orderpriority,
       count(DISTINCT o_custkey) AS exact_customers,
       count(*) AS n_orders,
       TRUE AS customers_within_bounds,
       TRUE AS p50_rank_ok,
       TRUE AS p95_rank_ok
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def ev_funnel_conversion(spark: SparkSession, sf: str) -> DataFrame:
    """Ordered funnel analysis (view → click → purchase) — the event-analytics
    staple the TPC-H battery never exercises: a user reaches stage k only via
    timestamps in strictly increasing order across stages (greedy-earliest
    chain, which is existence-optimal). Three user-keyed aggregations chained
    by user-keyed joins — no window over the full event stream, no
    cross-stage shuffle beyond the user key; per-stage counts collapse to one
    3-row stack. At 100 TB this is the same plan with more user-key buckets."""
    e = t(spark, sf, "events").select("user_id", "ts", "event_type")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    n = (
        v.agg(F.count(F.lit(1)).alias("n1"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n2")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n3")))
    )
    staged = n.selectExpr(
        "stack(3, "
        "'1_view', n1, CAST(1.0 AS DOUBLE), CAST(1.0 AS DOUBLE), "
        "'2_click', n2, n2 / CAST(nullif(n1, 0) AS DOUBLE), n2 / CAST(nullif(n1, 0) AS DOUBLE), "
        "'3_purchase', n3, n3 / CAST(nullif(n2, 0) AS DOUBLE), n3 / CAST(nullif(n1, 0) AS DOUBLE)"
        ") AS (stage, users, conv_prev, conv_start)"
    )
    return staged.select(
        "stage",
        F.col("users").cast("long").alias("users"),
        F.round("conv_prev", 6).alias("conv_prev"),
        F.round("conv_start", 6).alias("conv_start"),
    ).orderBy("stage")


EV_FUNNEL_ORACLE = """
WITH v AS (
  SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY user_id
), c AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN v ON v.user_id = e.user_id AND e.ts > v.t1
  WHERE e.event_type = 'click' GROUP BY e.user_id
), p AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN c ON c.user_id = e.user_id AND e.ts > c.t2
  WHERE e.event_type = 'purchase' GROUP BY e.user_id
), n AS (
  SELECT (SELECT count(*) FROM v) AS n1,
         (SELECT count(*) FROM c) AS n2,
         (SELECT count(*) FROM p) AS n3
)
SELECT '1_view' AS stage, n1::BIGINT AS users,
       round(1.0, 6) AS conv_prev, round(1.0, 6) AS conv_start FROM n
UNION ALL
SELECT '2_click', n2::BIGINT,
       round(n2 / CAST(nullif(n1, 0) AS DOUBLE), 6),
       round(n2 / CAST(nullif(n1, 0) AS DOUBLE), 6) FROM n
UNION ALL
SELECT '3_purchase', n3::BIGINT,
       round(n3 / CAST(nullif(n2, 0) AS DOUBLE), 6),
       round(n3 / CAST(nullif(n1, 0) AS DOUBLE), 6) FROM n
ORDER BY stage
"""


def ev_retention_cohorts(spark: SparkSession, sf: str) -> DataFrame:
    """Weekly cohort retention — the second event-analytics staple: cohort =
    ISO week of a user's first event; for each (cohort, week offset) the
    distinct active users and the retention ratio against the cohort size.
    Two user-keyed aggregations + one (user, week) distinct; offsets are
    exact integer day-diffs (week-truncated stamps differ by multiples of 7,
    so the `div` is exact — no float boundary)."""
    e = t(spark, sf, "events").select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("wk")
    )
    first = e.groupBy("user_id").agg(F.min("wk").alias("cohort"))
    act = e.distinct()
    per = (
        act.join(first, "user_id")
        .select(
            "user_id",
            "cohort",
            F.expr("datediff(wk, cohort) div 7").cast("int").alias("week_offset"),
        )
        .groupBy("cohort", "week_offset")
        .agg(F.count_distinct("user_id").alias("active_users"))
    )
    size = first.groupBy("cohort").agg(F.count(F.lit(1)).alias("cohort_size"))
    return (
        per.join(size, "cohort")
        .select(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort_week"),
            "week_offset",
            F.col("active_users").cast("long").alias("active_users"),
            F.col("cohort_size").cast("long").alias("cohort_size"),
            F.round(
                F.col("active_users") / F.col("cohort_size").cast("double"), 6
            ).alias("retention"),
        )
        .orderBy("cohort_week", "week_offset")
    )


EV_RETENTION_ORACLE = """
WITH e AS (
  SELECT user_id, date_trunc('week', ts) AS wk FROM events
), first AS (
  SELECT user_id, min(wk) AS cohort FROM e GROUP BY user_id
), act AS (
  SELECT DISTINCT user_id, wk FROM e
), per AS (
  SELECT f.cohort, date_diff('day', f.cohort, a.wk) // 7 AS week_offset,
         count(DISTINCT a.user_id) AS active_users
  FROM act a JOIN first f USING (user_id)
  GROUP BY 1, 2
), sz AS (
  SELECT cohort, count(*) AS cohort_size FROM first GROUP BY cohort
)
SELECT strftime(p.cohort, '%Y-%m-%d') AS cohort_week,
       p.week_offset::INT AS week_offset,
       p.active_users::BIGINT AS active_users,
       s.cohort_size::BIGINT AS cohort_size,
       round(p.active_users / CAST(s.cohort_size AS DOUBLE), 6) AS retention
FROM per p JOIN sz s USING (cohort)
ORDER BY cohort_week, week_offset
"""


SPECS: list[QuerySpec] = [
    QuerySpec("q4_order_priority", q4_order_priority, Q4_ORACLE, "J4,A3"),
    QuerySpec("q7_nation_volume", q7_nation_volume, Q7_ORACLE, "J1-J5,A3"),
    QuerySpec("q14_promo_revenue", q14_promo_revenue, Q14_ORACLE, "P10,A1"),
    QuerySpec("q18_large_orders", q18_large_orders, Q18_ORACLE, "A5,O2"),
    QuerySpec("q19_bracket_revenue", q19_bracket_revenue, Q19_ORACLE, "P6,P9,P10"),
    QuerySpec("w_running_totals", w_running_totals, W_RUNNING_ORACLE, "§2.5"),
    QuerySpec("w_interval_frames", w_interval_frames, W_INTERVAL_ORACLE, "§2.5 RANGE/interval frames"),
    QuerySpec("w_sessionization", w_sessionization, W_SESSION_ORACLE, "§2.5,T6"),
    QuerySpec("s_csv_roundtrip", s_csv_roundtrip, S_CSV_ORACLE, "S5"),
    QuerySpec("s_orc_roundtrip", s_orc_roundtrip, S_ORC_ORACLE, "S5+"),
    QuerySpec("a_grouping_sets", a_grouping_sets, A_GROUPING_SETS_ORACLE, "A3+,rollup"),
    QuerySpec("a_sketch_profile", _a_sketch_profile_oracle_mode, A_SKETCH_ORACLE, "A:sketches"),
    QuerySpec("ev_funnel_conversion", ev_funnel_conversion, EV_FUNNEL_ORACLE, "§2.5 event analytics"),
    QuerySpec("ev_retention_cohorts", ev_retention_cohorts, EV_RETENTION_ORACLE, "§2.5 event analytics"),
]
