"""Relational operator battery (SURVEY.md §2.2-2.9) as named differential queries.

Every query here is declarative DataFrame API so Catalyst gets predicate pushdown,
column pruning, and join planning for free; aggregates are rounded identically on the
Spark and DuckDB sides because float summation order differs between engines.

Determinism rules used throughout (the driver hash is order-insensitive but LIMIT is
not): every ``limit`` is preceded by a total order (unique tiebreaker column last), and
every float aggregate is ``round``-ed on both sides.

Reference parity is cited per query (file:line into /root/reference).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hudi_examples_spark.operators.spec import QuerySpec
from hudi_examples_spark.sources.readers import load_sf_table as t


def _dec(col) -> object:
    """Money column as DECIMAL(18,2): float sums differ across engines in the last
    ulp and can flip round(x, 2) at the .005 boundary; decimal accumulation is exact
    in both Spark and DuckDB, so round+cast-back-to-double is bit-identical."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("decimal(18,2)")


def _dsum(expr, alias: str, scale: int = 2):
    return F.round(F.sum(expr), scale).cast("double").alias(alias)


# ---------------------------------------------------------------------------
# TPC-H-style analytics (flagship queries; exercise scan/filter/agg/join/sort)
# ---------------------------------------------------------------------------


def q1_pricing_summary(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q1 shape: scan+filter+groupBy+multi-agg+sort.

    Parity: grouped counts in ``TestAutomationUtils.scala:54`` (A3) and the SQL agg
    surface of ``glue/S3 Calls benchmarking Code.py:64`` scaled to a full agg battery.
    Scale note: partial aggregation (map-side combine) applies — one shuffle on the
    two low-cardinality grouping keys; no skew risk.
    """
    disc_price = _dec("l_extendedprice") * (1 - _dec("l_discount"))
    return (
        t(spark, sf, "lineitem")
        .filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            _dsum(_dec("l_extendedprice"), "sum_base_price"),
            _dsum(disc_price, "sum_disc_price"),
            _dsum(disc_price * (1 + _dec("l_tax")), "sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_ORACLE = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                                        AS sum_qty,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_base_price,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS sum_disc_price,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))), 2) AS DOUBLE) AS sum_charge,
       round(avg(l_quantity), 4)                                        AS avg_qty,
       round(avg(l_extendedprice), 4)                                   AS avg_price,
       round(avg(l_discount), 4)                                        AS avg_disc,
       count(*)                                                         AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join + group + ordered top-k.

    Scale note: ``customer`` filtered on segment is small relative to lineitem — on a
    cluster AQE converts it to a broadcast join after the filter; the lineitem⋈orders
    join shuffles on orderkey (the natural co-partition key).
    """
    cutoff = F.lit("1998-03-15").cast("timestamp")
    c = t(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf, "orders").filter(F.col("o_orderdate") < cutoff)
    l = t(spark, sf, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
        )
        .agg(_dsum(_dec("l_extendedprice") * (1 - _dec("l_discount")), "revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


Q3_ORACLE = """
SELECT l_orderkey,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS revenue,
       strftime(o_orderdate, '%Y-%m-%d')                 AS o_orderdate,
       o_orderpriority
FROM customer JOIN orders ON c_custkey = o_custkey
     JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate  > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, strftime(o_orderdate, '%Y-%m-%d'), o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
"""


def q5_local_supplier_volume(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way star join with small-dim broadcasts."""
    c = t(spark, sf, "customer")
    o = t(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    l = t(spark, sf, "lineitem")
    s = t(spark, sf, "supplier")
    n = t(spark, sf, "nation")
    r = t(spark, sf, "region")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(_dsum(_dec("l_extendedprice") * (1 - _dec("l_discount")), "revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


Q5_ORACLE = """
SELECT n_name, CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey AND l_suppkey = s_suppkey
  AND c_nationkey = s_nationkey AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


def q6_revenue_forecast(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q6 shape: pure filter + scalar agg; predicates fully pushed to parquet."""
    l = t(spark, sf, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))
    )


Q6_ORACLE = """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24
"""


def q10_returned_items(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue per customer, top 20."""
    c = t(spark, sf, "customer")
    o = t(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    l = t(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
        .agg(_dsum(_dec("l_extendedprice") * (1 - _dec("l_discount")), "revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "c_mktsegment")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


Q10_ORACLE = """
SELECT c_custkey, c_name,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS revenue,
       c_acctbal, c_mktsegment
FROM customer JOIN orders ON o_custkey = c_custkey
     JOIN lineitem ON l_orderkey = o_orderkey
WHERE o_orderdate >= TIMESTAMP '1996-10-01' AND o_orderdate < TIMESTAMP '1997-10-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, c_mktsegment
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# ---------------------------------------------------------------------------
# Projection / filter / predicate inventory (SURVEY §2.2)
# ---------------------------------------------------------------------------


def p_filter_projection(spark: SparkSession, sf: str) -> DataFrame:
    """P1+P6: column projection + numeric comparison filter.

    Parity: ``SELECT ts, fare, ... WHERE fare > 20.0`` — ``spark/sql/quickstart.sql:40-41``.
    """
    return (
        t(spark, sf, "orders")
        .filter(F.col("o_totalprice") > 150000.0)
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
    )


P_FILTER_ORACLE = """
SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
FROM orders WHERE o_totalprice > 150000.0
"""


def p_case_when(spark: SparkSession, sf: str) -> DataFrame:
    """P10: CASE WHEN via expr — ``glue/S3 Calls benchmarking Code.py:57``."""
    e = t(spark, sf, "events")
    return e.select(
        "event_id",
        F.when(F.col("event_type") == "purchase", F.lit("revenue"))
        .when(F.col("event_type") == "error", F.lit("incident"))
        .otherwise(F.lit("engagement"))
        .alias("category"),
        F.round(F.col("value") * 2, 2).alias("value_x2"),
    )


P_CASE_ORACLE = """
SELECT event_id,
       CASE WHEN event_type = 'purchase' THEN 'revenue'
            WHEN event_type = 'error' THEN 'incident'
            ELSE 'engagement' END  AS category,
       round(value * 2, 2)        AS value_x2
FROM events
"""


def p_like_filter(spark: SparkSession, sf: str) -> DataFrame:
    """P8: LIKE filter — ``Code.py:58`` (``col("value").like(f"%{table}%")``)."""
    return (
        t(spark, sf, "documents")
        .filter(F.col("text").like("%merge%"))
        .select("doc_id", "lang", "source", "n_chars")
    )


P_LIKE_ORACLE = """
SELECT doc_id, lang, source, n_chars FROM documents WHERE text LIKE '%merge%'
"""


def p_json_extract(spark: SparkSession, sf: str) -> DataFrame:
    """P5: computed-column chain incl. JSON-in-string extraction (``events.props``).

    Parity: regex/derivation chain of ``Code.py:54-57``; JSON props are this dataset's
    analogue of the access-log fields.
    """
    e = t(spark, sf, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("prop_k"),
        F.length("props").alias("props_len"),
    ).filter(F.col("prop_k") > 50)


P_JSON_ORACLE = """
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k,
       length(props)                                     AS props_len
FROM events
WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
"""


def p_range_predicate(spark: SparkSession, sf: str) -> DataFrame:
    """P9: chained range predicates on timestamp — ``Code.py:113``."""
    e = t(spark, sf, "events")
    return (
        e.filter(F.col("ts") >= F.lit("2024-01-10").cast("timestamp"))
        .filter(F.col("ts") < F.lit("2024-01-20").cast("timestamp"))
        .select("event_id", "user_id", "event_type")
    )


P_RANGE_ORACLE = """
SELECT event_id, user_id, event_type
FROM events
WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-20'
"""


def p_arithmetic_projection(spark: SparkSession, sf: str) -> DataFrame:
    """P12: arithmetic projection — ``Datagen.py:145`` (``ss_list_price * 2``)."""
    return t(spark, sf, "part").select(
        "p_partkey",
        F.round(F.col("p_retailprice") * 2, 2).alias("p_retailprice_x2"),
        (F.col("p_size") + 10).alias("p_size_plus10"),
    )


P_ARITH_ORACLE = """
SELECT p_partkey, round(p_retailprice * 2, 2) AS p_retailprice_x2,
       p_size + 10 AS p_size_plus10
FROM part
"""


# ---------------------------------------------------------------------------
# Aggregations / sorts / top-k (SURVEY §2.4, §2.6)
# ---------------------------------------------------------------------------


def a_count_star(spark: SparkSession, sf: str) -> DataFrame:
    """A1/A2: COUNT(*) scalar agg — ``quickstart.sql:37-38``."""
    return t(spark, sf, "lineitem").agg(F.count(F.lit(1)).alias("cnt"))


A_COUNT_ORACLE = "SELECT count(*) AS cnt FROM lineitem"


def a_group_count_sort(spark: SparkSession, sf: str) -> DataFrame:
    """A4/O1: grouped count + sort desc — ``Code.py:64``."""
    return (
        t(spark, sf, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy(F.desc("count"), "event_type")
    )


A_GROUP_ORACLE = """
SELECT event_type, count(*) AS count FROM events
GROUP BY event_type ORDER BY count DESC, event_type
"""


def a_topk_two_keys(spark: SparkSession, sf: str) -> DataFrame:
    """A5/O2: 2-key grouped count + sort + LIMIT 100 (top-k) — ``Code.py:73``."""
    return (
        t(spark, sf, "events")
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy(F.desc("count"), "user_id", "event_type")
        .limit(100)
    )


A_TOPK_ORACLE = """
SELECT user_id, event_type, count(*) AS count FROM events
GROUP BY user_id, event_type ORDER BY count DESC, user_id, event_type LIMIT 100
"""


def a_interval_counts(spark: SparkSession, sf: str) -> DataFrame:
    """A6: per-interval counts. The reference loops commit windows with paired range
    filters (``Code.py:108-120``); the scalable form is one grouped agg on the
    truncated timestamp — one pass, one shuffle, instead of N scans.
    """
    e = t(spark, sf, "events")
    return (
        e.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(F.count(F.lit(1)).alias("n_events"), _dsum(_dec("value"), "sum_value"))
        .orderBy("day")
    )


A_INTERVAL_ORACLE = """
SELECT strftime(ts, '%Y-%m-%d') AS day,
       count(*) AS n_events, CAST(round(sum(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_value
FROM events GROUP BY 1 ORDER BY day
"""


def w_latest_per_key(spark: SparkSession, sf: str) -> DataFrame:
    """A7/§2.5: precombine dedup = arg-max per key via row_number.

    Parity: ``preCombineField='ts'`` upsert semantics (``DeltaStreamerExample.scala:16,27``,
    ``spark_sql_testing.sh:81``) — among rows sharing a key keep max event-time.
    Scale note: single hash-partition shuffle on the key; no driver involvement.
    """
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        t(spark, sf, "events")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
            F.round("value", 2).alias("value"),
        )
    )


W_LATEST_ORACLE = """
SELECT user_id, event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
       round(value, 2) AS value
FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events) WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# Joins incl. DML-as-join semantics (SURVEY §2.3)
# ---------------------------------------------------------------------------


def j_merge_full_outer(spark: SparkSession, sf: str) -> DataFrame:
    """J1/M5: MERGE INTO (upsert form) expressed as full-outer join + coalesce.

    Parity: ``MERGE INTO hudi_table ... WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED
    THEN INSERT *`` — ``spark/sql/quickstart.sql:58-63``. Target = customer, source =
    per-user purchase spend from events; matched rows get acctbal bumped, unmatched
    source keys become inserted rows.
    """
    cust = t(spark, sf, "customer")
    src = (
        t(spark, sf, "events")
        .filter(F.col("event_type") == "purchase")
        .groupBy(F.col("user_id").alias("key"))
        .agg(_dsum(_dec("value"), "spend"))
    )
    joined = cust.join(src, cust.c_custkey == src.key, "full_outer")
    return joined.select(
        F.coalesce(cust.c_custkey, src.key).alias("c_custkey"),
        F.coalesce(cust.c_name, F.concat(F.lit("new-"), src.key.cast("string"))).alias("c_name"),
        F.round(F.coalesce(cust.c_acctbal, F.lit(0.0)) + F.coalesce(src.spend, F.lit(0.0)), 2).alias(
            "acctbal"
        ),
    )


J_MERGE_ORACLE = """
WITH src AS (
  SELECT user_id AS key, CAST(round(sum(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS spend
  FROM events WHERE event_type = 'purchase' GROUP BY user_id
)
SELECT coalesce(c_custkey, key)                               AS c_custkey,
       coalesce(c_name, 'new-' || CAST(key AS VARCHAR))       AS c_name,
       round(coalesce(c_acctbal, 0) + coalesce(spend, 0), 2)  AS acctbal
FROM customer FULL OUTER JOIN src ON c_custkey = key
"""


def j_delete_anti(spark: SparkSession, sf: str) -> DataFrame:
    """J3/J6/M4: join-driven delete = left-anti join of table vs delete-key set.

    Parity: ``MERGE ... WHEN MATCHED THEN DELETE`` — ``Job.py:131-133``; delete write op
    — ``TestAutomationUtils.scala:42-48``.
    """
    o = t(spark, sf, "orders")
    delete_keys = o.filter((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") < 50000)).select(
        "o_orderkey"
    )
    return (
        o.join(delete_keys, "o_orderkey", "left_anti")
        .select("o_orderkey", "o_custkey", "o_orderstatus", F.round("o_totalprice", 2).alias("o_totalprice"))
    )


J_DELETE_ORACLE = """
SELECT o_orderkey, o_custkey, o_orderstatus, round(o_totalprice, 2) AS o_totalprice
FROM orders o
WHERE NOT EXISTS (
  SELECT 1 FROM orders d
  WHERE d.o_orderstatus = 'F' AND d.o_totalprice < 50000 AND d.o_orderkey = o.o_orderkey
)
"""


def j_semi_join(spark: SparkSession, sf: str) -> DataFrame:
    """Key-existence lookup (upsert "tag location", J4) as left-semi join."""
    c = t(spark, sf, "customer")
    buyers = t(spark, sf, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return c.join(buyers, "c_custkey", "left_semi").select("c_custkey", "c_name", "c_mktsegment")


J_SEMI_ORACLE = """
SELECT c_custkey, c_name, c_mktsegment FROM customer c
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c.c_custkey)
"""


def j_bucket_assignment(spark: SparkSession, sf: str) -> DataFrame:
    """J5: bucket-index routing — key→bucket by hash(key)%N, counts per bucket.

    Parity: ``hoodie.index.type=BUCKET`` consistent-hashing — ``consistent_hashing.sql:44-49``.
    The oracle-checkable form uses ``key % 8``; the engine's real router uses
    ``pmod(xxhash64(key), n_buckets)`` (see table layer) which has no cross-engine oracle.
    """
    return (
        t(spark, sf, "orders")
        .select(F.pmod(F.col("o_orderkey"), F.lit(8)).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy("bucket")
    )


J_BUCKET_ORACLE = """
SELECT o_orderkey % 8 AS bucket, count(*) AS n_rows
FROM orders GROUP BY 1 ORDER BY bucket
"""


# ---------------------------------------------------------------------------
# Set operations (SURVEY §2.7)
# ---------------------------------------------------------------------------


def e_except_diff(spark: SparkSession, sf: str) -> DataFrame:
    """E1: EXCEPT differential equality — ``TestAutomationUtils.scala:65,68-69``."""
    o = t(spark, sf, "orders").select("o_orderkey", "o_orderstatus")
    subset = (
        t(spark, sf, "orders")
        .filter(F.col("o_orderstatus") == "O")
        .select("o_orderkey", "o_orderstatus")
    )
    return o.exceptAll(subset)


E_EXCEPT_ORACLE = """
SELECT o_orderkey, o_orderstatus FROM orders
EXCEPT ALL
SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus = 'O'
"""


def e_intersect(spark: SparkSession, sf: str) -> DataFrame:
    """E2: INTERSECT — ``TestAutomationUtils.scala:66``."""
    c = t(spark, sf, "customer").select(F.col("c_custkey").alias("custkey"))
    o = t(spark, sf, "orders").select(F.col("o_custkey").alias("custkey"))
    return c.intersect(o)


E_INTERSECT_ORACLE = """
SELECT c_custkey AS custkey FROM customer
INTERSECT
SELECT o_custkey AS custkey FROM orders
"""


def e_union_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """E3: UNION of successive batches — ``flink/src/main/sql/quickstart.sql:29-36``."""
    a = t(spark, sf, "orders").filter(F.col("o_totalprice") > 180000).select("o_orderkey", "o_orderstatus")
    b = t(spark, sf, "orders").filter(F.col("o_orderstatus") == "P").select("o_orderkey", "o_orderstatus")
    return a.unionByName(b).distinct()


E_UNION_ORACLE = """
SELECT o_orderkey, o_orderstatus FROM orders WHERE o_totalprice > 180000
UNION
SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus = 'P'
"""


# ---------------------------------------------------------------------------
# Scalar-function battery (SURVEY §2.9) + U1
# ---------------------------------------------------------------------------


def fn_scalar_battery(spark: SparkSession, sf: str) -> DataFrame:
    """§2.9 scalar surface: substring/length/split/concat/upper/arithmetic.

    Parity: derivation chain in ``Code.py:54-57`` (split/substring/length) and
    ``Datagen.py:145`` arithmetic. All JVM-side builtins — no Python UDF in sight.
    """
    d = t(spark, sf, "documents")
    return d.select(
        "doc_id",
        F.substring("text", 1, 10).alias("prefix10"),
        F.length("text").alias("text_len"),
        F.upper("lang").alias("lang_uc"),
        F.element_at(F.split("text", " "), 1).alias("first_word"),
        (F.col("n_chars") * 2).alias("n_chars_x2"),
        F.concat(F.col("source"), F.lit("-"), F.col("lang")).alias("src_lang"),
    )


FN_SCALAR_ORACLE = """
SELECT doc_id,
       substring(text, 1, 10)     AS prefix10,
       length(text)               AS text_len,
       upper(lang)                AS lang_uc,
       str_split(text, ' ')[1]    AS first_word,
       n_chars * 2                AS n_chars_x2,
       source || '-' || lang      AS src_lang
FROM documents
"""


def fn_timestamp_derivation(spark: SparkSession, sf: str) -> DataFrame:
    """§2.9 timestamp functions — ``to_timestamp``/``from_utc_timestamp`` chain of
    ``Code.py:55`` re-expressed over events.ts."""
    e = t(spark, sf, "events")
    return e.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd").alias("day_str"),
        F.hour("ts").alias("hr"),
        F.minute("ts").alias("mi"),
        F.dayofweek("ts").alias("dow"),
    )


FN_TS_ORACLE = """
SELECT event_id,
       strftime(ts, '%Y-%m-%d')     AS day_str,
       CAST(hour(ts) AS INT)        AS hr,
       CAST(minute(ts) AS INT)      AS mi,
       CAST(dayofweek(ts) + 1 AS INT) AS dow
FROM events
"""


def fn_regexp_extract(spark: SparkSession, sf: str) -> DataFrame:
    """U1: the reference's Python UDF (``re.findall`` on bracketed text —
    ``Code.py:45-49``) re-expressed as the builtin ``regexp_extract`` (JVM-side;
    the 10-100x-faster path the reference should have used)."""
    e = t(spark, sf, "events")
    return e.select(
        "event_id",
        F.regexp_extract("props", '"k": (\\d+)', 1).cast("bigint").alias("k_via_regex"),
    )


FN_REGEX_ORACLE = """
SELECT event_id, CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT) AS k_via_regex
FROM events
"""


SPECS: list[QuerySpec] = [
    QuerySpec("q1_pricing_summary", q1_pricing_summary, Q1_ORACLE, "A1,A3,O1,P6"),
    QuerySpec("q3_shipping_priority", q3_shipping_priority, Q3_ORACLE, "J4,A5,O1,O2"),
    QuerySpec("q5_local_supplier_volume", q5_local_supplier_volume, Q5_ORACLE, "J1-J5"),
    QuerySpec("q6_revenue_forecast", q6_revenue_forecast, Q6_ORACLE, "P6,P9,A1"),
    QuerySpec("q10_returned_items", q10_returned_items, Q10_ORACLE, "J4,A5,O2"),
    QuerySpec("p_filter_projection", p_filter_projection, P_FILTER_ORACLE, "P1,P6"),
    QuerySpec("p_case_when", p_case_when, P_CASE_ORACLE, "P10"),
    QuerySpec("p_like_filter", p_like_filter, P_LIKE_ORACLE, "P8"),
    QuerySpec("p_json_extract", p_json_extract, P_JSON_ORACLE, "P5"),
    QuerySpec("p_range_predicate", p_range_predicate, P_RANGE_ORACLE, "P9"),
    QuerySpec("p_arithmetic_projection", p_arithmetic_projection, P_ARITH_ORACLE, "P12"),
    QuerySpec("a_count_star", a_count_star, A_COUNT_ORACLE, "A1,A2"),
    QuerySpec("a_group_count_sort", a_group_count_sort, A_GROUP_ORACLE, "A4,O1"),
    QuerySpec("a_topk_two_keys", a_topk_two_keys, A_TOPK_ORACLE, "A5,O2"),
    QuerySpec("a_interval_counts", a_interval_counts, A_INTERVAL_ORACLE, "A6"),
    QuerySpec("w_latest_per_key", w_latest_per_key, W_LATEST_ORACLE, "A7"),
    QuerySpec("j_merge_full_outer", j_merge_full_outer, J_MERGE_ORACLE, "J1,M5"),
    QuerySpec("j_delete_anti", j_delete_anti, J_DELETE_ORACLE, "J3,J6,M4"),
    QuerySpec("j_semi_join", j_semi_join, J_SEMI_ORACLE, "J4"),
    QuerySpec("j_bucket_assignment", j_bucket_assignment, J_BUCKET_ORACLE, "J5"),
    QuerySpec("e_except_diff", e_except_diff, E_EXCEPT_ORACLE, "E1"),
    QuerySpec("e_intersect", e_intersect, E_INTERSECT_ORACLE, "E2"),
    QuerySpec("e_union_dedup", e_union_dedup, E_UNION_ORACLE, "E3"),
    QuerySpec("fn_scalar_battery", fn_scalar_battery, FN_SCALAR_ORACLE, "§2.9"),
    QuerySpec("fn_timestamp_derivation", fn_timestamp_derivation, FN_TS_ORACLE, "§2.9"),
    QuerySpec("fn_regexp_extract", fn_regexp_extract, FN_REGEX_ORACLE, "U1"),
]
