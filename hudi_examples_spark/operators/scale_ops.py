"""Skew- and locality-aware operator variants — the 100 TB discipline made
explicit and testable.

Two classes of technique the plain operators rely on implicitly:

- **Salting**: a high-cardinality exact-distinct under a low-cardinality group
  key sends every row of a hot group through one reducer. The salted two-phase
  form shards each group by ``hash(distinct_key) % n_salts`` (same key ⇒ same
  shard, so per-shard distinct counts are disjoint and sum exactly), turning one
  hot partition into ``n_salts`` even ones. Results are bit-identical to the
  naive form — oracle-gated below.
- **Bucketed co-located joins**: ``df.write.bucketBy(k, key)`` pre-shuffles data
  at write time; joins between tables bucketed on the join key skip the
  exchange entirely (asserted in tests/test_bucketing.py). At 100 TB this is
  the difference between an hourly pipeline re-shuffling the fact table per run
  and reading it join-ready.

AQE (enabled in session.py) supplies runtime skew-join splitting for the join
side of this story; salting covers the aggregation side AQE does not touch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hudi_examples_spark.operators.spec import QuerySpec
from hudi_examples_spark.sources.readers import load_sf_table as t


def salted_count_distinct(
    df: DataFrame, group_col: str, distinct_col: str, n_salts: int = 16
) -> DataFrame:
    """Exact COUNT(DISTINCT distinct_col) per group_col in two shuffles of
    ``n_salts``× finer granularity. ``xxhash64`` keys the salt so one distinct
    value never spans shards; phase 1 distinct-counts within (group, salt),
    phase 2 sums the disjoint counts."""
    salted = df.withColumn("__salt", F.pmod(F.xxhash64(distinct_col), F.lit(n_salts)))
    per_shard = salted.groupBy(group_col, "__salt").agg(
        F.count_distinct(distinct_col).alias("__partial")
    )
    return per_shard.groupBy(group_col).agg(F.sum("__partial").alias("n_distinct"))


def a_salted_distinct_users(spark: SparkSession, sf: str) -> DataFrame:
    """Distinct users per event_type via salting. event_type has ~5 values over
    the whole corpus — the textbook hot-key aggregation; the salted plan holds
    each reducer to |users|/16 instead of |users| rows."""
    e = t(spark, sf, "events")
    return (
        salted_count_distinct(e, "event_type", "user_id", n_salts=16)
        .orderBy("event_type")
    )


A_SALTED_ORACLE = """
SELECT event_type, count(DISTINCT user_id) AS n_distinct
FROM events GROUP BY event_type ORDER BY event_type
"""


def j_salted_skew_join(spark: SparkSession, sf: str) -> DataFrame:
    """Skew-resilient fact-to-fact join via key salting: replicate the build
    side ``n_salts``× with an explicit salt column, shard the probe side by
    ``hash % n_salts`` — each hot join key spreads over ``n_salts`` reducers.

    Shape: purchases ⋈ per-user click counts on user_id. AQE's skew-join split
    handles this adaptively when statistics catch it; explicit salting is the
    deterministic form pipelines pin down when a key is *known* hot (e.g. the
    null/default user). Results are oracle-identical to the plain join.
    """
    n_salts = 8
    e = t(spark, sf, "events")
    clicks = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_clicks"))
    )
    purchases = e.filter(F.col("event_type") == "purchase").select("user_id", "event_id", "value")
    # probe side: one deterministic salt per row; build side: replicated across all salts
    probe = purchases.withColumn("__salt", F.pmod(F.xxhash64("event_id"), F.lit(n_salts)))
    build = clicks.crossJoin(
        F.broadcast(spark.range(n_salts).select(F.col("id").cast("bigint").alias("__salt")))
    )
    return (
        probe.join(build, ["user_id", "__salt"], "left_outer")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.round(F.sum("value"), 4).alias("purchase_value"),
            F.coalesce(F.first("n_clicks"), F.lit(0)).alias("n_clicks"),
        )
        .orderBy("user_id")
    )


J_SALTED_ORACLE = """
WITH clicks AS (
  SELECT user_id, count(*) AS n_clicks FROM events WHERE event_type = 'click' GROUP BY user_id
), purchases AS (
  SELECT user_id, event_id, value FROM events WHERE event_type = 'purchase'
)
SELECT p.user_id, count(*) AS n_purchases,
       round(sum(p.value), 4) AS purchase_value,
       coalesce(any_value(c.n_clicks), 0) AS n_clicks
FROM purchases p LEFT JOIN clicks c ON p.user_id = c.user_id
GROUP BY p.user_id ORDER BY p.user_id
"""


#: tokens per training shard for the shard-planning operator (tiny vs
#: production ~100M-token shards so the test corpus yields many shards; the
#: constant never changes the plan shape)
SHARD_BUDGET = 2048


def distributed_prefix_sum(
    df: DataFrame, order_cols: list[str], value_col: str, n_buckets: int = 256
) -> DataFrame:
    """EXCLUSIVE running sum of ``value_col`` over a total order — without
    the single-partition global window.

    ``sum() OVER (ORDER BY ...)`` with no PARTITION BY collapses to ONE task
    holding the whole dataset — the canonical Spark scale trap. The
    distributed form is the classic two-level prefix sum: rows hash into
    ``n_buckets`` RANGE buckets of the order key (the leading order column's
    prefix, so bucket id is order-monotone), each bucket computes its local
    running sum under a bucket-partitioned window, and the per-bucket totals
    (``n_buckets`` rows — bounded planning metadata) broadcast back as
    bucket offsets. Output adds ``__prefix`` = global exclusive prefix.
    Exactly the oracle's window semantics, at shuffle-parallel cost."""
    lead = order_cols[0]
    b = F.substring(F.col(lead), 1, 2)  # order-monotone bucket of a hex key
    df = df.withColumn("__b", b)
    w_in = Window.partitionBy("__b").orderBy(*[F.asc(c) for c in order_cols])
    local = df.withColumn(
        "__local", F.sum(value_col).over(w_in) - F.col(value_col)
    )
    totals = df.groupBy("__b").agg(F.sum(value_col).alias("__tot"))
    w_off = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "__b", F.coalesce(F.sum("__tot").over(w_off), F.lit(0)).alias("__off")
    )  # n_buckets rows: the only single-partition window, bounded by design
    return (
        local.join(F.broadcast(offsets), "__b")
        .withColumn("__prefix", F.col("__off") + F.col("__local"))
        .drop("__b", "__local", "__off")
    )


def pipe_shard_plan(spark: SparkSession, sf: str) -> DataFrame:
    """Token-budgeted training-shard planning — the writer step of a data
    pipeline: documents take a seeded global shuffle order (md5 of doc_id,
    same convention as ``pipe_shuffle_order``), a DISTRIBUTED prefix sum
    accumulates token counts along that order, and each document lands in
    shard ``prefix DIV SHARD_BUDGET``. Output is the shard manifest (docs,
    tokens per shard) in exact integers.

    Scale: the naive form is one global-order window (single task at any
    size); this runs the two-level prefix sum above — per-bucket windows
    plus a 256-row offset broadcast — so the only serial state is the
    bucket-total list."""
    from hudi_examples_spark.functions.text import words

    d = (
        t(spark, sf, "documents")
        .select(
            "doc_id",
            F.size(words("text")).cast("long").alias("n_tokens"),
            F.md5(F.col("doc_id").cast("string")).alias("h"),
        )
    )
    planned = distributed_prefix_sum(d, ["h", "doc_id"], "n_tokens")
    return (
        planned.withColumn("shard_id", F.expr(f"__prefix DIV {SHARD_BUDGET}"))
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
        )
        .select(F.col("shard_id").cast("long").alias("shard_id"), "n_docs", "n_tokens")
        .orderBy("shard_id")
    )


PIPE_SHARD_PLAN_ORACLE = f"""
WITH d AS (
  SELECT doc_id,
         len(list_filter(str_split(trim(text), ' '), w -> w <> ''))::BIGINT AS n_tokens,
         md5(doc_id::VARCHAR) AS h
  FROM documents
), pre AS (
  SELECT doc_id, n_tokens,
         coalesce(sum(n_tokens) OVER (ORDER BY h, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prefix
  FROM d
)
SELECT (prefix // {SHARD_BUDGET})::BIGINT AS shard_id,
       count(*)::BIGINT AS n_docs,
       sum(n_tokens)::BIGINT AS n_tokens
FROM pre GROUP BY 1 ORDER BY shard_id
"""


SPECS: list[QuerySpec] = [
    QuerySpec("a_salted_distinct_users", a_salted_distinct_users, A_SALTED_ORACLE, "scale:salt-agg"),
    QuerySpec("j_salted_skew_join", j_salted_skew_join, J_SALTED_ORACLE, "scale:salt-join"),
    QuerySpec(
        "pipe_shard_plan",
        pipe_shard_plan,
        PIPE_SHARD_PLAN_ORACLE,
        "scale:token-budgeted shard planning via distributed prefix sum",
    ),
]
