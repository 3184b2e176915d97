"""Eleventh LLM-pipeline battery: corpus composition + statistical health.

Three pretraining-pipeline operators a data team runs between corpus assembly
and tokenizer training:

- ``pipe_temperature_mixture`` — temperature-scaled multi-source sampling
  weights (Raffel et al. 2020 §3.4.3 "Temperature-scaled mixing", the
  mT5/PaLM multilingual recipe): per source, w_i ∝ p_i^α dampens the head
  sources and upsamples the tail; reports natural vs temperature shares and
  the per-source upsample factor.
- ``text_char_entropy`` — per-document character-distribution Shannon
  entropy: the cheap gibberish/boilerplate signal (binary junk and repeated
  padding sit at the entropy extremes; CCNet-style pipelines gate on it
  before any model-based scoring).
- ``text_zipf_fit`` — OLS fit of the corpus word-frequency distribution in
  log-log space (Zipf's law): slope/intercept/R² over (log rank, log count).
  A healthy natural-language corpus fits slope ≈ −1; crawl corruption,
  boilerplate floods, or template spam bend the tail and show up as fit
  degradation. The rank assignment is computed WITHOUT a global sort (see
  the function docstring).

Scale stance (100 TB): mixture and entropy are single-shuffle aggregations
(source- and doc-keyed respectively; skew bounded by source count / longest
doc). The Zipf fit's only corpus-scale shuffle is the word count; ranks come
from the count-of-counts histogram (O(distinct frequencies) ≈ O(√tokens)
window) joined back per frequency class — the same trick as
``text_vocab_coverage`` — then one scalar aggregation of the regression sums.

Reference analogue: none — the reference's Glue/Spark examples stop at
record-level ETL; corpus-composition analytics are the beyond-reference
training-data requirement (BASELINE.json north star).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hudi_examples_spark.functions.text import words
from hudi_examples_spark.operators.llm_pipeline5 import _docs
from hudi_examples_spark.operators.spec import QuerySpec

#: mixing temperature (α = 1/T): 0.3 is the mT5 default; α=1 is natural
#: sampling, α→0 uniform over sources.
MIX_ALPHA = 0.3


def pipe_temperature_mixture(spark: SparkSession, sf: str) -> DataFrame:
    """Per-source temperature-scaled sampling weights.

    One map-side-combined aggregation to (source → docs, tokens); everything
    after runs on O(sources) rows (the window exchanges move source-count
    rows, not corpus rows). ``upsample`` = temperature share / natural share
    — the factor a sampler repeats the source relative to proportional
    sampling (tail sources > 1, head sources < 1)."""
    per_src = (
        _docs(spark, sf)
        .select("source", F.size(words("text")).alias("nt"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("docs"), F.sum("nt").alias("tokens"))
    )
    w_all = Window.partitionBy(F.lit(1))
    p = F.col("tokens") / F.sum("tokens").over(w_all)
    wgt = F.pow(p, F.lit(MIX_ALPHA))
    share = wgt / F.sum(wgt).over(w_all)
    return (
        per_src.select(
            "source",
            "docs",
            F.col("tokens").cast("long").alias("tokens"),
            F.round(p, 6).alias("natural_share"),
            F.round(share, 6).alias("temp_share"),
            F.round(share / p, 6).alias("upsample"),
        )
        .orderBy("source")
    )


PIPE_TEMPERATURE_MIXTURE_ORACLE = f"""
WITH per_src AS (
  SELECT source, count(*) AS docs,
         sum(len(list_filter(str_split(trim(text), ' '), w -> w <> ''))) AS tokens
  FROM documents GROUP BY source
), nat AS (
  SELECT source, docs, tokens, tokens / sum(tokens) OVER () AS p FROM per_src
), shares AS (
  SELECT source, docs, tokens, p,
         pow(p, {MIX_ALPHA}) / sum(pow(p, {MIX_ALPHA})) OVER () AS share
  FROM nat
)
SELECT source, docs, tokens::BIGINT AS tokens,
       round(p, 6) AS natural_share,
       round(share, 6) AS temp_share,
       round(share / p, 6) AS upsample
FROM shares ORDER BY source
"""


def text_char_entropy(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document character entropy in bits, plus the character inventory.

    Identity used: H = log2(n) − (Σ c·log2 c)/n over the per-doc character
    histogram — so ONE (doc_id, char) aggregation and one doc_id rollup
    compute it, no per-row probability column. The trimmed text is projected
    into a real column before the position transform (inlining would make
    Catalyst re-evaluate trim per element — the shingles_from lesson,
    functions/text.py)."""
    d = (
        _docs(spark, sf)
        .select("doc_id", F.trim("text").alias("t"))
        .filter(F.length("t") >= 1)
    )
    chars = d.select(
        "doc_id",
        F.explode(F.expr("transform(sequence(1, length(t)), i -> substr(t, i, 1))")).alias(
            "ch"
        ),
    )
    hist = chars.groupBy("doc_id", "ch").agg(F.count(F.lit(1)).alias("c"))
    n = F.sum("c")
    return (
        hist.groupBy("doc_id")
        .agg(
            n.cast("long").alias("n_chars"),
            F.count(F.lit(1)).cast("long").alias("n_distinct_chars"),
            F.round(
                F.log2(n) - F.sum(F.col("c") * F.log2("c")) / n, 6
            ).alias("entropy_bits"),
        )
        .orderBy("doc_id")
    )


TEXT_CHAR_ENTROPY_ORACLE = """
WITH d AS (
  SELECT doc_id, trim(text) AS t FROM documents WHERE len(trim(text)) >= 1
), chars AS (
  SELECT doc_id, substr(t, i, 1) AS ch
  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t))) AS i FROM d)
), hist AS (
  SELECT doc_id, ch, count(*) AS c FROM chars GROUP BY doc_id, ch
)
SELECT doc_id,
       sum(c)::BIGINT AS n_chars,
       count(*)::BIGINT AS n_distinct_chars,
       round(log2(sum(c)) - sum(c * log2(c)) / sum(c), 6) AS entropy_bits
FROM hist GROUP BY doc_id ORDER BY doc_id
"""


def text_zipf_fit(spark: SparkSession, sf: str) -> DataFrame:
    """OLS Zipf fit over the corpus word-frequency table: one row with
    slope/intercept/R² of ln(count) ~ ln(rank), plus type/token counts.

    Rank WITHOUT a global sort: a word's rank = (number of word types with a
    strictly higher count) + (its position within its own frequency class,
    ties broken lexicographically). The first term comes from the
    count-of-counts histogram — a window over O(distinct frequencies)
    ≈ O(√tokens) rows; the second is a row_number keyed by the frequency
    class, so the exchange is per-class, never global. The regression then
    needs only Σx, Σy, Σxy, Σx², Σy² — one scalar aggregation."""
    wc = (
        _docs(spark, sf)
        .select(F.explode(words("text")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # count-of-counts: how many word types share each frequency, and how many
    # types sit at strictly-higher frequencies (cumulative over the tiny
    # histogram, ordered by frequency descending)
    coc = wc.groupBy("c").agg(F.count(F.lit(1)).alias("m"))
    w_desc = Window.orderBy(F.col("c").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    above = coc.select("c", F.coalesce(F.sum("m").over(w_desc), F.lit(0)).alias("n_above"))
    w_class = Window.partitionBy("c").orderBy("w")
    ranked = (
        wc.join(above, "c")
        .select(
            "w",
            "c",
            (F.col("n_above") + F.row_number().over(w_class)).alias("rank"),
        )
    )
    x = F.log(F.col("rank").cast("double"))
    y = F.log(F.col("c").cast("double"))
    sums = ranked.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
        F.sum(F.col("c")).cast("long").alias("n_tokens"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    intercept = (F.col("sy") - slope * F.col("sx")) / F.col("n")
    r_num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    r_den = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return sums.select(
        F.col("n").cast("long").alias("n_types"),
        "n_tokens",
        F.round(slope, 6).alias("zipf_slope"),
        F.round(intercept, 6).alias("zipf_intercept"),
        F.round(F.pow(r_num / r_den, 2), 6).alias("r2"),
    )


TEXT_ZIPF_FIT_ORACLE = """
WITH wc AS (
  SELECT w, count(*) AS c
  FROM (SELECT unnest(list_filter(str_split(trim(text), ' '), x -> x <> '')) AS w
        FROM documents)
  GROUP BY w
), ranked AS (
  SELECT w, c, row_number() OVER (ORDER BY c DESC, w) AS rank FROM wc
), sums AS (
  SELECT count(*)::DOUBLE AS n,
         sum(ln(rank)) AS sx, sum(ln(c)) AS sy,
         sum(ln(rank) * ln(c)) AS sxy,
         sum(ln(rank) * ln(rank)) AS sxx,
         sum(ln(c) * ln(c)) AS syy,
         sum(c)::BIGINT AS n_tokens
  FROM ranked
)
SELECT n::BIGINT AS n_types, n_tokens,
       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS zipf_slope,
       round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 6)
         AS zipf_intercept,
       round(pow((n * sxy - sx * sy)
                 / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 2), 6) AS r2
FROM sums
"""


SPECS: list[QuerySpec] = [
    QuerySpec(
        "pipe_temperature_mixture",
        pipe_temperature_mixture,
        PIPE_TEMPERATURE_MIXTURE_ORACLE,
        "LLM:temperature-scaled multi-source sampling weights (mT5 recipe)",
    ),
    QuerySpec(
        "text_char_entropy",
        text_char_entropy,
        TEXT_CHAR_ENTROPY_ORACLE,
        "LLM:per-document character-entropy quality signal",
    ),
    QuerySpec(
        "text_zipf_fit",
        text_zipf_fit,
        TEXT_ZIPF_FIT_ORACLE,
        "LLM:corpus Zipf-law fit (log-log OLS, sort-free ranks)",
    ),
]
