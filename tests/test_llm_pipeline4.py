"""Behavioral invariants for the curation ops (llm_pipeline4).

Exact-value parity vs DuckDB is covered by test_oracle_parity (all registry
specs); these tests pin the properties the oracle can't express — "no PII
survives", determinism across runs, chunk reconstruction, budget compliance.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hudi_examples_spark.operators import llm_pipeline4 as lp4
from hudi_examples_spark.sources.readers import load_sf_table as t
from tests.conftest import SF_SMALL


def test_redaction_leaves_no_pii(spark):
    out = lp4.pipe_pii_redact(spark, SF_SMALL)
    residual = out.select(lp4.count_pii(F.col("clean_text")).alias("n")).agg(
        F.sum("n")
    ).collect()[0][0]
    assert residual == 0
    # every doc had all 4 planted classes
    assert out.where(F.col("n_pii") < 4).count() == 0


def test_redaction_idempotent(spark):
    out = lp4.pipe_pii_redact(spark, SF_SMALL)
    twice = out.select(
        "doc_id", lp4.redact_pii(F.col("clean_text")).alias("again"), "clean_text"
    )
    assert twice.where(F.col("again") != F.col("clean_text")).count() == 0


def test_stratified_sample_deterministic_and_stratified(spark):
    a = lp4.pipe_stratified_sample(spark, SF_SMALL)
    b = lp4.pipe_stratified_sample(spark, SF_SMALL)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # head language is downsampled harder than the tail languages
    total = t(spark, SF_SMALL, "documents").groupBy("lang").count().collect()
    kept = {r["lang"]: r["count"] for r in a.groupBy("lang").count().collect()}
    frac = {r["lang"]: kept.get(r["lang"], 0) / r["count"] for r in total}
    assert frac["en"] < 0.45  # rate 25%, binomial slack
    assert all(frac[lang] > 0.55 for lang in frac if lang != "en")  # rate 80%


def test_mixture_respects_budget_and_weights(spark):
    d = t(spark, SF_SMALL, "documents").withColumn(
        "tokens", lp4._token_count_col()
    )
    total = d.agg(F.sum("tokens")).collect()[0][0]
    out = lp4.pipe_dataset_mixture(spark, SF_SMALL).collect()
    kept_tokens = sum(r["n_tokens"] for r in out)
    # rates are min(1, share/t_src): never exceeds corpus, lands near budget
    assert kept_tokens <= total
    assert kept_tokens >= int(total * lp4.MIX_BUDGET_FRAC * 0.6)
    # favored sources keep everything (rate capped at 1.0 means share >= t_src)
    src_tokens = {r["source"]: r["t_src"] for r in
                  d.groupBy("source").agg(F.sum("tokens").alias("t_src")).collect()}
    kept_by_src = {r["source"]: r["n_tokens"] for r in out}
    hi = [kept_by_src[s] / src_tokens[s] for s in lp4.MIX_FAVORED]
    lo = [kept_by_src[s] / src_tokens[s] for s in src_tokens if s not in lp4.MIX_FAVORED]
    assert min(hi) > max(lo)  # favored sources keep a strictly larger fraction


def test_chunks_cover_and_overlap(spark):
    docs = t(spark, SF_SMALL, "documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("n")
    )
    chunks = lp4.pipe_doc_chunks(spark, SF_SMALL)
    # every token index is covered: sum of chunk sizes - overlaps == n
    agg = chunks.groupBy("doc_id").agg(
        F.sum("n_tokens").alias("tok_sum"), F.count(F.lit(1)).alias("k")
    )
    j = docs.join(agg, "doc_id")
    overlap = lp4.CHUNK_W - lp4.CHUNK_S
    bad = j.where(
        F.col("tok_sum") - (F.col("k") - 1) * overlap != F.col("n")
    ).count()
    assert bad == 0
    # first chunk of every doc starts at token 1 (prefix of the text)
    first = chunks.where(F.col("chunk_id") == 0).join(
        t(spark, SF_SMALL, "documents"), "doc_id"
    )
    assert first.where(~F.col("text").startswith(F.col("chunk_text"))).count() == 0


def test_tfidf_rare_terms_beat_stopword_like_terms(spark):
    out = lp4.text_tfidf_topterms(spark, SF_SMALL)
    # rank column is 1..3 per doc, unique
    per_doc = out.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("k"), F.countDistinct("rk").alias("kd")
    )
    assert per_doc.where((F.col("k") > 3) | (F.col("k") != F.col("kd"))).count() == 0
    # a term appearing in every doc has idf 0 => can only rank via tie-break;
    # verify top-1 terms never have df == N
    n = t(spark, SF_SMALL, "documents").count()
    top1 = out.where(F.col("rk") == 1)
    assert top1.where(F.col("df") == n).count() == 0
