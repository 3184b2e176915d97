"""Semantic properties of the corpus split / packing / clustering ops
(the DuckDB oracles check exactness; these pin the properties that make the
ops fit for a training pipeline)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hudi_examples_spark.operators.llm_pipeline import dedup_ngram_jaccard
from hudi_examples_spark.operators.llm_pipeline3 import (
    dedup_clusters,
    pipe_hash_split,
    pipe_pack_sequences,
)
from tests.conftest import SF_SMALL


def test_hash_split_is_content_keyed_no_leakage(spark):
    """Byte-identical documents must land in the SAME split (train/test
    leakage guard), and the assignment is a pure function of text."""
    out = pipe_hash_split(spark, SF_SMALL)
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").select("doc_id", "text")
    joined = out.join(docs, "doc_id")
    per_text = joined.groupBy("text").agg(F.countDistinct("split").alias("n_splits"))
    assert per_text.filter("n_splits > 1").count() == 0
    # ~80/10/10 within tolerance
    n = out.count()
    frac = {
        r["split"]: r["c"] / n
        for r in out.groupBy("split").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    assert 0.6 < frac.get("train", 0) < 0.95
    assert all(0.0 < frac.get(s, 0) < 0.25 for s in ("val", "test"))


def test_pack_sequences_is_gapless_and_sequential_per_shard(spark):
    out = pipe_pack_sequences(spark, SF_SMALL).collect()
    by_shard: dict[int, list] = {}
    for r in sorted(out, key=lambda r: (r["shard"], r["doc_id"])):
        by_shard.setdefault(r["shard"], []).append(r)
    for shard, rows in by_shard.items():
        cum = 0
        for r in rows:
            assert r["w_start"] == cum // 512, (shard, r)
            cum += r["n_tokens"]
            assert r["w_end"] == (cum - 1) // 512, (shard, r)
            assert r["w_start"] <= r["w_end"]


def test_dedup_clusters_are_transitive_with_min_representative(spark):
    pairs = dedup_ngram_jaccard(spark, SF_SMALL).collect()
    labels = {r["doc_id"]: r["cluster_id"] for r in dedup_clusters(spark, SF_SMALL).collect()}
    # every near-dup pair shares one cluster id
    for p in pairs:
        assert labels[p["d1"]] == labels[p["d2"]], p
    # the representative is the smallest member of its component
    members: dict[int, list[int]] = {}
    for doc, c in labels.items():
        members.setdefault(c, []).append(doc)
    for c, docs in members.items():
        assert c == min(docs)
    # union-by-hand check: build components with a simple union-find and compare
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for p in pairs:
        ra, rb = find(p["d1"]), find(p["d2"])
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    for doc, c in labels.items():
        assert find(doc) == c, doc


def test_dedup_keep_best_selects_argmax_quality_member(spark):
    from hudi_examples_spark.operators.llm_pipeline3 import dedup_keep_best
    from hudi_examples_spark.operators.llm_pipeline5 import with_quality_columns

    clusters = {r["doc_id"]: r["cluster_id"] for r in dedup_clusters(spark, SF_SMALL).collect()}
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").select("doc_id", "text")
    q = {r["doc_id"]: r["q_num"] for r in with_quality_columns(docs).select("doc_id", "q_num").collect()}
    out = dedup_keep_best(spark, SF_SMALL).collect()

    members: dict[int, list[int]] = {}
    for doc, c in clusters.items():
        members.setdefault(c, []).append(doc)
    assert {r["cluster_id"] for r in out} == set(members)
    for r in out:
        docs_in = members[r["cluster_id"]]
        assert r["n_members"] == len(docs_in)
        assert r["n_dropped"] == len(docs_in) - 1
        assert r["keep_doc_id"] in docs_in
        best = max(q[d] for d in docs_in)
        assert r["best_q_num"] == best
        # argmax with min-doc_id tiebreak
        assert r["keep_doc_id"] == min(d for d in docs_in if q[d] == best)
