"""Unigram-LM scoring and curriculum ordering semantics."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from hudi_examples_spark.operators.llm_pipeline5 import with_quality_columns
from hudi_examples_spark.operators.llm_pipeline6 import (
    pipe_curriculum_order,
    text_unigram_lm_score,
)
from tests.conftest import SF_SMALL


def test_unigram_score_matches_hand_computation(spark):
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF_SMALL}/documents.parquet").collect()
    }
    counts: dict[str, int] = {}
    toks: dict[int, list[str]] = {}
    for did, text in docs.items():
        ws = [w for w in text.strip().split(" ") if w]
        toks[did] = ws
        for w in ws:
            counts[w] = counts.get(w, 0) + 1
    got = {r["doc_id"]: r for r in text_unigram_lm_score(spark, SF_SMALL).collect()}
    assert set(got) == {d for d, ws in toks.items() if ws}
    for did, r in got.items():
        ws = toks[did]
        expect = sum(counts[w] + 1 for w in ws)
        assert r["n_tokens"] == len(ws)
        assert r["score_num"] == expect
        assert r["avg_freq_milli"] == (1000 * expect) // len(ws)


def test_curriculum_order_is_banded_permutation(spark):
    out = pipe_curriculum_order(spark, SF_SMALL).collect()
    n = len(out)
    assert sorted(r["curriculum_pos"] for r in out) == list(range(1, n + 1))
    # every high doc precedes every mid doc precedes every low doc
    order = {"high": 0, "mid": 1, "low": 2}
    seq = [order[r["band"]] for r in sorted(out, key=lambda r: r["curriculum_pos"])]
    assert seq == sorted(seq)
    # within a band the order is the seeded md5 order (no RNG involved)
    for band in ("high", "mid", "low"):
        rows = sorted(
            (r for r in out if r["band"] == band), key=lambda r: r["band_rank"]
        )
        hashes = [
            hashlib.md5(f"cur42:{r['doc_id']}".encode()).hexdigest() for r in rows
        ]
        assert hashes == sorted(hashes)


def test_curriculum_bands_agree_with_quality_columns(spark):
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").select("doc_id", "text")
    bands = {
        r["doc_id"]: r["band"]
        for r in with_quality_columns(docs).select("doc_id", "band").collect()
    }
    for r in pipe_curriculum_order(spark, SF_SMALL).collect():
        assert bands[r["doc_id"]] == r["band"]


def test_semantic_dedup_drops_planted_cluster_dup(spark, tmp_path):
    """Planted near-identical pair in the SAME cluster is deduped (higher id
    dropped); the identical vector in a DIFFERENT cluster survives — cluster
    blindness is SemDeDup's documented contract, not a bug."""
    import numpy as np

    from hudi_examples_spark.operators.llm_pipeline6 import dedup_semantic

    rng = np.random.default_rng(11)
    rows = []
    for i in range(60):
        v = rng.standard_normal(8)
        rows.append((i, (v / np.linalg.norm(v)).tolist(), i % 3))
    base = np.array(rows[0][1])
    near = base + 1e-4 * rng.standard_normal(8)
    rows.append((100, (near / np.linalg.norm(near)).tolist(), 0))  # same cluster as 0
    rows.append((101, base.tolist(), 1))  # identical but other cluster
    df = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT")
    p = str(tmp_path / "embeddings.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "emb"))
    import shutil, glob, os
    shutil.copy(glob.glob(str(tmp_path / "emb" / "*.parquet"))[0], p)

    out = {r["vec_id"]: r for r in dedup_semantic(spark, str(tmp_path)).collect()}
    assert out[0]["kept"] and out[0]["n_near_dups"] >= 1
    assert not out[100]["kept"]  # same-cluster near-dup, higher id -> dropped
    assert out[101]["kept"] and out[101]["n_near_dups"] == 0  # other cluster: blind


def test_semantic_dedup_giant_cluster_guard(spark):
    """A cluster holding >=60% of all rows routes through the blocked
    BLAS pair path: identical pair set to the naive cluster self-join, with
    per-task pair counts bounded by the sub-block size (the SemDeDup skew
    failure mode is mechanically guarded, not just documented)."""
    import math

    import numpy as np
    from pyspark.sql import functions as F

    from hudi_examples_spark.functions.vectors import cosine_similarity
    from hudi_examples_spark.operators.llm_pipeline6 import semantic_dup_pairs

    rng = np.random.default_rng(5)
    rows = []
    for i in range(300):
        v = rng.standard_normal(8)
        label = 0 if i < 200 else (i % 3) + 1  # label 0 holds 2/3 of rows
        rows.append((i, (v / np.linalg.norm(v)).tolist(), label))
    # plant near-dups inside the giant cluster across sub-block boundaries
    for j, src in enumerate((0, 7, 55, 123)):
        base = np.array(rows[src][1])
        near = base + 1e-4 * rng.standard_normal(8)
        rows.append((1000 + j, (near / np.linalg.norm(near)).tolist(), 0))
    e = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT")

    guarded = semantic_dup_pairs(e, 0.92, max_cluster_size=50, block_size=32)
    a = e.select("label", F.col("vec_id").alias("d1"), F.col("embedding").alias("emb1"))
    b = e.select("label", F.col("vec_id").alias("d2"), F.col("embedding").alias("emb2"))
    naive = (
        a.join(b, "label")
        .filter(F.col("d1") < F.col("d2"))
        .select("d1", "d2", F.round(cosine_similarity("emb1", "emb2"), 6).alias("cos_sim"))
        .filter(F.col("cos_sim") >= 0.92)
    )
    got = sorted(map(tuple, guarded.collect()))
    want = sorted(map(tuple, naive.collect()))
    assert got == want and len(want) >= 4  # identical pairs incl. planted dups
    # bounded chunks: no sub-block of the giant cluster exceeds ~3x block_size
    nb = max(2, math.ceil(204 / 32))
    blocks = (
        e.filter(F.col("label") == 0)
        .withColumn("sb", F.pmod(F.xxhash64("vec_id"), F.lit(nb)))
        .groupBy("sb")
        .count()
    )
    assert blocks.agg(F.max("count")).first()[0] <= 3 * 32


def test_bloom_prefilter_matches_exact_join(spark):
    """The bloom prefilter is a pruning layer: the final result must equal
    the plain exact shingle join, and every truly-contaminated doc must be
    bloom-positive (no false negatives, by construction)."""
    from hudi_examples_spark.operators.llm_pipeline6 import (
        BLOOM_REF_MOD,
        BLOOM_SHINGLE_K,
        dedup_bloom_prefilter,
    )
    from hudi_examples_spark.functions.text import shingles_from, words

    sf = "/root/testdata/sf0.001"
    got = dedup_bloom_prefilter(spark, sf)
    d = spark.read.parquet(sf + "/documents.parquet").select(
        "doc_id", words(F.col("text")).alias("w")
    )
    sh = d.select("doc_id", F.explode(shingles_from(F.col("w"), BLOOM_SHINGLE_K)).alias("g"))
    ref = sh.filter(F.col("doc_id") % BLOOM_REF_MOD == 0).select("g").distinct()
    exact = (
        sh.filter(F.col("doc_id") % BLOOM_REF_MOD != 0)
        .join(ref, "g", "left_semi")
        .select("doc_id")
        .distinct()
    )
    want_ids = {r["doc_id"] for r in exact.collect()}
    rows = got.collect()
    assert {r["doc_id"] for r in rows if r["contaminated"]} == want_ids
    assert len(want_ids) > 0  # non-trivial at this SF (planted overlap exists)
    assert all(r["bloom_pruned_ok"] for r in rows)


def test_fixed_bloom_merge_semantics():
    """Partial blooms at one (m, k) OR-merge into exactly the filter a
    single-pass build would produce; mismatched shapes are rejected."""
    import numpy as np
    import pytest as _pytest

    from hudi_examples_spark.table.bloom import (
        bloom_contains,
        bloom_params,
        build_bloom_fixed,
        merge_blooms,
    )

    keys = [f"k{i}" for i in range(500)]
    m, k = bloom_params(len(keys), 1e-6)
    whole = build_bloom_fixed(keys, m, k)
    merged = merge_blooms(
        [build_bloom_fixed(keys[:200], m, k), build_bloom_fixed(keys[200:], m, k)]
    )
    assert merged["bits"] == whole["bits"] and merged["n"] == 500
    assert bool(np.all(bloom_contains(merged, keys)))
    absent = [f"x{i}" for i in range(2000)]
    assert int(bloom_contains(merged, absent).sum()) <= 2  # ~1e-6 FPP budget
    with _pytest.raises(ValueError):
        merge_blooms([whole, build_bloom_fixed(keys, m + 8, k)])
