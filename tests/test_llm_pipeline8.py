"""Exact-substring (passage-level) dedup semantics — planted passages."""

from __future__ import annotations

import glob
import shutil

from hudi_examples_spark.operators.llm_pipeline8 import (
    SPAN_W,
    dedup_substring_removal,
    dedup_substring_spans,
)
from tests.conftest import SF_SMALL


def _write_docs(spark, tmp_path, rows):
    df = spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in rows],
        "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "docs"))
    shutil.copy(
        glob.glob(str(tmp_path / "docs" / "*.parquet"))[0],
        str(tmp_path / "documents.parquet"),
    )
    return str(tmp_path)


def test_planted_passage_found_with_exact_span(spark, tmp_path):
    # a 10-token passage shared verbatim by docs 1 and 2, embedded at
    # different offsets inside otherwise-unique text; doc 3 is clean.
    passage = " ".join(f"p{i}" for i in range(10))
    d1 = "a1 a2 a3 " + passage + " a4 a5"  # tokens 4..13 duplicated
    d2 = passage + " b1 b2 b3 b4"  # tokens 1..10 duplicated
    d3 = " ".join(f"c{i}" for i in range(12))
    sf = _write_docs(spark, tmp_path, [(1, d1), (2, d2), (3, d3)])
    spans = {r["doc_id"]: r for r in dedup_substring_spans(spark, sf).collect()}
    assert set(spans) == {1, 2}
    assert (spans[1]["span_start"], spans[1]["span_end"]) == (4, 13)
    assert (spans[2]["span_start"], spans[2]["span_end"]) == (1, 10)
    assert spans[1]["span_len"] == 10
    # 10-token span carries 10 - W + 1 windows
    assert spans[1]["n_windows"] == 10 - SPAN_W + 1


def test_disjoint_passages_stay_separate_spans(spark, tmp_path):
    p1 = " ".join(f"x{i}" for i in range(SPAN_W))
    p2 = " ".join(f"y{i}" for i in range(SPAN_W))
    # doc 1 carries both passages separated by unique filler > 1 token
    d1 = p1 + " u1 u2 u3 " + p2
    sf = _write_docs(spark, tmp_path, [(1, d1), (2, p1), (3, p2)])
    spans = [
        (r["span_start"], r["span_end"])
        for r in dedup_substring_spans(spark, sf).collect()
        if r["doc_id"] == 1
    ]
    assert spans == [(1, SPAN_W), (SPAN_W + 4, 2 * SPAN_W + 3)]


def test_removal_accounting_and_fully_dup_flag(spark, tmp_path):
    passage = " ".join(f"p{i}" for i in range(SPAN_W + 2))
    d1 = passage  # fully duplicated
    d2 = passage + " z1 z2 z3"  # partially duplicated
    d3 = "short doc"  # < W tokens: never flagged
    sf = _write_docs(spark, tmp_path, [(1, d1), (2, d2), (3, d3)])
    out = {r["doc_id"]: r for r in dedup_substring_removal(spark, sf).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1]["fully_dup"] == 1 and out[1]["kept_tokens"] == 0
    assert out[2]["fully_dup"] == 0
    assert out[2]["dup_tokens"] == SPAN_W + 2
    assert out[2]["kept_tokens"] == 3
    assert out[3]["dup_tokens"] == 0 and out[3]["kept_tokens"] == 2


def test_no_false_positives_on_unique_corpus(spark, tmp_path):
    rows = [(i, " ".join(f"w{i}_{j}" for j in range(15))) for i in range(5)]
    sf = _write_docs(spark, tmp_path, rows)
    assert dedup_substring_spans(spark, sf).count() == 0
    out = dedup_substring_removal(spark, sf).collect()
    assert all(r["dup_tokens"] == 0 for r in out) and len(out) == 5


def test_short_docs_tolerated_across_window_ops(spark, tmp_path):
    # sequence(1, 0) is descending in Spark — 1-2 token docs must not blow
    # up element_at in any sliding-window op (regression: fp_winnowing too)
    from hudi_examples_spark.operators.llm_pipeline2 import fp_winnowing

    sf = _write_docs(spark, tmp_path, [(1, "one"), (2, "two words"), (3, "a b c d")])
    assert dedup_substring_spans(spark, sf).count() == 0
    assert {r["doc_id"] for r in dedup_substring_removal(spark, sf).collect()} == {
        1,
        2,
        3,
    }
    # winnowing excludes <3-word docs but must not error on them
    assert {r["doc_id"] for r in fp_winnowing(spark, sf).collect()} == {3}


def _reference_bpe(word_counts, rounds):
    """Tiny single-node BPE with the same greedy/tie-break semantics."""
    syms = {w: list(w) for w in word_counts}
    out = []
    for _ in range(rounds):
        pairs = {}
        for w, cnt in word_counts.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] = pairs.get((s[i], s[i + 1]), 0) + cnt
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), c = best
        out.append((a, b, c))
        for w in syms:
            s, new, i = syms[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    new.append(a + b)
                    i += 2  # greedy left-to-right
                else:
                    new.append(s[i])
                    i += 1
            syms[w] = new
    return out


def test_bpe_matches_reference_implementation(spark, tmp_path):
    from hudi_examples_spark.operators.llm_pipeline8 import BPE_ROUNDS, tok_bpe_merges

    # classic corpus + an overlap word (aaaa) pinning the greedy semantics
    docs = [
        (1, "low low low low low lower lower newest newest"),
        (2, "newest newest newest newest widest widest aaaa aaaa"),
        (3, "widest lowest aaaa"),
    ]
    counts: dict[str, int] = {}
    for _, t_ in docs:
        for w in t_.split():
            counts[w] = counts.get(w, 0) + 1
    expect = _reference_bpe(counts, BPE_ROUNDS)
    sf = _write_docs(spark, tmp_path, docs)
    got = [
        (r["pair"], r["merged_token"], r["pair_count"])
        for r in tok_bpe_merges(spark, sf).collect()
    ]
    assert got == [(f"{a}+{b}", a + b, c) for a, b, c in expect]


def test_bpe_overlap_chain_merges_greedily(spark, tmp_path):
    from hudi_examples_spark.operators.llm_pipeline8 import tok_bpe_merges

    # 6 'aaaa' words: round 1 pair (a,a) has count 3 per word * 6 = 18 and
    # each word merges into [aa, aa]; round 2 then merges (aa, aa)
    sf = _write_docs(spark, tmp_path, [(1, " ".join(["aaaa"] * 6))])
    rows = tok_bpe_merges(spark, sf).collect()
    assert (rows[0]["pair"], rows[0]["pair_count"]) == ("a+a", 18)
    assert (rows[1]["pair"], rows[1]["pair_count"]) == ("aa+aa", 6)


def test_kmeans_recovers_planted_blobs(spark, tmp_path):
    from pyspark.sql import functions as F
    from pyspark.sql.types import FloatType

    from hudi_examples_spark.operators.llm_pipeline8 import (
        KM_DIMS,
        KM_K,
        emb_kmeans_lloyd,
    )

    # 3 tight, well-separated blobs along different axes; seeds 0..KM_K-1
    # include at least one member of each blob
    def vec(axis, eps):
        v = [0.0] * KM_DIMS
        v[axis] = 0.9
        v[(axis + 1) % KM_DIMS] = eps
        return v

    rows = []
    for i in range(60):
        blob = i % 3
        rows.append((i, vec(blob * 10, 0.001 * (i % 5)), blob))
    df = spark.createDataFrame(
        rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>, label INT"
    ).select(
        "vec_id",
        F.col("embedding").cast("array<float>").alias("embedding"),
        "label",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "emb"))
    import glob as g
    import shutil as sh

    sh.copy(
        g.glob(str(tmp_path / "emb" / "*.parquet"))[0],
        str(tmp_path / "embeddings.parquet"),
    )
    out = emb_kmeans_lloyd(spark, str(tmp_path)).collect()
    assert len(out) == 60
    # KM_K=8 seeds over 3 blobs: blobs may split into sub-clusters, but no
    # final cluster may ever MIX blobs (the separation is >> intra-blob eps)
    by_cluster: dict = {}
    for r in out:
        by_cluster.setdefault(r["cluster"], set()).add(r["vec_id"] % 3)
    assert all(len(blobs) == 1 for blobs in by_cluster.values()), by_cluster
    # all 3 blobs are represented across the final clusters
    assert {next(iter(b)) for b in by_cluster.values()} == {0, 1, 2}
    # deterministic: a second run returns the identical assignment
    again = emb_kmeans_lloyd(spark, str(tmp_path)).collect()
    assert [(r["vec_id"], r["cluster"], r["dist"]) for r in out] == [
        (r["vec_id"], r["cluster"], r["dist"]) for r in again
    ]


def test_span_corruption_plan_properties(spark):
    from hudi_examples_spark.operators.llm_pipeline8 import pipe_span_corruption

    out = pipe_span_corruption(spark, SF_SMALL).collect()
    assert out
    n_tok = {
        r["doc_id"]: r["n"]
        for r in spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .selectExpr("doc_id", "size(filter(split(trim(text), ' '), w -> w != '')) AS n")
        .collect()
    }
    by_doc: dict = {}
    for r in out:
        assert 1 <= r["span_start"] <= r["span_end"] <= n_tok[r["doc_id"]]
        assert r["span_len"] == r["span_end"] - r["span_start"] + 1
        by_doc.setdefault(r["doc_id"], []).append(r)
    total_corrupt = sum(r["span_len"] for r in out)
    total_tokens = sum(n_tok.values())
    # ~15% target: loose band, deterministic draw (no flakiness)
    assert 0.05 < total_corrupt / total_tokens < 0.35
    for rows in by_doc.values():
        rows.sort(key=lambda r: r["span_start"])
        # sentinels number 0..k-1 in order; merged spans never touch
        assert [r["sentinel_k"] for r in rows] == list(range(len(rows)))
        for a, b in zip(rows, rows[1:]):
            assert b["span_start"] > a["span_end"] + 1
    # deterministic: identical plan on re-run
    again = pipe_span_corruption(spark, SF_SMALL).collect()
    assert [tuple(r) for r in out] == [tuple(r) for r in again]


def test_length_buckets_batches_are_homogeneous_and_bounded(spark):
    from hudi_examples_spark.operators.llm_pipeline8 import (
        LEN_BATCH_SIZE,
        pipe_length_buckets,
    )

    out = pipe_length_buckets(spark, SF_SMALL).collect()
    assert out
    by_batch: dict = {}
    for r in out:
        assert r["n_tokens"] <= r["bucket"]
        assert r["pad_tokens"] == r["bucket"] - r["n_tokens"]
        assert 0 <= r["pad_tokens"] < r["bucket"]  # never a whole-bucket waste
        by_batch.setdefault((r["bucket"], r["batch_id"]), []).append(r)
    for (bucket, _bid), rows in by_batch.items():
        assert len(rows) <= LEN_BATCH_SIZE
        assert all(r["bucket"] == bucket for r in rows)
    # batch ids are dense per bucket: 1..n_batches with only the last partial
    buckets = {b for b, _ in by_batch}
    for b in buckets:
        ids = sorted(bid for bb, bid in by_batch if bb == b)
        assert ids == list(range(1, len(ids) + 1))
        assert all(len(by_batch[(b, i)]) == LEN_BATCH_SIZE for i in ids[:-1])


def test_runs_on_sf_small_and_spans_cover_windows(spark):
    spans = dedup_substring_spans(spark, SF_SMALL).collect()
    for r in spans:
        assert r["span_len"] >= SPAN_W
        assert 1 <= r["n_windows"] <= r["span_len"] - SPAN_W + 1
        assert r["span_end"] >= r["span_start"]
    rem = dedup_substring_removal(spark, SF_SMALL).collect()
    n_docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").count()
    assert len(rem) == n_docs
    for r in rem:
        assert 0 <= r["dup_tokens"] <= r["n_tokens"]
        assert r["kept_tokens"] == r["n_tokens"] - r["dup_tokens"]


def _reference_bpe_encode(word_counts, rounds):
    """Reference encode: learn merges, then the final symbol tables —
    returns {token: (occurrences, word_types)}."""
    syms = {w: list(w) for w in word_counts}
    for _ in range(rounds):
        pairs = {}
        for w, cnt in word_counts.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] = pairs.get((s[i], s[i + 1]), 0) + cnt
        (a, b), _c = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        for w in syms:
            s, new, i = syms[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    new.append(a + b)
                    i += 2
                else:
                    new.append(s[i])
                    i += 1
            syms[w] = new
    # occurrences count every position (weighted by word count); word_types
    # count distinct words containing the token
    hist: dict[str, list[int]] = {}
    for w, cnt in word_counts.items():
        for s in syms[w]:
            hist.setdefault(s, [0, 0])[0] += cnt
        for s in set(syms[w]):
            hist[s][1] += 1
    return hist


def test_bpe_encode_matches_reference(spark, tmp_path):
    from hudi_examples_spark.operators.llm_pipeline8 import BPE_ROUNDS, tok_bpe_encode

    docs = [
        (1, "low low low low low lower lower newest newest"),
        (2, "newest newest newest newest widest widest aaaa aaaa"),
        (3, "widest lowest aaaa"),
    ]
    counts: dict[str, int] = {}
    for _, t_ in docs:
        for w in t_.split():
            counts[w] = counts.get(w, 0) + 1
    ref = _reference_bpe_encode(counts, BPE_ROUNDS)
    sf = _write_docs(spark, tmp_path, docs)
    got = {
        r["token"]: (r["occurrences"], r["word_types"])
        for r in tok_bpe_encode(spark, sf).collect()
    }
    assert got == {t: (o, wt) for t, (o, wt) in ref.items()}


def test_bpe_apply_merges_is_pure_apply(spark, tmp_path):
    """The apply path honors an EXTERNAL merge list (not re-derived): an
    out-of-corpus-order rank list must be applied exactly as given."""
    from pyspark.sql import functions as F

    from hudi_examples_spark.functions.text import words
    from hudi_examples_spark.operators.llm_pipeline8 import bpe_apply_merges

    sf = _write_docs(spark, tmp_path, [(1, "abab abab cc")])
    from hudi_examples_spark.operators.llm_pipeline5 import _docs

    wt = (
        _docs(spark, sf)
        .select(F.explode(words("text")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    symbols = wt.select(
        "w",
        "cnt",
        F.posexplode(
            F.expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))")
        ).alias("p", "s"),
    ).select("w", "cnt", (F.col("p") + 1).alias("pos"), "s")
    # rank order: (a,b) then (ab,ab) — "abab" becomes one token
    enc = bpe_apply_merges(symbols, [("a", "b"), ("ab", "ab")])
    toks = {
        (r["w"], r["pos"]): r["s"]
        for r in enc.collect()
    }
    assert toks == {("abab", 1): "abab", ("cc", 1): "c", ("cc", 2): "c"}


def test_self_dedup_planted_intra_doc_repeat(spark, tmp_path):
    """A document repeating its own 8-token boilerplate must have the SECOND
    occurrence accounted (first kept), and a no-repeat doc reports zero."""
    from hudi_examples_spark.operators.llm_pipeline8 import SPAN_W, pipe_self_dedup

    boiler = " ".join(f"b{i}" for i in range(SPAN_W + 2))  # 8 tokens at W=6
    clean = " ".join(f"u{i}" for i in range(20))
    docs = [
        (1, f"{boiler} mid1 mid2 mid3 {boiler}"),
        (2, clean),
    ]
    sf = _write_docs(spark, tmp_path, docs)
    got = {r["doc_id"]: r for r in pipe_self_dedup(spark, sf).collect()}
    # doc 1: 8 + 3 + 8 = 19 tokens; the second boilerplate block's windows
    # all repeat windows seen at positions 1..3 -> one merged span covering
    # tokens 12..19 (8 tokens)
    assert got[1]["n_tokens"] == 19
    assert got[1]["repeat_tokens"] == SPAN_W + 2
    assert got[1]["kept_tokens"] == 19 - (SPAN_W + 2)
    assert got[1]["n_repeat_spans"] == 1
    assert got[2]["repeat_tokens"] == 0 and got[2]["kept_tokens"] == 20
