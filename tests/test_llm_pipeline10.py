"""Gopher rule filter, radius search, WordPiece tokenizer — planted-data semantics."""

from __future__ import annotations

import glob
import shutil

from pyspark.sql import functions as F

from hudi_examples_spark.operators.llm_pipeline10 import (
    RANGE_TAU,
    _wp_vocab,
    corpus_token_drift,
    sim_range_search,
    text_gopher_filter,
    tok_wordpiece_encode,
    wordpiece_encode_words,
)


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


def _write_embeddings(spark, tmp_path, rows):
    df = spark.createDataFrame(
        [(i, [float(x) for x in v], 0) for i, v in rows],
        "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "embs"))
    shutil.copy(
        glob.glob(str(tmp_path / "embs" / "*.parquet"))[0],
        str(tmp_path / "embeddings.parquet"),
    )
    return str(tmp_path)


# ---------------------------------------------------------------------------
# text_gopher_filter
# ---------------------------------------------------------------------------


def test_gopher_each_rule_fires_independently(spark, tmp_path):
    ok_words = ["the", "a"] + ["word"] * 23  # 25 words, 2 stopwords, len 4
    no_stop = ["word"] * 25
    too_short = ["the", "a", "word"]
    long_words = ["the", "a"] + ["w" * 13] * 23  # mean len (6 + 13*23)/25 > 10
    numeric = ["the", "a"] + ["12345"] * 23  # 2/25 alphabetic < 80%
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (1, " ".join(ok_words)),
            (2, " ".join(no_stop)),
            (3, " ".join(too_short)),
            (4, " ".join(long_words)),
            (5, " ".join(numeric)),
        ],
    )
    rows = {r["doc_id"]: r for r in text_gopher_filter(spark, sf).collect()}
    assert rows[1]["keep"] and all(
        rows[1][c] for c in ("r_wordcount", "r_meanlen", "r_stopwords", "r_alpha")
    )
    assert not rows[2]["r_stopwords"] and not rows[2]["keep"]
    assert rows[2]["r_wordcount"] and rows[2]["r_alpha"]
    assert not rows[3]["r_wordcount"] and not rows[3]["keep"]
    assert not rows[4]["r_meanlen"] and not rows[4]["keep"]
    assert rows[4]["r_wordcount"] and rows[4]["r_stopwords"]
    assert not rows[5]["r_alpha"] and not rows[5]["keep"]
    assert rows[5]["r_meanlen"]  # 5-char numerals are inside [3, 10]


def test_gopher_features_are_exact_integers(spark, tmp_path):
    sf = _write_docs(spark, tmp_path, [(1, "the aa bbb cccc")])
    r = text_gopher_filter(spark, sf).collect()[0]
    assert (r["n_words"], r["sum_word_len"], r["n_stop"], r["n_alpha"]) == (4, 12, 1, 4)


# ---------------------------------------------------------------------------
# sim_range_search
# ---------------------------------------------------------------------------


def test_range_search_returns_exactly_the_ball(spark, tmp_path):
    # vec 0 is the only query (id % 50 == 0); vec 1 is a duplicate of it
    # (cos 1.0), vec 2 orthogonal (cos 0), vec 3 opposite (cos -1).
    sf = _write_embeddings(
        spark,
        tmp_path,
        [
            (0, [1.0, 0.0, 0.0, 0.0]),
            (1, [2.0, 0.0, 0.0, 0.0]),
            (2, [0.0, 1.0, 0.0, 0.0]),
            (3, [-1.0, 0.0, 0.0, 0.0]),
        ],
    )
    got = sim_range_search(spark, sf).collect()
    assert [(r["q_id"], r["vec_id"], r["cos_sim"]) for r in got] == [(0, 1, 1.0)]


def test_range_search_radius_is_inclusive_and_excludes_self(spark, tmp_path):
    import math

    # vec 1 placed at EXACTLY cos = RANGE_TAU from the query axis
    ang = math.acos(RANGE_TAU)
    sf = _write_embeddings(
        spark,
        tmp_path,
        [(0, [1.0, 0.0]), (1, [math.cos(ang), math.sin(ang)]), (50, [1.0, 0.0])],
    )
    got = {(r["q_id"], r["vec_id"]) for r in sim_range_search(spark, sf).collect()}
    # both queries see each other (cos 1.0) and the boundary point survives
    # the inclusive >=; no (q, q) self rows appear
    assert (0, 50) in got and (50, 0) in got
    assert (0, 1) in got and (50, 1) in got
    assert all(q != v for q, v in got)


# ---------------------------------------------------------------------------
# tok_wordpiece_encode
# ---------------------------------------------------------------------------


def test_wordpiece_tokens_reassemble_every_word(spark, tmp_path):
    sf = _write_docs(
        spark,
        tmp_path,
        [(1, "abcdefgh abcdefgh abc xyz zz the a"), (2, "abcdefgh qabc zz zz")],
    )
    starts, conts, wt = _wp_vocab(spark, sf)
    enc = wordpiece_encode_words(wt, starts, conts).collect()
    assert len(enc) > 0
    for r in enc:
        rebuilt = "".join(t[2:] if t.startswith("##") else t for t in r["toks"])
        assert rebuilt == r["w"], (r["w"], r["toks"])
        # only the first piece may be a start-form token
        assert not r["toks"][0].startswith("##")
        assert all(t.startswith("##") for t in r["toks"][1:])


def test_wordpiece_greedy_takes_longest_start_then_continuations(spark, tmp_path):
    # "abcdefgh" appears 3x: its len-6 prefix "abcdef" is the longest start
    # piece, leaving "gh" as a continuation; hand-check both land as tokens.
    sf = _write_docs(spark, tmp_path, [(1, "abcdefgh abcdefgh abcdefgh b")])
    got = {r["token"]: r for r in tok_wordpiece_encode(spark, sf).collect()}
    assert got["abcdef"]["occurrences"] == 3 and got["abcdef"]["word_types"] == 1
    assert got["##gh"]["occurrences"] == 3
    assert got["b"]["occurrences"] == 1


def test_wordpiece_occurrences_weighted_by_word_frequency(spark, tmp_path):
    sf = _write_docs(spark, tmp_path, [(1, "ab ab ab cd"), (2, "ab cd cd")])
    got = {r["token"]: r["occurrences"] for r in tok_wordpiece_encode(spark, sf).collect()}
    # both words are their own start pieces (len-2 candidates beat chars)
    assert got["ab"] == 4 and got["cd"] == 3


def test_corpus_drift_hand_computed(spark, tmp_path):
    # ref slice (en): 4 tokens, "aa" x3 + "bb" x1 → ppm 750000 / 250000
    # rest (de):      4 tokens, "aa" x1 + "cc" x3 → ppm 250000 / 750000
    df = spark.createDataFrame(
        [
            (1, "aa aa aa bb", "en", "s0", 11),
            (2, "aa cc cc cc", "de", "s0", 11),
        ],
        "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "d"))
    import glob as g
    import shutil as sh

    sh.copy(g.glob(str(tmp_path / "d" / "*.parquet"))[0], str(tmp_path / "documents.parquet"))
    rows = {r["token"]: r for r in corpus_token_drift(spark, str(tmp_path)).collect()}
    assert rows["cc"]["ppm_drift"] == 750000  # absent from ref, 75% of rest
    assert rows["bb"]["ppm_drift"] == 250000
    assert rows["aa"]["ppm_ref"] == 750000 and rows["aa"]["ppm_rest"] == 250000
    assert rows["aa"]["ppm_drift"] == 500000
    assert rows["cc"]["c_ref"] == 0 and rows["cc"]["c_rest"] == 3


def test_wordpiece_single_chars_guarantee_no_unk(spark, tmp_path):
    # a word made of characters that never co-occur as multi-char pieces
    # still segments (into chars), never drops or UNKs
    sf = _write_docs(spark, tmp_path, [(1, "zq zq xv")])
    starts, conts, wt = _wp_vocab(spark, sf)
    enc = {r["w"]: r["toks"] for r in wordpiece_encode_words(wt, starts, conts).collect()}
    total = (
        tok_wordpiece_encode(spark, sf)
        .agg(F.sum("occurrences").alias("s"))
        .collect()[0]["s"]
    )
    # every char position of every occurrence is covered by exactly one token
    assert all("".join(t.lstrip("#") for t in v) == k for k, v in enc.items())
    assert total > 0
