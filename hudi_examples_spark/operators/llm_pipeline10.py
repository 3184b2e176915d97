"""Tenth LLM-pipeline battery: Gopher rule filtering, radius (range)
similarity search, and WordPiece greedy subword tokenization.

- ``text_gopher_filter`` — the Gopher/Dolma document-level rule battery
  (Rae et al. 2112.11446 §A1.1; Dolma's reimplementation): word-count
  bounds, mean-word-length bounds, minimum stopword evidence, and the
  alphabetic-word fraction, each emitted as its own named boolean plus the
  integer measurement it was computed from. Complements
  ``text_repetition_filter`` (the intra-document repetition half of the
  Gopher rules) and ``text_quality_score`` (the trained-classifier shape).
- ``sim_range_search`` — ε-ball retrieval: ALL corpus neighbors within a
  cosine radius of each query vector, not a fixed top-k. The dual of
  ``sim_knn_join``: radius search is what near-duplicate *auditing* and
  recall measurement use, where the neighbor count is data-dependent.
- ``tok_wordpiece_encode`` — WordPiece inference (Wu et al. 1609.08144;
  the BERT tokenizer): greedy longest-match-first segmentation against a
  corpus-derived subword vocabulary with distinct word-initial and
  continuation (``##``) piece tables. The segmentation loop is a single
  Catalyst ``aggregate`` fold over character positions — per-row sequential
  DP entirely inside whole-stage codegen, zero Python, zero extra shuffles.

Reference analogue: the reference ships no text analytics (its Spark/Flink/
Glue jobs move records — ``spark/src/main/scala/com/hudi/spark/*.scala``);
these are the beyond-reference training-data operators the task brief
requires.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from hudi_examples_spark.functions.text import STOPWORDS, words
from hudi_examples_spark.functions.vectors import cosine_similarity
from hudi_examples_spark.operators.spec import QuerySpec
from hudi_examples_spark.sources.readers import load_sf_table as t


def _docs(spark: SparkSession, sf: str) -> DataFrame:
    return t(spark, sf, "documents")


# ---------------------------------------------------------------------------
# Gopher rule filter
# ---------------------------------------------------------------------------

#: Gopher §A1.1 bounds, scaled to the sf corpus (whose documents run tens of
#: words, not thousands): min/max word count, mean word length in [3, 10],
#: >=2 stopwords, >=80% of words containing an alphabetic character. All four
#: rules compare INTEGERS (sums and cross-multiplied ratios), so the emitted
#: row hashes exactly with no float boundary between engines.
GOPHER_MIN_WORDS, GOPHER_MAX_WORDS = 20, 2000
GOPHER_MEANLEN_LO, GOPHER_MEANLEN_HI = 3, 10
GOPHER_MIN_STOPWORDS = 2
GOPHER_ALPHA_NUM, GOPHER_ALPHA_DEN = 4, 5  # n_alpha/n >= 4/5


def text_gopher_filter(spark: SparkSession, sf: str) -> DataFrame:
    """Gopher document-quality rule battery, one row per document with the
    per-rule verdicts AND the integer features they were judged on (corpus
    reports need the features, not just the keep bit).

    Shape: one projection over the corpus — every feature is a codegen
    higher-order expression on the word array (no shuffle, no UDF); the
    100 TB cost is the scan itself. The mean-word-length and alphabetic-
    fraction rules cross-multiply instead of dividing, so the whole row is
    integer-exact under the driver hash."""
    ws = words(F.col("text"))
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    d = _docs(spark, sf).select(
        "doc_id",
        F.size(ws).cast("bigint").alias("n_words"),
        F.aggregate(ws, F.lit(0).cast("bigint"), lambda a, w: a + F.length(w)).alias(
            "sum_word_len"
        ),
        F.size(F.filter(ws, lambda w: F.array_contains(stop_arr, F.lower(w))))
        .cast("bigint")
        .alias("n_stop"),
        F.size(F.filter(ws, lambda w: w.rlike("[A-Za-z]")))
        .cast("bigint")
        .alias("n_alpha"),
    )
    n, sl, st, al = (F.col(c) for c in ("n_words", "sum_word_len", "n_stop", "n_alpha"))
    rules = {
        "r_wordcount": (n >= GOPHER_MIN_WORDS) & (n <= GOPHER_MAX_WORDS),
        "r_meanlen": (sl >= GOPHER_MEANLEN_LO * n) & (sl <= GOPHER_MEANLEN_HI * n),
        "r_stopwords": st >= GOPHER_MIN_STOPWORDS,
        "r_alpha": GOPHER_ALPHA_DEN * al >= GOPHER_ALPHA_NUM * n,
    }
    out = d.withColumns(rules)
    keep = None
    for c in rules:
        keep = F.col(c) if keep is None else (keep & F.col(c))
    return out.withColumn("keep", keep).orderBy("doc_id")


def _stop_sql() -> str:
    return "[" + ", ".join(f"'{w}'" for w in STOPWORDS) + "]"


TEXT_GOPHER_ORACLE = f"""
WITH ws AS (
  SELECT doc_id, list_filter(str_split(trim(text), ' '), w -> w <> '') AS w
  FROM documents
), m AS (
  SELECT doc_id,
         len(w)::BIGINT AS n_words,
         COALESCE(list_sum(list_transform(w, x -> length(x))), 0)::BIGINT AS sum_word_len,
         len(list_filter(w, x -> list_contains({_stop_sql()}, lower(x))))::BIGINT AS n_stop,
         len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]')))::BIGINT AS n_alpha
  FROM ws
)
SELECT doc_id, n_words, sum_word_len, n_stop, n_alpha,
       n_words >= {GOPHER_MIN_WORDS} AND n_words <= {GOPHER_MAX_WORDS} AS r_wordcount,
       sum_word_len >= {GOPHER_MEANLEN_LO} * n_words
         AND sum_word_len <= {GOPHER_MEANLEN_HI} * n_words AS r_meanlen,
       n_stop >= {GOPHER_MIN_STOPWORDS} AS r_stopwords,
       {GOPHER_ALPHA_DEN} * n_alpha >= {GOPHER_ALPHA_NUM} * n_words AS r_alpha,
       (n_words >= {GOPHER_MIN_WORDS} AND n_words <= {GOPHER_MAX_WORDS})
         AND (sum_word_len >= {GOPHER_MEANLEN_LO} * n_words
              AND sum_word_len <= {GOPHER_MEANLEN_HI} * n_words)
         AND n_stop >= {GOPHER_MIN_STOPWORDS}
         AND {GOPHER_ALPHA_DEN} * n_alpha >= {GOPHER_ALPHA_NUM} * n_words AS keep
FROM m ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Radius (range) similarity search
# ---------------------------------------------------------------------------

#: Cosine radius and the query-side selector. Queries are a bounded slice of
#: the corpus (every 50th vector); the radius sits where the sf corpus has a
#: non-trivial but bounded neighbor set.
RANGE_TAU = 0.3
RANGE_QUERY_MOD = 50


def sim_range_search(spark: SparkSession, sf: str) -> DataFrame:
    """ε-ball cosine retrieval: every corpus vector within ``RANGE_TAU`` of
    each query vector — the data-dependent-cardinality dual of
    ``sim_knn_join``'s fixed top-k.

    Shape: the bounded query side broadcasts; similarity is a JVM-side
    higher-order expression over the scan; the radius predicate filters
    map-side, so nothing but hits ever shuffles. At 100 TB this is one pass
    over the corpus per query *batch* (not per query). A query side too big
    to broadcast swaps in the LSH bucket join (``dedup_embed_ann``'s
    machinery) with this same exact confirm — the radius predicate is the
    confirm step either way."""
    e = t(spark, sf, "embeddings")
    q = e.filter(F.col("vec_id") % RANGE_QUERY_MOD == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    return (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            F.round(cosine_similarity("embedding", "q_emb"), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= RANGE_TAU)
        .orderBy("q_id", F.desc("cos_sim"), "vec_id")
    )


SIM_RANGE_ORACLE = f"""
WITH q AS (
  SELECT vec_id AS q_id, embedding::DOUBLE[] AS q_emb
  FROM embeddings WHERE vec_id % {RANGE_QUERY_MOD} = 0
)
SELECT q.q_id, e.vec_id,
       round(list_cosine_similarity(e.embedding::DOUBLE[], q.q_emb), 6) AS cos_sim
FROM embeddings e, q
WHERE e.vec_id <> q.q_id
  AND round(list_cosine_similarity(e.embedding::DOUBLE[], q.q_emb), 6) >= {RANGE_TAU}
ORDER BY q_id, cos_sim DESC, vec_id
"""


# ---------------------------------------------------------------------------
# WordPiece greedy subword tokenization
# ---------------------------------------------------------------------------

#: Vocab construction bounds: multi-char candidate pieces of length 2..WP_MAXP
#: ranked by corpus occurrence weight; WP_TOP survive, plus every single
#: character in BOTH piece tables (so segmentation can never dead-end into an
#: [UNK]). WP_OUT rows of the token frequency table are emitted.
WP_MAXP = 6
WP_TOP = 40
WP_OUT = 40


def _wp_vocab(spark: SparkSession, sf: str) -> tuple[list, list, DataFrame]:
    """(start_pieces, cont_pieces, word_type_df): the corpus-derived WordPiece
    vocabulary. Pieces are (len, piece) tuples; start pieces match at word
    position 1, continuation pieces anywhere later (rendered ``##piece``).

    Distributed shape: the word-TYPE table (one shuffle, vocabulary-sized)
    fans out to its substrings (linear in characters, no corpus-wide state),
    one count shuffle keyed on (form, piece), and a bounded ``LIMIT`` — the
    vocab that comes back to the driver is tokenizer METADATA (like
    ``tok_bpe_merges``' merge list), never data."""
    # Materialize the word-TYPE table once (r10, guide §3.3/§5): every
    # consumer — the substring count + its collect, the char-inventory
    # collect, and each caller's encode pass(es) — referenced this subtree
    # and Catalyst re-ran the corpus scan + word explode + groupBy per
    # reference (3× inside this helper alone, up to 7× in tok_vocab_prune).
    # The table is vocabulary-sized (word TYPES, not occurrences), so the
    # checkpoint is bounded at any corpus scale.
    wt = (
        _docs(spark, sf)
        .select(F.explode(words("text")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=False)
    )
    # all substrings of length 2..WP_MAXP with their word position; guard the
    # sequence bound (Spark's sequence(1, 0) counts DOWN) with a CASE
    subs = wt.select(
        "cnt",
        F.explode(
            F.expr(
                f"""flatten(transform(sequence(2, {WP_MAXP}), k ->
                      CASE WHEN length(w) >= k THEN
                        transform(sequence(1, length(w) - k + 1), i ->
                          struct(CASE WHEN i = 1 THEN 's' ELSE 'c' END AS form,
                                 substring(w, i, k) AS piece))
                      ELSE array() END))"""
            )
        ).alias("s"),
    ).select("cnt", F.col("s.form").alias("form"), F.col("s.piece").alias("piece"))
    top = (
        subs.groupBy("form", "piece")
        .agg(F.sum("cnt").alias("c"))
        .orderBy(F.desc("c"), F.asc("form"), F.asc("piece"))
        .limit(WP_TOP)
        .collect()
    )
    chars = [
        r["ch"]
        for r in wt.select(
            F.explode(
                F.expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))")
            ).alias("ch")
        )
        .distinct()
        .collect()
    ]
    starts = {r["piece"] for r in top if r["form"] == "s"} | set(chars)
    conts = {r["piece"] for r in top if r["form"] == "c"} | set(chars)
    to_list = lambda ps: sorted(((len(p), p) for p in ps))  # noqa: E731
    return to_list(starts), to_list(conts), wt


def _piece_arr(pieces: list) -> Column:
    return F.array(
        *[
            F.struct(F.lit(ln).cast("int").alias("len"), F.lit(p).alias("piece"))
            for ln, p in pieces
        ]
    )


def wordpiece_encode_words(wt: DataFrame, starts: list, conts: list) -> DataFrame:
    """Append ``toks`` (the WordPiece segmentation, continuation pieces
    rendered ``##piece``) to a word-type DataFrame with a ``w`` column.

    The segmentation is ONE ``aggregate`` fold per word type: the accumulator
    carries (cursor, tokens); each step at the cursor picks the LONGEST vocab
    piece matching there (``array_max`` over the filtered piece table — the
    struct's leading ``len`` field makes max = longest) and advances the
    cursor past it. Both piece tables are broadcast literals and the fold is
    whole-stage codegen — no shuffle, no Python, per-row work O(len × vocab)."""
    s_arr, c_arr = _piece_arr(starts), _piece_arr(conts)

    def step(acc: Column, i: Column) -> Column:
        tbl = F.when(acc["pos"] == 1, s_arr).otherwise(c_arr)
        hits = F.filter(
            tbl, lambda s: F.col("w").substr(acc["pos"], s["len"]) == s["piece"]
        )
        best = F.array_max(hits)
        shown = F.when(acc["pos"] == 1, best["piece"]).otherwise(
            F.concat(F.lit("##"), best["piece"])
        )
        advanced = F.struct(
            (acc["pos"] + best["len"]).cast("int").alias("pos"),
            F.concat(acc["toks"], F.array(shown)).alias("toks"),
        )
        return F.when(i < acc["pos"], acc).otherwise(advanced)

    init = F.struct(
        F.lit(1).cast("int").alias("pos"),
        F.array().cast("array<string>").alias("toks"),
    )
    return wt.withColumn(
        "toks",
        F.aggregate(F.sequence(F.lit(1), F.length("w")), init, step)["toks"],
    )


def tok_wordpiece_encode(spark: SparkSession, sf: str) -> DataFrame:
    """WordPiece greedy longest-match-first encoding of the corpus against a
    corpus-derived subword vocab: per token, its total occurrence count
    (weighted by word frequency) and the number of distinct word types it
    appears in — ordered (occurrences DESC, token).

    Distributed shape: the vocab build is one word-type shuffle plus one
    bounded count shuffle (``_wp_vocab``); the encode itself is the
    ``wordpiece_encode_words`` codegen fold over word TYPES (not documents),
    so at 100 TB the only shuffles are the type groupBy and the final token
    aggregation — the piece tables travel as broadcast literals."""
    starts, conts, wt = _wp_vocab(spark, sf)
    return (
        wordpiece_encode_words(wt, starts, conts)
        .select("w", "cnt", F.explode("toks").alias("token"))
        .groupBy("token")
        .agg(
            F.sum("cnt").cast("long").alias("occurrences"),
            F.countDistinct("w").cast("long").alias("word_types"),
        )
        .orderBy(F.desc("occurrences"), F.asc("token"))
        .limit(WP_OUT)
    )


def _wordpiece_oracle() -> str:
    """The full WordPiece pipeline as one DuckDB statement: vocab selection
    (same counts, same (c DESC, form, piece) tie-break), the longest-match
    table ``bm`` for every (word, position), a RECURSIVE cursor walk that
    replays greedy matching, and the final token aggregation."""
    return f"""
WITH RECURSIVE wt AS (
  SELECT w, count(*)::BIGINT AS cnt FROM (
    SELECT unnest(list_filter(str_split(trim(text), ' '), x -> x <> '')) AS w
    FROM documents) GROUP BY w
), subs AS (
  SELECT CASE WHEN i = 1 THEN 's' ELSE 'c' END AS form,
         substr(w, i, k) AS piece, sum(cnt)::BIGINT AS c
  FROM wt,
       (SELECT unnest(generate_series(2, {WP_MAXP})) AS k) ks,
       LATERAL (SELECT unnest(generate_series(1, length(w) - k + 1)) AS i)
  GROUP BY 1, 2
), topn AS (
  SELECT form, piece FROM subs ORDER BY c DESC, form ASC, piece ASC LIMIT {WP_TOP}
), chars AS (
  SELECT DISTINCT substr(w, i, 1) AS piece
  FROM wt, LATERAL (SELECT unnest(generate_series(1, length(w))) AS i)
), vocab AS (
  SELECT form, piece, length(piece) AS len FROM (
    SELECT form, piece FROM topn
    UNION SELECT 's', piece FROM chars
    UNION SELECT 'c', piece FROM chars)
), pos AS (
  SELECT w, i AS pos FROM wt, LATERAL (SELECT unnest(generate_series(1, length(w))) AS i)
), bm AS (
  SELECT w, pos, piece, len, form FROM (
    SELECT p.w, p.pos, v.piece, v.len, v.form,
           row_number() OVER (PARTITION BY p.w, p.pos ORDER BY v.len DESC) AS rk
    FROM pos p JOIN vocab v
      ON v.form = CASE WHEN p.pos = 1 THEN 's' ELSE 'c' END
     AND substr(p.w, p.pos, v.len) = v.piece)
  WHERE rk = 1
), walk AS (
  SELECT w, cnt, 1 AS pos FROM wt
  UNION ALL
  SELECT k.w, k.cnt, k.pos + b.len
  FROM walk k JOIN bm b ON b.w = k.w AND b.pos = k.pos
  WHERE k.pos <= length(k.w)
), toks AS (
  SELECT k.w, k.cnt,
         CASE WHEN b.form = 's' THEN b.piece ELSE '##' || b.piece END AS token
  FROM walk k JOIN bm b ON b.w = k.w AND b.pos = k.pos
)
SELECT token, sum(cnt)::BIGINT AS occurrences, count(DISTINCT w)::BIGINT AS word_types
FROM toks GROUP BY token ORDER BY occurrences DESC, token LIMIT {WP_OUT}
"""


TOK_WORDPIECE_ORACLE = _wordpiece_oracle()


#: multi-char pieces kept by the prune pass (single chars always survive —
#: the coverage floor). The corpus' greedy segmentation uses ~17 multi-char
#: pieces, so keeping 8 makes the prune REAL: ~half the in-use inventory
#: drops and its usage mass redistributes to shorter survivors.
VP_KEEP = 8


def tok_vocab_prune(spark: SparkSession, sf: str) -> DataFrame:
    """Tokenizer vocabulary-pruning iteration — the SentencePiece/unigram
    trainer's prune step (Kudo 2018, arXiv:1804.10959 §3.2: grow a candidate
    vocab, measure usage under the current segmentation, drop the weakest
    pieces, re-segment) expressed with the greedy longest-match segmenter and
    pure integer statistics, so the round is value-exact cross-engine:

    - round 1: encode the word-type table against the full WordPiece vocab
      (``_wp_vocab``) and count per-token usage (word-frequency weighted);
    - prune: keep the top ``VP_KEEP`` multi-char tokens by (usage DESC,
      token ASC); single-char pieces always survive — coverage never breaks;
    - round 2: re-encode against the pruned vocab and recount. Usage mass
      REDISTRIBUTES deterministically: a dropped piece's positions fall to
      shorter survivors, so round-2 counts of survivors only grow.

    Output: per token, round-1 and round-2 usage (0 where absent), ordered
    (occ1 DESC, occ2 DESC, token) LIMIT {WP_OUT} — the trainer's
    before/after prune ledger.

    Distributed shape: both encodes are the ``wordpiece_encode_words``
    codegen fold over word TYPES with broadcast piece literals; the prune
    decision collects only the bounded top-K usage rows (tokenizer METADATA,
    like the vocab itself). The only shuffles at any scale are the type
    groupBy and the two token aggregations."""
    starts, conts, wt = _wp_vocab(spark, sf)

    def usage(st, co):
        return (
            wordpiece_encode_words(wt, st, co)
            .select("cnt", F.explode("toks").alias("token"))
            .groupBy("token")
            .agg(F.sum("cnt").cast("long").alias("occ"))
        )

    # u1 feeds the prune decision AND the final before/after join — checkpoint
    # once (bounded: one row per vocab token) so the round-1 encode fold runs
    # once, not three times (r10, same pattern as dedup_sketch_calibration)
    u1 = usage(starts, conts).localCheckpoint(eager=False)
    keep = (
        u1.filter(
            F.when(
                F.col("token").startswith("##"),
                F.length("token") > 3,  # '##' + ≥2 chars
            ).otherwise(F.length("token") > 1)
        )
        .orderBy(F.desc("occ"), F.asc("token"))
        .limit(VP_KEEP)
        .collect()
    )
    surv_start = {r["token"] for r in keep if not r["token"].startswith("##")}
    surv_cont = {r["token"][2:] for r in keep if r["token"].startswith("##")}
    chars = {p for ln, p in starts if ln == 1}
    to_list = lambda ps: sorted(((len(p), p) for p in ps))  # noqa: E731
    u2 = usage(to_list(surv_start | chars), to_list(surv_cont | chars))
    return (
        u1.select("token", F.col("occ").alias("occ_before"))
        .join(u2.select("token", F.col("occ").alias("occ_after")), "token", "full_outer")
        .select(
            "token",
            F.coalesce("occ_before", F.lit(0)).cast("long").alias("occ_before"),
            F.coalesce("occ_after", F.lit(0)).cast("long").alias("occ_after"),
        )
        .orderBy(F.desc("occ_before"), F.desc("occ_after"), F.asc("token"))
        .limit(WP_OUT)
    )


def _vocab_prune_oracle() -> str:
    """Both segmentation rounds as one DuckDB statement: the round-1 walk is
    the WordPiece oracle's; the pruned vocab derives relationally from the
    round-1 usage (same (occ DESC, token) top-K, single chars unioned back);
    the round-2 walk replays greedy matching against it."""
    return f"""
WITH RECURSIVE wt AS (
  SELECT w, count(*)::BIGINT AS cnt FROM (
    SELECT unnest(list_filter(str_split(trim(text), ' '), x -> x <> '')) AS w
    FROM documents) GROUP BY w
), subs AS (
  SELECT CASE WHEN i = 1 THEN 's' ELSE 'c' END AS form,
         substr(w, i, k) AS piece, sum(cnt)::BIGINT AS c
  FROM wt,
       (SELECT unnest(generate_series(2, {WP_MAXP})) AS k) ks,
       LATERAL (SELECT unnest(generate_series(1, length(w) - k + 1)) AS i)
  GROUP BY 1, 2
), topn AS (
  SELECT form, piece FROM subs ORDER BY c DESC, form ASC, piece ASC LIMIT {WP_TOP}
), chars AS (
  SELECT DISTINCT substr(w, i, 1) AS piece
  FROM wt, LATERAL (SELECT unnest(generate_series(1, length(w))) AS i)
), vocab AS (
  SELECT form, piece, length(piece) AS len FROM (
    SELECT form, piece FROM topn
    UNION SELECT 's', piece FROM chars
    UNION SELECT 'c', piece FROM chars)
), pos AS (
  SELECT w, i AS pos FROM wt, LATERAL (SELECT unnest(generate_series(1, length(w))) AS i)
), bm AS (
  SELECT w, pos, piece, len, form FROM (
    SELECT p.w, p.pos, v.piece, v.len, v.form,
           row_number() OVER (PARTITION BY p.w, p.pos ORDER BY v.len DESC) AS rk
    FROM pos p JOIN vocab v
      ON v.form = CASE WHEN p.pos = 1 THEN 's' ELSE 'c' END
     AND substr(p.w, p.pos, v.len) = v.piece)
  WHERE rk = 1
), walk AS (
  SELECT w, cnt, 1 AS pos FROM wt
  UNION ALL
  SELECT k.w, k.cnt, k.pos + b.len
  FROM walk k JOIN bm b ON b.w = k.w AND b.pos = k.pos
  WHERE k.pos <= length(k.w)
), u1 AS (
  SELECT CASE WHEN b.form = 's' THEN b.piece ELSE '##' || b.piece END AS token,
         sum(k.cnt)::BIGINT AS occ
  FROM walk k JOIN bm b ON b.w = k.w AND b.pos = k.pos
  GROUP BY 1
), kept AS (
  SELECT token FROM u1
  WHERE CASE WHEN token LIKE '##%' THEN length(token) > 3 ELSE length(token) > 1 END
  ORDER BY occ DESC, token ASC LIMIT {VP_KEEP}
), vocab2 AS (
  SELECT form, piece, length(piece) AS len FROM (
    SELECT CASE WHEN token LIKE '##%' THEN 'c' ELSE 's' END AS form,
           CASE WHEN token LIKE '##%' THEN substr(token, 3) ELSE token END AS piece
    FROM kept
    UNION SELECT 's', piece FROM chars
    UNION SELECT 'c', piece FROM chars)
), bm2 AS (
  SELECT w, pos, piece, len, form FROM (
    SELECT p.w, p.pos, v.piece, v.len, v.form,
           row_number() OVER (PARTITION BY p.w, p.pos ORDER BY v.len DESC) AS rk
    FROM pos p JOIN vocab2 v
      ON v.form = CASE WHEN p.pos = 1 THEN 's' ELSE 'c' END
     AND substr(p.w, p.pos, v.len) = v.piece)
  WHERE rk = 1
), walk2 AS (
  SELECT w, cnt, 1 AS pos FROM wt
  UNION ALL
  SELECT k.w, k.cnt, k.pos + b.len
  FROM walk2 k JOIN bm2 b ON b.w = k.w AND b.pos = k.pos
  WHERE k.pos <= length(k.w)
), u2 AS (
  SELECT CASE WHEN b.form = 's' THEN b.piece ELSE '##' || b.piece END AS token,
         sum(k.cnt)::BIGINT AS occ
  FROM walk2 k JOIN bm2 b ON b.w = k.w AND b.pos = k.pos
  GROUP BY 1
)
SELECT coalesce(u1.token, u2.token) AS token,
       coalesce(u1.occ, 0)::BIGINT AS occ_before,
       coalesce(u2.occ, 0)::BIGINT AS occ_after
FROM u1 FULL OUTER JOIN u2 ON u1.token = u2.token
ORDER BY occ_before DESC, occ_after DESC, token ASC LIMIT {WP_OUT}
"""


TOK_VOCAB_PRUNE_ORACLE = _vocab_prune_oracle()


# ---------------------------------------------------------------------------
# Corpus drift: token-distribution divergence between slices
# ---------------------------------------------------------------------------

#: drift slice selector and output depth. The reference slice is the corpus
#: majority language; the drift statistic is the per-token usage-rate gap in
#: parts-per-million — pure integer arithmetic (ppm = 1e6·count DIV total),
#: so the row hashes exactly and, unlike a cA·NB cross product, never
#: overflows BIGINT however large the corpus grows.
DRIFT_REF_LANG = "en"
DRIFT_TOP = 30


def corpus_token_drift(spark: SparkSession, sf: str) -> DataFrame:
    """Token-distribution drift between a reference corpus slice and the
    rest — the monitoring primitive behind contamination alerts, crawl-drift
    dashboards, and mixture re-weighting: which tokens are most over/under-
    represented in slice B relative to slice A, by usage-rate gap in ppm.

    Shape: ONE corpus-scale shuffle (token groupBy with conditional sums for
    both slices at once), a 1-row totals aggregate broadcast back, and a
    bounded top-K. No per-slice scans, no joins between slice tables — the
    slices travel as two columns of the same aggregation."""
    toks = _docs(spark, sf).select(
        "lang", F.explode(words("text")).alias("w")
    )
    is_ref = F.col("lang") == DRIFT_REF_LANG
    per_tok = toks.groupBy("w").agg(
        F.sum(F.when(is_ref, 1).otherwise(0)).cast("long").alias("c_ref"),
        F.sum(F.when(is_ref, 0).otherwise(1)).cast("long").alias("c_rest"),
    )
    totals = per_tok.agg(
        F.sum("c_ref").alias("n_ref"), F.sum("c_rest").alias("n_rest")
    )
    return (
        per_tok.crossJoin(F.broadcast(totals))
        .select(
            F.col("w").alias("token"),
            "c_ref",
            "c_rest",
            F.expr("(1000000 * c_ref) DIV n_ref").alias("ppm_ref"),
            F.expr("(1000000 * c_rest) DIV n_rest").alias("ppm_rest"),
            F.abs(
                F.expr("(1000000 * c_ref) DIV n_ref")
                - F.expr("(1000000 * c_rest) DIV n_rest")
            ).alias("ppm_drift"),
        )
        .orderBy(F.desc("ppm_drift"), F.asc("token"))
        .limit(DRIFT_TOP)
    )


CORPUS_DRIFT_ORACLE = f"""
WITH toks AS (
  SELECT lang, unnest(list_filter(str_split(trim(text), ' '), x -> x <> '')) AS w
  FROM documents
), per_tok AS (
  SELECT w,
         sum(CASE WHEN lang = '{DRIFT_REF_LANG}' THEN 1 ELSE 0 END)::BIGINT AS c_ref,
         sum(CASE WHEN lang = '{DRIFT_REF_LANG}' THEN 0 ELSE 1 END)::BIGINT AS c_rest
  FROM toks GROUP BY w
), totals AS (
  SELECT sum(c_ref) AS n_ref, sum(c_rest) AS n_rest FROM per_tok
)
SELECT w AS token, c_ref, c_rest,
       ((1000000 * c_ref) // n_ref)::BIGINT AS ppm_ref,
       ((1000000 * c_rest) // n_rest)::BIGINT AS ppm_rest,
       abs((1000000 * c_ref) // n_ref - (1000000 * c_rest) // n_rest)::BIGINT AS ppm_drift
FROM per_tok, totals
ORDER BY ppm_drift DESC, token ASC
LIMIT {DRIFT_TOP}
"""


SPECS: list[QuerySpec] = [
    QuerySpec(
        "text_gopher_filter",
        text_gopher_filter,
        TEXT_GOPHER_ORACLE,
        "LLM:gopher-rule-filter",
    ),
    QuerySpec(
        "sim_range_search",
        sim_range_search,
        SIM_RANGE_ORACLE,
        "LLM:radius-similarity-search",
    ),
    QuerySpec(
        "tok_wordpiece_encode",
        tok_wordpiece_encode,
        TOK_WORDPIECE_ORACLE,
        "LLM:wordpiece-tokenizer",
    ),
    QuerySpec(
        "tok_vocab_prune",
        tok_vocab_prune,
        TOK_VOCAB_PRUNE_ORACLE,
        "LLM:tokenizer vocabulary-pruning iteration (unigram-trainer prune step)",
    ),
    QuerySpec(
        "corpus_token_drift",
        corpus_token_drift,
        CORPUS_DRIFT_ORACLE,
        "LLM:corpus-drift-monitor",
    ),
]
