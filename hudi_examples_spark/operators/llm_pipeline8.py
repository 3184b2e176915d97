"""Eighth LLM-pipeline battery: exact duplicated-passage detection — the
substring-level dedup family (Lee et al. 2022, "Deduplicating Training Data
Makes Language Models Better", arXiv:2107.06499).

Document-level dedup (exact hash, MinHash/SimHash near-dup, SemDeDup) misses
the dominant contamination mode at corpus scale: long passages copied
verbatim BETWEEN otherwise-distinct documents (boilerplate, licenses, quoted
articles). The canonical tool is a corpus-wide suffix array; the distributed
re-expression is token-window fingerprinting — every length-W token window is
hashed, windows whose hash occurs in ≥2 distinct documents are duplicate
evidence, and per document the overlapping duplicate windows merge into
maximal duplicated spans (the suffix-array "repeated substring ≥ W tokens"
set, found with one groupBy instead of a global sort).

- ``dedup_substring_spans`` — the span inventory: per (doc, span) the token
  range whose every W-window also appears in some other document.
- ``dedup_substring_removal`` — the Lee et al. removal accounting: per doc,
  how many tokens sit inside duplicated spans, what remains after cutting
  them, and whether the document is fully duplicated (pure boilerplate).
- ``pipe_substring_decontaminate`` — the cross-corpus variant: maximal train
  spans whose exact token sequence appears anywhere in the EVAL slice
  (broadcast eval window-hash set; the eval-contamination analog).

Scale shape (100 TB stance): tokenize → per-doc window hashes is map-side
linear; ONE shuffle groups window hashes (O(total tokens), the same cost
minhash pays for shingles); the duplicated-hash set joins back by hash
equi-join (fanout = duplicate windows only); span merging is a per-doc
window function (keyed exchange on doc_id). No all-pairs step anywhere, no
suffix array to materialize, nothing collects to the driver. md5 (not
xxhash64) keeps the oracle cross-engine, as in ``fp_winnowing``.

Reference analogue: the reference ships document-level dedup only (its Glue
pipelines key on record identity — e.g.
``glue/S3 Calls benchmarking Code.py`` groups whole records); passage-level
dedup is the beyond-reference training-data requirement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hudi_examples_spark.functions.text import words
from hudi_examples_spark.operators.llm_pipeline5 import EVAL_MOD, _docs
from hudi_examples_spark.operators.spec import QuerySpec
from hudi_examples_spark.sources.readers import load_sf_table as t

#: Window width in tokens. Lee et al. use 50-token windows at corpus scale;
#: the test corpus' documents run ~30 tokens, so the battery fixes W=6 —
#: same machinery, every doc long enough to carry windows. W only changes
#: the gram arity, never the plan shape.
SPAN_W = 6


def _win_hashes(spark: SparkSession, sf: str) -> DataFrame:
    """(doc_id, start, h): md5 of every W-token window of every document.
    ``start`` is 1-based. Shared projection under the whole substring family
    (cross-doc spans, self-dedup, eval-set contamination) — one map-side pass,
    no shuffle."""
    d = _docs(spark, sf).select("doc_id", words("text").alias("__ws"))
    # guard: sequence(1, 0) is DESCENDING in Spark ([1, 0]) — docs shorter
    # than W must produce an empty index array, not out-of-bounds probes
    n_wins = F.size("__ws") - (SPAN_W - 1)
    idx = F.when(n_wins >= 1, F.sequence(F.lit(1), n_wins)).otherwise(
        F.array().cast("array<int>")
    )
    return d.select(
        "doc_id",
        F.posexplode(
            F.transform(
                idx,
                lambda i: F.md5(
                    F.concat_ws(
                        " ", *[F.element_at("__ws", i + k) for k in range(SPAN_W)]
                    )
                ),
            )
        ).alias("p", "h"),
    ).select("doc_id", (F.col("p") + 1).alias("start"), "h")


def _dup_windows(spark: SparkSession, sf: str) -> DataFrame:
    """(doc_id, start, e): every W-token window whose exact token sequence
    appears in at least 2 distinct documents. ``start`` is 1-based, ``e``
    inclusive."""
    wins = _win_hashes(spark, sf)
    dup = (
        wins.groupBy("h")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("h")
    )
    return wins.join(dup, "h").select(
        "doc_id", "start", (F.col("start") + (SPAN_W - 1)).alias("e")
    )


def _merged_spans(dw: DataFrame) -> DataFrame:
    """Merge overlapping/adjacent duplicate windows into maximal spans
    (interval union as a gaps-and-islands window pass, keyed on doc_id)."""
    w_prev = Window.partitionBy("doc_id").orderBy("start").rowsBetween(
        Window.unboundedPreceding, -1
    )
    prev_end = F.max("e").over(w_prev)
    flagged = dw.withColumn(
        "nf",
        F.when(prev_end.isNull() | (F.col("start") > prev_end + 1), 1).otherwise(0),
    )
    w_run = Window.partitionBy("doc_id").orderBy("start")
    islands = flagged.withColumn("isl", F.sum("nf").over(w_run))
    return islands.groupBy("doc_id", "isl").agg(
        F.min("start").cast("long").alias("span_start"),
        F.max("e").cast("long").alias("span_end"),
        (F.max("e") - F.min("start") + 1).cast("long").alias("span_len"),
        F.count(F.lit(1)).cast("long").alias("n_windows"),
    )


def dedup_substring_spans(spark: SparkSession, sf: str) -> DataFrame:
    """Maximal cross-document duplicated token spans per document."""
    return (
        _merged_spans(_dup_windows(spark, sf))
        .select("doc_id", "span_start", "span_end", "span_len", "n_windows")
        .orderBy("doc_id", "span_start")
    )


#: Shared CTE prefix: windows → duplicated windows → merged islands.
_SPANS_CTE = f"""
WITH ws AS (
  SELECT doc_id, list_filter(str_split(trim(text), ' '), w -> w <> '') AS w
  FROM documents
), wins AS (
  SELECT doc_id, i AS start,
         md5({" || ' ' || ".join(f"w[i+{k}]" for k in range(SPAN_W))}) AS h
  FROM (SELECT doc_id, w,
               unnest(generate_series(1, greatest(len(w) - {SPAN_W - 1}, 0))) AS i
        FROM ws)
), dup AS (
  SELECT h FROM wins GROUP BY h HAVING count(DISTINCT doc_id) >= 2
), dw AS (
  SELECT doc_id, start, start + {SPAN_W - 1} AS e FROM wins JOIN dup USING (h)
), flagged AS (
  SELECT doc_id, start, e,
         CASE WHEN max(e) OVER (PARTITION BY doc_id ORDER BY start
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
              OR start > max(e) OVER (PARTITION BY doc_id ORDER BY start
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + 1
         THEN 1 ELSE 0 END AS nf
  FROM dw
), islands AS (
  SELECT doc_id, start, e,
         sum(nf) OVER (PARTITION BY doc_id ORDER BY start
                       ROWS UNBOUNDED PRECEDING) AS isl
  FROM flagged
), spans AS (
  SELECT doc_id, min(start)::BIGINT AS span_start, max(e)::BIGINT AS span_end,
         (max(e) - min(start) + 1)::BIGINT AS span_len,
         count(*)::BIGINT AS n_windows
  FROM islands GROUP BY doc_id, isl
)
"""

DEDUP_SUBSTRING_SPANS_ORACLE = (
    _SPANS_CTE
    + """
SELECT doc_id, span_start, span_end, span_len, n_windows
FROM spans ORDER BY doc_id, span_start
"""
)


def dedup_substring_removal(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document removal accounting after cutting duplicated spans.

    Every document appears (docs shorter than W tokens carry no windows and
    are never flagged — they keep all tokens). ``fully_dup`` = 1 marks pure
    boilerplate documents whose whole token stream is duplicated elsewhere —
    the removal set of Lee et al.'s ExactSubstr dedup."""
    n_tok = _docs(spark, sf).select(
        "doc_id", F.size(words("text")).cast("long").alias("n_tokens")
    )
    per_doc = (
        _merged_spans(_dup_windows(spark, sf))
        .groupBy("doc_id")
        .agg(F.sum("span_len").alias("dup_tokens"))
    )
    return (
        n_tok.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("dup_tokens", F.lit(0)).cast("long").alias("dup_tokens"),
            (F.col("n_tokens") - F.coalesce("dup_tokens", F.lit(0)))
            .cast("long")
            .alias("kept_tokens"),
            F.when(F.coalesce("dup_tokens", F.lit(0)) == F.col("n_tokens"), 1)
            .otherwise(0)
            .cast("long")
            .alias("fully_dup"),
        )
        .orderBy("doc_id")
    )


DEDUP_SUBSTRING_REMOVAL_ORACLE = (
    _SPANS_CTE
    + """
, per_doc AS (
  SELECT doc_id, sum(span_len) AS dup_tokens FROM spans GROUP BY doc_id
), n_tok AS (
  SELECT doc_id, len(w)::BIGINT AS n_tokens FROM ws
)
SELECT n.doc_id, n.n_tokens,
       coalesce(p.dup_tokens, 0)::BIGINT AS dup_tokens,
       (n.n_tokens - coalesce(p.dup_tokens, 0))::BIGINT AS kept_tokens,
       (CASE WHEN coalesce(p.dup_tokens, 0) = n.n_tokens THEN 1 ELSE 0 END)::BIGINT
         AS fully_dup
FROM n_tok n LEFT JOIN per_doc p USING (doc_id)
ORDER BY n.doc_id
"""
)


def pipe_self_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """WITHIN-document repeated-span removal accounting — the intra-doc
    complement of ``dedup_substring_removal`` (crawl text repeats its own
    boilerplate: nav bars, footers, templated paragraphs; Lee et al. 2022
    report intra-doc repeats as a major duplicate class).

    A W-token window is a self-repeat when the same token sequence already
    occurred EARLIER in the same document (first occurrence kept); repeat
    windows merge into maximal spans via the shared islands machinery and
    are accounted per document. Plan: per-doc window hashes (one projection,
    no corpus-wide state), a (doc_id, hash) window min for first-occurrence
    detection — the shuffle key carries doc_id, so skew is bounded by the
    longest DOCUMENT, never the corpus — then the islands merge. Everything
    is per-document; at 100 TB this is embarrassingly parallel."""
    wins = _win_hashes(spark, sf)
    w_h = Window.partitionBy("doc_id", "h")
    repeats = (
        wins.withColumn("first_start", F.min("start").over(w_h))
        .filter(F.col("start") > F.col("first_start"))
        .select("doc_id", "start", (F.col("start") + (SPAN_W - 1)).alias("e"))
    )
    per_doc = (
        _merged_spans(repeats)
        .groupBy("doc_id")
        .agg(
            F.sum("span_len").alias("repeat_tokens"),
            F.count(F.lit(1)).alias("n_repeat_spans"),
        )
    )
    n_tok = _docs(spark, sf).select(
        "doc_id", F.size(words("text")).cast("long").alias("n_tokens")
    )
    return (
        n_tok.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("repeat_tokens", F.lit(0)).cast("long").alias("repeat_tokens"),
            (F.col("n_tokens") - F.coalesce("repeat_tokens", F.lit(0)))
            .cast("long")
            .alias("kept_tokens"),
            F.coalesce("n_repeat_spans", F.lit(0)).cast("long").alias("n_repeat_spans"),
        )
        .orderBy("doc_id")
    )


PIPE_SELF_DEDUP_ORACLE = f"""
WITH ws AS (
  SELECT doc_id, list_filter(str_split(trim(text), ' '), w -> w <> '') AS w
  FROM documents
), wins AS (
  SELECT doc_id, i AS start,
         md5({" || ' ' || ".join(f"w[i+{k}]" for k in range(SPAN_W))}) AS h
  FROM (SELECT doc_id, w,
               unnest(generate_series(1, greatest(len(w) - {SPAN_W - 1}, 0))) AS i
        FROM ws)
), rep AS (
  SELECT doc_id, start, start + {SPAN_W - 1} AS e
  FROM (SELECT doc_id, start, h,
               min(start) OVER (PARTITION BY doc_id, h) AS first_start
        FROM wins)
  WHERE start > first_start
), flagged AS (
  SELECT doc_id, start, e,
         CASE WHEN max(e) OVER (PARTITION BY doc_id ORDER BY start
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
              OR start > max(e) OVER (PARTITION BY doc_id ORDER BY start
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + 1
         THEN 1 ELSE 0 END AS nf
  FROM rep
), islands AS (
  SELECT doc_id, start, e,
         sum(nf) OVER (PARTITION BY doc_id ORDER BY start
                       ROWS UNBOUNDED PRECEDING) AS isl
  FROM flagged
), spans AS (
  SELECT doc_id, max(e) - min(start) + 1 AS span_len
  FROM islands GROUP BY doc_id, isl
), per_doc AS (
  SELECT doc_id, sum(span_len) AS repeat_tokens, count(*) AS n_repeat_spans
  FROM spans GROUP BY doc_id
), n_tok AS (
  SELECT doc_id, len(w)::BIGINT AS n_tokens FROM ws
)
SELECT n.doc_id, n.n_tokens,
       coalesce(p.repeat_tokens, 0)::BIGINT AS repeat_tokens,
       (n.n_tokens - coalesce(p.repeat_tokens, 0))::BIGINT AS kept_tokens,
       coalesce(p.n_repeat_spans, 0)::BIGINT AS n_repeat_spans
FROM n_tok n LEFT JOIN per_doc p USING (doc_id)
ORDER BY n.doc_id
"""


def pipe_substring_decontaminate(spark: SparkSession, sf: str) -> DataFrame:
    """Cross-corpus exact-substring decontamination — the contamination analog
    of Lee et al.'s ExactSubstr dedup: flag every ≥W-token span of a TRAIN
    document whose exact token sequence also appears in the EVAL slice
    (doc_id % EVAL_MOD == 0, same held-out definition as ``pipe_decontaminate``
    / ``dedup_cross_corpus``). Where ``pipe_decontaminate`` counts 3-gram
    overlaps, this recovers the maximal verbatim shared substrings — the
    "eval answer pasted into a training page" contamination mode that n-gram
    counting can't localize.

    Output is the removal accounting per train document: total tokens, tokens
    inside eval-shared spans, what remains after cutting them, and the span
    count (0-span docs kept — a training page must prove itself clean).

    Scale shape (100 TB): train windows are one map-side projection
    (``_win_hashes``); the eval slice's window-hash set is tiny and BROADCAST
    into a left-semi probe — the train side never shuffles on text (at real
    scale: the same plan with a bloom-filter pushdown when eval outgrows the
    broadcast threshold). The only train-scale shuffle is the per-doc islands
    merge, keyed on doc_id (skew bounded by the longest document). No
    suffix array, no all-pairs, nothing at the driver.

    Reference analogue: none — the reference dedups whole records only
    (glue/S3 Calls benchmarking Code.py groups record identity); passage-level
    eval decontamination is the beyond-reference training-data requirement.
    """
    wins = _win_hashes(spark, sf)
    ev = F.broadcast(
        wins.filter(F.col("doc_id") % EVAL_MOD == 0).select("h").distinct()
    )
    contam = (
        wins.filter(F.col("doc_id") % EVAL_MOD != 0)
        .join(ev, "h", "left_semi")
        .select("doc_id", "start", (F.col("start") + (SPAN_W - 1)).alias("e"))
    )
    per_doc = (
        _merged_spans(contam)
        .groupBy("doc_id")
        .agg(
            F.sum("span_len").alias("contaminated_tokens"),
            F.count(F.lit(1)).alias("n_contam_spans"),
        )
    )
    n_tok = (
        _docs(spark, sf)
        .filter(F.col("doc_id") % EVAL_MOD != 0)
        .select("doc_id", F.size(words("text")).cast("long").alias("n_tokens"))
    )
    return (
        n_tok.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("contaminated_tokens", F.lit(0))
            .cast("long")
            .alias("contaminated_tokens"),
            (F.col("n_tokens") - F.coalesce("contaminated_tokens", F.lit(0)))
            .cast("long")
            .alias("kept_tokens"),
            F.coalesce("n_contam_spans", F.lit(0)).cast("long").alias("n_contam_spans"),
        )
        .orderBy("doc_id")
    )


PIPE_SUBSTRING_DECONTAMINATE_ORACLE = f"""
WITH ws AS (
  SELECT doc_id, list_filter(str_split(trim(text), ' '), w -> w <> '') AS w
  FROM documents
), wins AS (
  SELECT doc_id, i AS start,
         md5({" || ' ' || ".join(f"w[i+{k}]" for k in range(SPAN_W))}) AS h
  FROM (SELECT doc_id, w,
               unnest(generate_series(1, greatest(len(w) - {SPAN_W - 1}, 0))) AS i
        FROM ws)
), ev AS (
  SELECT DISTINCT h FROM wins WHERE doc_id % {EVAL_MOD} = 0
), dw AS (
  SELECT DISTINCT w.doc_id, w.start, w.start + {SPAN_W - 1} AS e
  FROM wins w JOIN ev USING (h)
  WHERE w.doc_id % {EVAL_MOD} <> 0
), flagged AS (
  SELECT doc_id, start, e,
         CASE WHEN max(e) OVER (PARTITION BY doc_id ORDER BY start
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
              OR start > max(e) OVER (PARTITION BY doc_id ORDER BY start
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + 1
         THEN 1 ELSE 0 END AS nf
  FROM dw
), islands AS (
  SELECT doc_id, start, e,
         sum(nf) OVER (PARTITION BY doc_id ORDER BY start
                       ROWS UNBOUNDED PRECEDING) AS isl
  FROM flagged
), spans AS (
  SELECT doc_id, max(e) - min(start) + 1 AS span_len
  FROM islands GROUP BY doc_id, isl
), per_doc AS (
  SELECT doc_id, sum(span_len) AS contaminated_tokens, count(*) AS n_contam_spans
  FROM spans GROUP BY doc_id
), n_tok AS (
  SELECT doc_id, len(w)::BIGINT AS n_tokens FROM ws WHERE doc_id % {EVAL_MOD} <> 0
)
SELECT n.doc_id, n.n_tokens,
       coalesce(p.contaminated_tokens, 0)::BIGINT AS contaminated_tokens,
       (n.n_tokens - coalesce(p.contaminated_tokens, 0))::BIGINT AS kept_tokens,
       coalesce(p.n_contam_spans, 0)::BIGINT AS n_contam_spans
FROM n_tok n LEFT JOIN per_doc p USING (doc_id)
ORDER BY n.doc_id
"""


# ---------------------------------------------------------------------------
# Distributed BPE merge training (Sennrich et al. 2016, arXiv:1508.07909)
# ---------------------------------------------------------------------------

#: merge rounds the battery runs. Real tokenizer training runs 30k-100k
#: rounds over the same per-round plan; R only bounds the driver loop, never
#: the distributed shape.
BPE_ROUNDS = 4


#: adjacent symbol pairs of a ``syms`` array column, as struct(s, nxt) —
#: empty for 0/1-symbol words (CASE guards sequence()'s no-empty-range rule)
_ADJ_PAIRS = """
  CASE WHEN size(syms) >= 2
       THEN zip_with(slice(syms, 1, size(syms) - 1),
                     slice(syms, 2, size(syms) - 1),
                     (a, b) -> struct(a AS s, b AS nxt))
       ELSE CAST(array() AS ARRAY<STRUCT<s: STRING, nxt: STRING>>) END
"""


def _word_symbol_arrays(spark: SparkSession, sf: str) -> DataFrame:
    """(w, cnt, syms): the word-TYPE table with each word split into its
    single-character start symbols as ONE array column — the state BPE
    training/encoding folds in place, one row per word type."""
    return (
        _docs(spark, sf)
        .select(F.explode(words("text")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "w",
            "cnt",
            F.expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))").alias(
                "syms"
            ),
        )
    )


def _merge_syms(syms, pa, pb, merged):
    """One greedy left-to-right BPE merge rank over a symbol ARRAY — a single
    fold, no shuffle, no window. Greedy equivalence to the classic
    odd-ranks-in-a-run formulation: a position merges iff it equals ``pa``,
    the next symbol equals ``pb``, and the position itself was not consumed
    by the previous merge — in the fold, "not consumed" is exactly "still the
    last element of the accumulator", and a just-merged token can never
    false-match because ``concat(pa, pb) = pa`` would need an empty ``pb``.
    ``get`` (0-based, NULL out of bounds) keeps the empty-accumulator probe
    ANSI-safe."""
    return F.aggregate(
        syms,
        F.expr("CAST(array() AS ARRAY<STRING>)"),
        lambda acc, x: F.when(
            (F.get(acc, F.size(acc) - 1) == pa) & (x == pb),
            F.concat(F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def tok_bpe_merges(spark: SparkSession, sf: str) -> DataFrame:
    """First ``BPE_ROUNDS`` byte-pair-encoding merges learned from the corpus
    — the tokenizer-training primitive (Sennrich et al. 2016), distributed
    the way SentencePiece/HF trainers shard it: all statistics live on the
    WORD-TYPE table (distinct word, occurrence count), which is the only
    state that must scale, not the raw token stream.

    Per round, fully declarative — no driver-side data:
    - adjacent symbol pairs weighted by word counts (one explode + map-side-
      combined aggregation), best pair = max count, ties lexicographic;
    - the 1-row best pair broadcasts back onto the word table;
    - greedy left-to-right merge as ONE array fold per word (``_merge_syms``)
      — the r10 shape: the old per-rank gaps-and-islands pass cost 2 window
      shuffles + 2 (w, pos)-keyed join exchanges + an eager checkpoint per
      round on a table whose rows are independent words; the fold does the
      identical greedy merge inside the row, so each round is one small
      aggregation job and zero symbol-table shuffles.

    Output: one exact-integer row per merge round. Same greedy semantics in
    the DuckDB oracle, generated as one CTE chain per round."""
    per_round, _final = _bpe_train(spark, sf)
    out = per_round[0]
    for df in per_round[1:]:
        out = out.unionByName(df)
    return out.orderBy("merge_round")


def _bpe_train(
    spark: SparkSession, sf: str
) -> tuple[list[DataFrame], DataFrame]:
    """Shared BPE training loop: returns (per-round 1-row merge reports, the
    word-type table with all ``BPE_ROUNDS`` merges applied). The final state
    is exactly what encoding produces — ``tok_bpe_encode`` aggregates it
    directly instead of re-deriving the fold chain from the merge list."""
    # the word-type table is the only distributed state: materialize it once
    # (one job) so the 4 per-round pair-count jobs re-fold from its blocks
    # instead of re-scanning/re-aggregating the corpus
    cur = _word_symbol_arrays(spark, sf).localCheckpoint(eager=True)
    per_round: list[DataFrame] = []
    for r in range(1, BPE_ROUNDS + 1):
        best = (
            cur.select("cnt", F.explode(F.expr(_ADJ_PAIRS)).alias("pr"))
            .groupBy(F.col("pr.s").alias("s"), F.col("pr.nxt").alias("nxt"))
            .agg(F.sum("cnt").alias("c"))
            .orderBy(F.desc("c"), F.asc("s"), F.asc("nxt"))
            .limit(1)
            .select(
                F.col("s").alias("pa"), F.col("nxt").alias("pb"), F.col("c").alias("pc")
            )
        ).localCheckpoint(eager=True)
        per_round.append(
            best.select(
                F.lit(r).cast("long").alias("merge_round"),
                F.concat_ws("+", "pa", "pb").alias("pair"),
                F.concat("pa", "pb").alias("merged_token"),
                F.col("pc").cast("long").alias("pair_count"),
            )
        )
        # best is a 1-row checkpoint; the limit is a semantic no-op that
        # keeps the bound VISIBLE in the plan (the BNLJ build-side lint
        # cannot see through an RDDScan leaf to the agg+limit that built it)
        cur = cur.crossJoin(F.broadcast(best.limit(1))).select(
            "w",
            "cnt",
            _merge_syms(
                F.col("syms"), F.col("pa"), F.col("pb"), F.concat("pa", "pb")
            ).alias("syms"),
        )
    return per_round, cur


def bpe_apply_merges(symbols: DataFrame, merges: list[tuple[str, str]]) -> DataFrame:
    """Apply an ordered list of learned BPE merges to a symbol table — the
    ENCODE half of the tokenizer (what a training-data pipeline runs per
    document forever after training runs once).

    ``symbols`` is the (w, cnt, pos, s) word-type table (same shape training
    uses); ``merges`` are (pa, pb) pairs in rank order, LITERALS in the plan
    (the broadcast-merge-ranks analogue — at production vocab sizes the rank
    table rides a broadcast join; at plan-literal sizes Catalyst constant-
    folds them). Each rank is one array fold (``_merge_syms``) — identical
    greedy left-to-right semantics to training, including the aa-chain
    overlap case — with NO aggregation, NO window, NO join and NO per-rank
    checkpoint: the whole R-rank apply is one narrow projection chain over
    word-type rows (r10; the old per-rank gaps-and-islands pass paid 2
    window shuffles + 2 (w, pos)-keyed join exchanges + an eager checkpoint
    per rank). The only shuffle is the one (w, cnt) re-assembly of the
    caller's exploded symbol layout into per-word arrays."""
    arr = (
        symbols.groupBy("w", "cnt")
        .agg(F.sort_array(F.collect_list(F.struct("pos", "s"))).alias("ps"))
        .select("w", "cnt", F.expr("transform(ps, x -> x.s)").alias("syms"))
    )
    for pa, pb in merges:
        arr = arr.select(
            "w",
            "cnt",
            _merge_syms(F.col("syms"), F.lit(pa), F.lit(pb), F.lit(pa + pb)).alias(
                "syms"
            ),
        )
    return arr.select("w", "cnt", F.posexplode("syms").alias("p", "s")).select(
        "w", "cnt", (F.col("p") + 1).alias("pos"), "s"
    )


def tok_bpe_encode(spark: SparkSession, sf: str, top_n: int = 50) -> DataFrame:
    """Tokenize the corpus with the learned BPE merges and report the token
    vocabulary usage — the encode step every ingest runs per document after
    training ran once (Sennrich et al. 2016; the apply half ``tok_bpe_merges``
    trains for).

    Two stages:
    1. TRAIN: the ``tok_bpe_merges`` plan learns ``BPE_ROUNDS`` merges; the
       collect is R rows of tokenizer METADATA (pairs), the same bounded
       planning scalar a 100k-merge production vocab is — merge ranks are
       broadcast-sized by construction, never data-sized.
    2. ENCODE: training's final word-type state IS the encoded table (each
       round applies its best pair as an array fold the moment it is found —
       ``_bpe_train``), so encoding re-reads the materialized word-type
       blocks through the R-fold projection once and aggregates — zero
       windows, zero joins, zero per-rank checkpoints (r10; the
       exploded-symbol islands-window form paid ~4 shuffles per rank and
       re-derived the chain from collected merge literals).

    Output: the ``top_n`` most-used tokens after encoding, exact integers
    (occurrences weighted by word counts, distinct word types containing the
    token), ordered (occurrences DESC, token). Differential oracle: the same
    greedy semantics as one generated CTE chain — training AND encoding —
    validated end-to-end against DuckDB."""
    _per_round, final = _bpe_train(spark, sf)
    encoded = final.select("w", "cnt", F.explode("syms").alias("s"))
    return (
        encoded.groupBy(F.col("s").alias("token"))
        .agg(
            F.sum("cnt").cast("long").alias("occurrences"),
            F.countDistinct("w").cast("long").alias("word_types"),
        )
        .orderBy(F.desc("occurrences"), F.asc("token"))
        .limit(top_n)
    )


def _bpe_oracle() -> str:
    """Generate the BPE_ROUNDS-round oracle as one CTE chain (same greedy
    islands formula, same tie-break)."""
    parts = [
        """
WITH wt AS (
  SELECT w, count(*)::BIGINT AS cnt FROM (
    SELECT unnest(list_filter(str_split(trim(text), ' '), x -> x <> '')) AS w
    FROM documents) GROUP BY w
), s1 AS (
  SELECT w, cnt, i AS pos, substr(w, i, 1) AS s
  FROM (SELECT w, cnt, unnest(generate_series(1, length(w))) AS i FROM wt)
)"""
    ]
    for r in range(1, BPE_ROUNDS + 1):
        parts.append(
            f"""
, n{r} AS (
  SELECT w, cnt, pos, s,
         lead(s) OVER (PARTITION BY w ORDER BY pos) AS nxt
  FROM s{r}
), b{r} AS (
  SELECT s AS pa, nxt AS pb, sum(cnt)::BIGINT AS pc
  FROM n{r} WHERE nxt IS NOT NULL
  GROUP BY s, nxt ORDER BY pc DESC, pa ASC, pb ASC LIMIT 1
), m{r} AS (
  SELECT w, pos,
         pos - row_number() OVER (PARTITION BY w ORDER BY pos) AS grp
  FROM n{r}, b{r} WHERE s = pa AND nxt = pb
), st{r} AS (
  SELECT w, pos FROM (
    SELECT w, pos, row_number() OVER (PARTITION BY w, grp ORDER BY pos) AS rk
    FROM m{r}) WHERE rk % 2 = 1
), s{r + 1} AS (
  SELECT w, cnt,
         row_number() OVER (PARTITION BY w ORDER BY pos) AS pos,
         CASE WHEN hit THEN (SELECT pa || pb FROM b{r}) ELSE s END AS s
  FROM (
    SELECT n.w, n.cnt, n.pos, n.s,
           EXISTS (SELECT 1 FROM st{r} t WHERE t.w = n.w AND t.pos = n.pos) AS hit
    FROM n{r} n
    WHERE NOT EXISTS (SELECT 1 FROM st{r} t WHERE t.w = n.w AND t.pos = n.pos - 1))
)"""
        )
    selects = [
        f"SELECT {r}::BIGINT AS merge_round, pa || '+' || pb AS pair, "
        f"pa || pb AS merged_token, pc AS pair_count FROM b{r}"
        for r in range(1, BPE_ROUNDS + 1)
    ]
    return "".join(parts) + "\n" + "\nUNION ALL\n".join(selects) + "\nORDER BY merge_round"


TOK_BPE_ORACLE = _bpe_oracle()


def tok_fertility_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Per-language tokenizer fertility after BPE encoding — the multilingual
    budgeting metric (tokens per word, characters per token) every corpus
    report carries: languages the tokenizer under-serves show high fertility,
    and mixture weights/compute budgets are set from exactly this table.

    Shape: the learned merges (bounded metadata) replay over the word-TYPE
    table once; per-type token counts then join the (lang, word) stream on
    the word — a shuffle keyed on word types, NOT documents — and one
    low-cardinality per-language aggregation finishes. Exact integer output
    (DIV surrogates, same convention as ``text_unigram_lm_score``)."""
    merge_rows = tok_bpe_merges(spark, sf).collect()  # R rows of vocab metadata
    merges = [tuple(r["pair"].split("+", 1)) for r in merge_rows]
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
    tok_per_type = (
        bpe_apply_merges(symbols, merges)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n_sym"))
    )
    dw = _docs(spark, sf).select("lang", F.explode(words("text")).alias("w"))
    return (
        dw.join(tok_per_type, "w")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("n_sym").cast("long").alias("n_tokens"),
            F.sum(F.length("w")).cast("long").alias("n_chars"),
        )
        .select(
            "lang",
            "n_words",
            "n_tokens",
            "n_chars",
            F.expr("(1000 * n_tokens) DIV n_words").alias("fertility_milli"),
            F.expr("(1000 * n_chars) DIV n_tokens").alias("chars_per_token_milli"),
        )
        .orderBy("lang")
    )


TOK_FERTILITY_ORACLE = (
    TOK_BPE_ORACLE[: TOK_BPE_ORACLE.rindex(")") + 1]
    + f"""
, tok AS (
  SELECT w, count(*)::BIGINT AS n_sym FROM s{BPE_ROUNDS + 1} GROUP BY w
), dw AS (
  SELECT lang, unnest(list_filter(str_split(trim(text), ' '), x -> x <> '')) AS w
  FROM documents
)
SELECT lang,
       count(*)::BIGINT AS n_words,
       sum(n_sym)::BIGINT AS n_tokens,
       sum(length(w))::BIGINT AS n_chars,
       ((1000 * sum(n_sym)) // count(*))::BIGINT AS fertility_milli,
       ((1000 * sum(length(w))) // sum(n_sym))::BIGINT AS chars_per_token_milli
FROM dw JOIN tok USING (w)
GROUP BY lang ORDER BY lang"""
)

#: encode oracle: the SAME generated train CTE chain (merges re-derived in
#: SQL, so the oracle is self-contained end-to-end), aggregated over the
#: final symbol table s{R+1} — token usage weighted by word counts. The
#: chain ends at the last CTE's closing paren; everything after is the
#: train oracle's merge-table SELECTs, swapped here for the histogram.
TOK_BPE_ENCODE_ORACLE = (
    TOK_BPE_ORACLE[: TOK_BPE_ORACLE.rindex(")") + 1]
    + f"""
SELECT s AS token, sum(cnt)::BIGINT AS occurrences,
       count(DISTINCT w)::BIGINT AS word_types
FROM s{BPE_ROUNDS + 1}
GROUP BY s
ORDER BY occurrences DESC, token ASC
LIMIT 50"""
)


# ---------------------------------------------------------------------------
# Span-corruption planning (T5 denoising, Raffel et al. 2020 arXiv:1910.10683)
# ---------------------------------------------------------------------------

CORRUPT_SEED = "t5span"
#: span-start probability (percent) and the 2..4 span-length draw — mean
#: span 3, expected corruption ≈ 15%, the T5 defaults. Both draws come from
#: md5 (seeded, per position): deterministic, resumable, engine-portable.
CORRUPT_START_PCT = 5


def pipe_span_corruption(spark: SparkSession, sf: str) -> DataFrame:
    """T5-style span-corruption plan: which token spans of each document are
    masked behind sentinels for denoising pretraining. The PLAN is the
    distributed artifact (the actual text substitution is a trivial per-row
    map once spans are known); producing it deterministically means a
    preempted 100 TB job resumes without re-randomizing what it already
    wrote.

    Per position, a seeded md5 draw starts a span (CORRUPT_START_PCT%), a
    second draw picks its length in {2,3,4}; spans clip at the document end
    and overlapping/adjacent spans merge (the same gaps-and-islands pass as
    ``dedup_substring_spans``). Sentinel ids number the merged spans per
    document in order — exactly T5's ``<extra_id_k>`` sequence. All exact
    integers; per-doc window work only."""
    d = _docs(spark, sf).select("doc_id", words("text").alias("__ws"))
    toks = d.select(
        "doc_id",
        F.size("__ws").alias("n"),
        F.posexplode("__ws").alias("p", "w"),
    ).select("doc_id", "n", (F.col("p") + 1).alias("pos"))
    h = F.md5(
        F.concat_ws(":", F.lit(CORRUPT_SEED), F.col("doc_id").cast("string"), F.col("pos").cast("string"))
    )
    starts = toks.select(
        "doc_id",
        "pos",
        "n",
        (F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % 100).alias("u"),
        (2 + F.conv(F.substring(h, 9, 8), 16, 10).cast("bigint") % 3).alias("slen"),
    ).filter(F.col("u") < CORRUPT_START_PCT)
    dw = starts.select(
        "doc_id",
        F.col("pos").alias("start"),
        F.least(F.col("pos") + F.col("slen") - 1, F.col("n")).alias("e"),
    )
    spans = _merged_spans(dw)
    w = Window.partitionBy("doc_id").orderBy("span_start")
    return (
        spans.select(
            "doc_id",
            (F.row_number().over(w) - 1).cast("long").alias("sentinel_k"),
            "span_start",
            "span_end",
            "span_len",
        )
        .orderBy("doc_id", "span_start")
    )


PIPE_SPAN_CORRUPTION_ORACLE = f"""
WITH ws AS (
  SELECT doc_id, list_filter(str_split(trim(text), ' '), w -> w <> '') AS w
  FROM documents
), toks AS (
  SELECT doc_id, len(w) AS n, unnest(generate_series(1, len(w))) AS pos FROM ws
), draws AS (
  SELECT doc_id, pos, n,
         md5('{CORRUPT_SEED}:' || CAST(doc_id AS VARCHAR) || ':' ||
             CAST(pos AS VARCHAR)) AS h
  FROM toks
), dw AS (
  SELECT doc_id, pos AS start,
         least(pos + (2 + ('0x' || substr(h, 9, 8))::BIGINT % 3) - 1, n) AS e
  FROM draws
  WHERE ('0x' || substr(h, 1, 8))::BIGINT % 100 < {CORRUPT_START_PCT}
), flagged AS (
  SELECT doc_id, start, e,
         CASE WHEN max(e) OVER (PARTITION BY doc_id ORDER BY start
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
              OR start > max(e) OVER (PARTITION BY doc_id ORDER BY start
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + 1
         THEN 1 ELSE 0 END AS nf
  FROM dw
), islands AS (
  SELECT doc_id, start, e,
         sum(nf) OVER (PARTITION BY doc_id ORDER BY start
                       ROWS UNBOUNDED PRECEDING) AS isl
  FROM flagged
), spans AS (
  SELECT doc_id, min(start)::BIGINT AS span_start, max(e)::BIGINT AS span_end,
         (max(e) - min(start) + 1)::BIGINT AS span_len
  FROM islands GROUP BY doc_id, isl
)
SELECT doc_id,
       (row_number() OVER (PARTITION BY doc_id ORDER BY span_start) - 1)::BIGINT
         AS sentinel_k,
       span_start, span_end, span_len
FROM spans ORDER BY doc_id, span_start
"""


# ---------------------------------------------------------------------------
# Length-bucketed batch planning (padding-efficient training batches)
# ---------------------------------------------------------------------------

#: power-of-two token-length buckets and the per-batch document count.
#: Bucket membership is a CASE ladder over these fixed bounds (never float
#: log2 — its boundary rounding differs across engines).
LEN_BUCKETS = (16, 32, 64, 128, 256, 1024)
LEN_BATCH_SIZE = 8
LEN_SEED = "len42"


def pipe_length_buckets(spark: SparkSession, sf: str) -> DataFrame:
    """Length-bucketed training batches: documents padded to the nearest
    power-of-two token bound, batched WITHIN a bucket so batch padding waste
    is bounded by the bucket's span — the standard dynamic-padding batching
    step between "packed corpus" and "data loader".

    Shape: one per-row token count, one window per (bucket) key for the
    seeded rank (md5 order — deterministic, no RNG), batch id by integer
    division. At 100 TB the bucket key would salt into (bucket, shard)
    exactly like ``pipe_shuffle_order``; per-doc outputs stay exact ints."""
    d = _docs(spark, sf).select(
        "doc_id", F.size(words("text")).cast("long").alias("n_tokens")
    )
    bucket = F.lit(None).cast("long")
    for b in reversed(LEN_BUCKETS):
        bucket = F.when(F.col("n_tokens") <= b, F.lit(b)).otherwise(bucket)
    d = d.filter(F.col("n_tokens") <= LEN_BUCKETS[-1]).select(
        "doc_id",
        "n_tokens",
        bucket.alias("bucket"),
        F.md5(F.concat(F.lit(LEN_SEED + ":"), F.col("doc_id").cast("string"))).alias(
            "h"
        ),
    )
    w = Window.partitionBy("bucket").orderBy("h", "doc_id")
    return (
        d.withColumn("rk", F.row_number().over(w))
        .select(
            "doc_id",
            "n_tokens",
            "bucket",
            F.expr(f"CAST((rk - 1) DIV {LEN_BATCH_SIZE} + 1 AS BIGINT)").alias(
                "batch_id"
            ),
            (F.col("bucket") - F.col("n_tokens")).cast("long").alias("pad_tokens"),
        )
        .orderBy("doc_id")
    )


PIPE_LENGTH_BUCKETS_ORACLE = f"""
WITH d AS (
  SELECT doc_id,
         len(list_filter(str_split(trim(text), ' '), w -> w <> ''))::BIGINT
           AS n_tokens
  FROM documents
), b AS (
  SELECT doc_id, n_tokens,
         CASE {" ".join(f"WHEN n_tokens <= {x} THEN {x}" for x in LEN_BUCKETS)}
         END::BIGINT AS bucket,
         md5('{LEN_SEED}:' || CAST(doc_id AS VARCHAR)) AS h
  FROM d WHERE n_tokens <= {LEN_BUCKETS[-1]}
), r AS (
  SELECT doc_id, n_tokens, bucket,
         row_number() OVER (PARTITION BY bucket ORDER BY h, doc_id) AS rk
  FROM b
)
SELECT doc_id, n_tokens, bucket,
       ((rk - 1) // {LEN_BATCH_SIZE} + 1)::BIGINT AS batch_id,
       (bucket - n_tokens)::BIGINT AS pad_tokens
FROM r ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Distributed k-means (Lloyd's algorithm) over embeddings
# ---------------------------------------------------------------------------

#: clusters, Lloyd update rounds, and the integer quantization grid. Every
#: SemDeDup/IVF-style pipeline stage upstream assumes "cluster assignments
#: exist"; this op is the one that PRODUCES them. Exact integer math end to
#: end (quantized coordinates, floor-div centroids, integer distances) so the
#: driver gate hashes BIGINTs — same trick as text_unigram_lm_score.
KM_K = 8
KM_ITERS = 2
KM_SCALE = 1000
KM_SHIFT = 1000  # embeddings live in [-1, 1]: shift keeps coordinates >= 0
KM_DIMS = 64


def emb_kmeans_lloyd(spark: SparkSession, sf: str) -> DataFrame:
    """Lloyd's k-means over the embeddings table, KM_ITERS centroid updates
    then a final assignment — the clustering step SemDeDup/IVF consume.

    Distributed shape (the standard one): centroids are the ONLY global
    state, K·d rows broadcast each round; assignment is one broadcast join +
    per-vector aggregation (O(n·K·d) work, no shuffle of the vectors
    themselves beyond their own key); the centroid update is one
    map-side-combined groupBy. ``localCheckpoint`` truncates the per-round
    lineage exactly like ``tok_bpe_merges``.

    Exactness: coordinates quantize to the KM_SCALE grid SHIFTED
    non-negative, so the floor-division centroid update means truncating and
    floor division agree between engines; distances and inertia are exact
    BIGINTs; argmin ties break on the lower cluster id. Clusters that lose
    every member simply drop out of the next round (deterministic on both
    sides). Seeds are the first KM_K vec_ids — deterministic, no RNG."""
    e = t(spark, sf, "embeddings").select("vec_id", "embedding")
    q = e.select("vec_id", F.posexplode("embedding").alias("d0", "x")).select(
        "vec_id",
        (F.col("d0") + 1).alias("dim"),
        (F.floor(F.col("x").cast("double") * KM_SCALE) + KM_SHIFT)
        .cast("long")
        .alias("q"),
    )
    q = q.localCheckpoint(eager=True)
    cent = q.filter(F.col("vec_id") < KM_K).select(
        F.col("vec_id").alias("c"), "dim", F.col("q").alias("cq")
    )

    def assign(centroids: DataFrame) -> DataFrame:
        d = (
            q.join(F.broadcast(centroids), "dim")
            .groupBy("vec_id", "c")
            .agg(
                F.sum((F.col("q") - F.col("cq")) * (F.col("q") - F.col("cq"))).alias(
                    "dist"
                )
            )
        )
        w = Window.partitionBy("vec_id").orderBy("dist", "c")
        return (
            d.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select("vec_id", "c", "dist")
        )

    for _ in range(KM_ITERS):
        a = assign(cent)
        cent = (
            q.join(a.select("vec_id", "c"), "vec_id")
            .groupBy("c", "dim")
            .agg(F.expr("sum(q) DIV count(1)").cast("long").alias("cq"))
        ).localCheckpoint(eager=True)
    final = assign(cent)
    return final.select(
        "vec_id",
        F.col("c").cast("long").alias("cluster"),
        F.col("dist").cast("long").alias("dist"),
    ).orderBy("vec_id")


def _kmeans_oracle() -> str:
    assign_tpl = """
, a{r} AS (
  SELECT vec_id, c, dist FROM (
    SELECT vec_id, c, dist,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist, c) AS rk
    FROM (SELECT q.vec_id, ct.c,
                 sum((q.q - ct.cq) * (q.q - ct.cq))::BIGINT AS dist
          FROM q JOIN c{p} ct USING (dim) GROUP BY q.vec_id, ct.c))
  WHERE rk = 1
)"""
    update_tpl = """
, c{r} AS (
  SELECT a.c, q.dim, (sum(q.q) // count(*))::BIGINT AS cq
  FROM q JOIN a{r} a USING (vec_id) GROUP BY a.c, q.dim
)"""
    sql = f"""
WITH q AS (
  SELECT vec_id, i AS dim,
         (floor(embedding[i] * {KM_SCALE})::BIGINT + {KM_SHIFT}) AS q
  FROM (SELECT vec_id, embedding,
               unnest(generate_series(1, {KM_DIMS})) AS i
        FROM embeddings)
), c0 AS (
  SELECT vec_id AS c, dim, q AS cq FROM q WHERE vec_id < {KM_K}
)"""
    for r in range(1, KM_ITERS + 1):
        sql += assign_tpl.format(r=r, p=r - 1) + update_tpl.format(r=r)
    sql += assign_tpl.format(r=KM_ITERS + 1, p=KM_ITERS)
    sql += f"""
SELECT vec_id, c::BIGINT AS cluster, dist FROM a{KM_ITERS + 1} ORDER BY vec_id
"""
    return sql


EMB_KMEANS_ORACLE = _kmeans_oracle()


SPECS: list[QuerySpec] = [
    QuerySpec(
        "dedup_substring_spans",
        dedup_substring_spans,
        DEDUP_SUBSTRING_SPANS_ORACLE,
        "LLM:dedup exact-substring spans (Lee et al. 2022)",
    ),
    QuerySpec(
        "dedup_substring_removal",
        dedup_substring_removal,
        DEDUP_SUBSTRING_REMOVAL_ORACLE,
        "LLM:dedup exact-substring removal accounting",
    ),
    QuerySpec(
        "pipe_self_dedup",
        pipe_self_dedup,
        PIPE_SELF_DEDUP_ORACLE,
        "LLM:within-document repeated-span removal accounting",
    ),
    QuerySpec(
        "pipe_substring_decontaminate",
        pipe_substring_decontaminate,
        PIPE_SUBSTRING_DECONTAMINATE_ORACLE,
        "LLM:cross-corpus exact-substring eval decontamination",
    ),
    QuerySpec(
        "tok_bpe_merges",
        tok_bpe_merges,
        TOK_BPE_ORACLE,
        "LLM:tokenizer BPE merge training (Sennrich et al. 2016)",
    ),
    QuerySpec(
        "tok_bpe_encode",
        tok_bpe_encode,
        TOK_BPE_ENCODE_ORACLE,
        "LLM:tokenizer BPE corpus encoding with learned merges",
    ),
    QuerySpec(
        "tok_fertility_stats",
        tok_fertility_stats,
        TOK_FERTILITY_ORACLE,
        "LLM:per-language tokenizer fertility (tokens/word, chars/token)",
    ),
    QuerySpec(
        "emb_kmeans_lloyd",
        emb_kmeans_lloyd,
        EMB_KMEANS_ORACLE,
        "LLM:distributed k-means (Lloyd) cluster assignments",
    ),
    QuerySpec(
        "pipe_length_buckets",
        pipe_length_buckets,
        PIPE_LENGTH_BUCKETS_ORACLE,
        "LLM:length-bucketed padding-efficient batch planning",
    ),
    QuerySpec(
        "pipe_span_corruption",
        pipe_span_corruption,
        PIPE_SPAN_CORRUPTION_ORACLE,
        "LLM:T5 span-corruption denoising plan",
    ),
]
