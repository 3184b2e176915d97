"""Ninth LLM-pipeline battery: paragraph-level cross-document dedup and
semantic (embedding-space) decontamination.

- ``pipe_paragraph_dedup`` — the CCNet/Dolma workhorse between doc-level
  (``dedup_exact``) and span-level (``dedup_substring_spans``): documents
  split into paragraphs, each normalized paragraph hashed once, and the
  corpus-wide FIRST occurrence (min ``(doc_id, position)`` per hash) kept —
  every later copy is removal-accounted against its document. One
  O(paragraphs) hash shuffle; no all-pairs step.
- ``pipe_semantic_decontaminate`` — the embedding complement of
  ``pipe_decontaminate`` (which blocks on exact 3-gram overlap): train-split
  documents whose embedding sits too close (cosine) to ANY eval-split
  document leak paraphrased evaluation signal into training. Candidates come
  from the same multi-table hyperplane LSH as ``dedup_embed_ann`` restricted
  to train×eval bucket collisions; the exact cosine confirm runs on
  candidates only.

Reference analogue: the reference ships record-identity dedup only (its Glue
pipelines group whole records — ``glue/S3 Calls benchmarking Code.py``);
paragraph-level dedup and semantic decontamination are the beyond-reference
training-data requirements.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hudi_examples_spark.functions.text import words
from hudi_examples_spark.functions.vectors import (
    cosine_similarity,
    lsh_multi_table_buckets,
)
from hudi_examples_spark.operators.llm_pipeline2 import _TABLES
from hudi_examples_spark.operators.spec import QuerySpec
from hudi_examples_spark.sources.readers import load_sf_table as t

# ---------------------------------------------------------------------------
# Paragraph-level cross-document dedup (CCNet / Dolma paragraph dedup)
# ---------------------------------------------------------------------------

#: Paragraph boundary tokens. Real corpora split on newlines ('\n' survives
#: whitespace tokenization as its own boundary when text is pre-segmented);
#: the synthetic sf corpus carries no newlines, so the battery breaks at the
#: two highest-frequency stopwords instead. The boundary rule is a pure
#: function of CONTENT, so a passage copied between documents splits into
#: the SAME paragraphs wherever it lands — exactly the property newline
#: splitting has on real crawl text — and the machinery (hash shuffle,
#: first-occurrence window, removal accounting) is separator-agnostic.
PARA_BREAKERS = ("the", "a")


def _paragraphs(spark: SparkSession, sf: str) -> DataFrame:
    """(doc_id, para_id, pos, para_text, para_tokens): content-split
    paragraphs per document. ``pos`` is the paragraph's first word position
    (1-based, document order); boundary tokens belong to no paragraph.

    Shape: one projection (posexplode of the word array — linear, no
    corpus-wide state), one groupBy (doc_id, para_id) keyed shuffle whose
    skew is bounded by the longest document."""
    d = t(spark, sf, "documents").select(
        "doc_id",
        F.posexplode(F.filter(F.split(F.trim("text"), "\\s+"), lambda w: w != "")).alias(
            "p", "w"
        ),
    ).select("doc_id", (F.col("p") + 1).alias("pos"), "w")
    is_sep = F.col("w").isin(*PARA_BREAKERS)
    w_run = Window.partitionBy("doc_id").orderBy("pos")
    seg = d.withColumn(
        "para_id", F.sum(F.when(is_sep, 1).otherwise(0)).over(w_run)
    ).filter(~is_sep)
    return (
        seg.groupBy("doc_id", "para_id")
        .agg(
            F.min("pos").alias("pos"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "w"))),
                    lambda s: s["w"],
                ),
                " ",
            ).alias("para_text"),
            F.count(F.lit(1)).cast("long").alias("para_tokens"),
        )
        .select("doc_id", "para_id", "pos", "para_text", "para_tokens")
    )


def pipe_paragraph_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document paragraph-dedup removal accounting: corpus-wide
    first-occurrence-wins over md5(paragraph).

    Plan: paragraphs (one keyed groupBy, above) → ONE shuffle keyed on the
    paragraph hash (a ``row_number`` window ordered by (doc_id, pos) marks
    the keeper — min (doc_id, position) per hash, deterministic) → per-doc
    aggregation. O(paragraphs) end to end; hot boilerplate paragraphs make
    one hash partition larger but the window computes a single rank pass,
    never a pairwise product. Duplicate-paragraph accounting within one
    document is included by construction (2nd+ occurrences lose to the
    first)."""
    paras = _paragraphs(spark, sf).withColumn("h", F.md5("para_text"))
    w_first = Window.partitionBy("h").orderBy("doc_id", "pos")
    marked = paras.withColumn(
        "dup", F.when(F.row_number().over(w_first) == 1, 0).otherwise(1)
    )
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_paras"),
            F.sum("dup").cast("long").alias("dup_paras"),
            F.sum("para_tokens").cast("long").alias("n_tokens"),
            F.sum(F.col("dup") * F.col("para_tokens")).cast("long").alias("dup_tokens"),
            (F.sum("para_tokens") - F.sum(F.col("dup") * F.col("para_tokens")))
            .cast("long")
            .alias("kept_tokens"),
            F.when(F.sum("dup") == F.count(F.lit(1)), 1)
            .otherwise(0)
            .cast("long")
            .alias("fully_dup"),
        )
        .orderBy("doc_id")
    )


_PARA_CTE = f"""
WITH toks AS (
  SELECT doc_id, i AS pos, w[i] AS w
  FROM (
    SELECT doc_id, list_filter(str_split(trim(text), ' '), x -> x <> '') AS w
    FROM documents
  ), LATERAL (SELECT unnest(generate_series(1, len(w))) AS i)
), seg AS (
  SELECT doc_id, pos, w,
         sum(CASE WHEN w IN {PARA_BREAKERS!r} THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS UNBOUNDED PRECEDING) AS para_id
  FROM toks
), paras AS (
  SELECT doc_id, para_id,
         min(pos) AS pos,
         string_agg(w, ' ' ORDER BY pos) AS para_text,
         count(*)::BIGINT AS para_tokens
  FROM seg
  WHERE w NOT IN {PARA_BREAKERS!r}
  GROUP BY doc_id, para_id
), marked AS (
  SELECT doc_id, para_tokens,
         CASE WHEN row_number() OVER (PARTITION BY md5(para_text)
                                      ORDER BY doc_id, pos) = 1
              THEN 0 ELSE 1 END AS dup
  FROM paras
)
"""

PIPE_PARAGRAPH_DEDUP_ORACLE = (
    _PARA_CTE
    + """
SELECT doc_id,
       count(*)::BIGINT AS n_paras,
       sum(dup)::BIGINT AS dup_paras,
       sum(para_tokens)::BIGINT AS n_tokens,
       sum(dup * para_tokens)::BIGINT AS dup_tokens,
       (sum(para_tokens) - sum(dup * para_tokens))::BIGINT AS kept_tokens,
       (CASE WHEN sum(dup) = count(*) THEN 1 ELSE 0 END)::BIGINT AS fully_dup
FROM marked
GROUP BY doc_id
ORDER BY doc_id
"""
)


# ---------------------------------------------------------------------------
# Semantic decontamination (embedding-space train/eval leakage)
# ---------------------------------------------------------------------------

#: Exact-cosine confirmation threshold. 0.4 matches ``dedup_embed_ann`` —
#: high enough to be "suspiciously close" on this corpus, low enough that
#: the sf corpus (random embeddings) yields a non-empty, stable audit.
SEMANTIC_DECON_THRESHOLD = 0.4


def _split_expr():
    """The pipe_hash_split assignment, shared from its single definition so
    the decontamination audit always follows the split actually assigned."""
    from hudi_examples_spark.operators.llm_pipeline3 import split_assignment_expr

    return split_assignment_expr()


def pipe_semantic_decontaminate(spark: SparkSession, sf: str) -> DataFrame:
    """Train docs embedding-near an eval (val/test) doc: per flagged train
    doc, hit count, max cosine, and the nearest eval doc (ties → smallest
    eval id).

    Plan (100 TB stance): both sides band through the SAME 8×4 hyperplane
    LSH tables as ``dedup_embed_ann``; candidates are train×eval bucket
    collisions only. The eval slice is tiny relative to the corpus (10-20%
    here, thousands of rows in production), so its banded form BROADCASTS —
    the train side never shuffles, and the exact cosine confirm runs on
    collision candidates only, never all train×eval pairs. Output is
    O(contaminated docs)."""
    docs = t(spark, sf, "documents").select(
        "doc_id", _split_expr().alias("split")
    )
    emb = t(spark, sf, "embeddings").select("vec_id", "embedding")
    joined = docs.join(emb, docs.doc_id == emb.vec_id).select(
        "doc_id", "split", "embedding"
    )
    banded = joined.select(
        "doc_id",
        "split",
        "embedding",
        F.explode(lsh_multi_table_buckets("embedding", _TABLES)).alias("bucket"),
    )
    # Explicit width on the train side (r11): the rescore below runs in THIS
    # stage (the eval side broadcasts, so there is no join exchange), and the
    # embeddings join upstream leaves too few/too-coalesced partitions for a
    # candidate count that is quadratic in bucket occupancy. A user
    # repartition is exempt from AQE coalescing; width follows
    # defaultParallelism (scale-adaptive).
    train = (
        banded.filter(F.col("split") == "train")
        .select(
            F.col("doc_id").alias("train_id"), F.col("embedding").alias("emb_t"), "bucket"
        )
        .repartition(spark.sparkContext.defaultParallelism, "bucket")
    )
    ev = banded.filter(F.col("split") != "train").select(
        F.col("doc_id").alias("eval_id"),
        F.col("split").alias("eval_split"),
        F.col("embedding").alias("emb_e"),
        "bucket",
    )
    # Rescore + threshold BEFORE the pair dedup (r11, guide §2.3): deduping
    # first shuffled every (train, eval, bucket) collision row with both
    # embeddings attached; cosine is deterministic per (train_id, eval_id)
    # (and eval_split is a function of eval_id), so scoring map-side after
    # the broadcast join and deduping the skinny thresholded rows is
    # value-identical while the exchange carries 4 scalars instead of two
    # 64-float arrays per row — and only rows past the threshold at all.
    cand = (
        train.join(F.broadcast(ev), "bucket")
        .select(
            "train_id",
            "eval_id",
            "eval_split",
            F.round(cosine_similarity("emb_t", "emb_e"), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= SEMANTIC_DECON_THRESHOLD)
        .dropDuplicates(["train_id", "eval_id"])
    )
    w_best = Window.partitionBy("train_id").orderBy(
        F.desc("cos_sim"), F.asc("eval_id")
    )
    return (
        cand.withColumn("__rn", F.row_number().over(w_best))
        .groupBy("train_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_eval_hits"),
            F.max("cos_sim").alias("max_cos"),
            F.max(F.when(F.col("__rn") == 1, F.col("eval_id")))
            .cast("long")
            .alias("nearest_eval_id"),
            F.max(F.when(F.col("__rn") == 1, F.col("eval_split"))).alias(
                "nearest_eval_split"
            ),
        )
        .orderBy("train_id")
    )


def _semantic_decon_oracle() -> str:
    """DuckDB replay: split assignment, per-table sign-bit buckets with the
    same plane literals as ``dedup_embed_ann``'s oracle, train×eval bucket
    collisions, exact cosine confirm, per-train-doc aggregation."""
    selects = []
    for ti, planes in enumerate(_TABLES):
        bits = []
        for i, plane in enumerate(planes):
            lit = "[" + ", ".join(repr(v) for v in plane) + "]::DOUBLE[]"
            bits.append(
                f"(CASE WHEN list_inner_product(embedding::DOUBLE[], {lit}) >= 0 "
                f"THEN {1 << i} ELSE 0 END)"
            )
        selects.append(
            "  SELECT doc_id, split, embedding, ("
            + " + ".join(bits)
            + f" + {ti << 56}::BIGINT)::BIGINT AS bucket FROM joined"
        )
    banded = "\n  UNION ALL\n".join(selects)
    return f"""
WITH splits AS (
  SELECT doc_id,
         CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split
  FROM (
    SELECT doc_id,
           (ascii(substr(md5(text), 1, 1)) * 16 + ascii(substr(md5(text), 2, 1))) % 100 AS b
    FROM documents
  )
), joined AS (
  SELECT s.doc_id, s.split, e.embedding
  FROM splits s JOIN embeddings e ON e.vec_id = s.doc_id
), banded AS (
{banded}
), cand AS (
  SELECT DISTINCT a.doc_id AS train_id, b.doc_id AS eval_id, b.split AS eval_split
  FROM banded a JOIN banded b ON a.bucket = b.bucket
  WHERE a.split = 'train' AND b.split <> 'train'
), scored AS (
  SELECT c.train_id, c.eval_id, c.eval_split,
         round(list_cosine_similarity(e1.embedding::DOUBLE[], e2.embedding::DOUBLE[]), 6)
           AS cos_sim
  FROM cand c
  JOIN embeddings e1 ON e1.vec_id = c.train_id
  JOIN embeddings e2 ON e2.vec_id = c.eval_id
  WHERE round(list_cosine_similarity(e1.embedding::DOUBLE[], e2.embedding::DOUBLE[]), 6)
        >= {SEMANTIC_DECON_THRESHOLD}
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY train_id
                               ORDER BY cos_sim DESC, eval_id) AS rn
  FROM scored
)
SELECT train_id,
       count(*)::BIGINT AS n_eval_hits,
       max(cos_sim) AS max_cos,
       max(CASE WHEN rn = 1 THEN eval_id END)::BIGINT AS nearest_eval_id,
       max(CASE WHEN rn = 1 THEN eval_split END) AS nearest_eval_split
FROM ranked
GROUP BY train_id
ORDER BY train_id
"""


PIPE_SEMANTIC_DECON_ORACLE = _semantic_decon_oracle()


# ---------------------------------------------------------------------------
# Vocabulary coverage curve (tokenizer/vocab budgeting)
# ---------------------------------------------------------------------------

#: coverage thresholds reported: what fraction of token OCCURRENCES the
#: top-K most frequent word types cover — the curve that sizes a tokenizer
#: vocabulary against a corpus
COVERAGE_KS = (10, 50, 200)


def text_vocab_coverage(spark: SparkSession, sf: str) -> DataFrame:
    """Token coverage of the top-K word types, for K in ``COVERAGE_KS``.

    The naive form ranks EVERY word type through one global sort. This
    implementation needs no type-level order at all: covered tokens depend
    only on the COUNT-OF-COUNTS histogram — if K cuts inside a group of
    equal-count types, any choice among them contributes the same count, so
    coverage is well-defined from (count, n_types) pairs alone. Plan: one
    token-count aggregation (the only corpus-scale shuffle, map-side
    combined), one histogram aggregation over word TYPES, then a window over
    the histogram — whose row count is the number of DISTINCT frequency
    values, O(sqrt(total tokens)) under Zipf: bounded statistics metadata,
    the same class as the shard planner's 256-row offset table. Exact
    integer output (coverage in hundredths of a percent via DIV)."""
    toks = t(spark, sf, "documents").select(F.explode(words("text")).alias("w"))
    counts = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    hist = counts.groupBy("c").agg(F.count(F.lit(1)).alias("n_types"))
    w_cum = Window.orderBy(F.desc("c")).rowsBetween(Window.unboundedPreceding, -1)
    hist = hist.withColumn(
        "types_before", F.coalesce(F.sum("n_types").over(w_cum), F.lit(0))
    )
    ks = F.explode(F.array(*[F.lit(k) for k in COVERAGE_KS])).alias("top_k")
    per = hist.select("c", "n_types", "types_before", ks).select(
        "top_k",
        (
            F.col("c")
            * F.greatest(
                F.lit(0),
                F.least(F.col("n_types"), F.col("top_k") - F.col("types_before")),
            )
        ).alias("covered"),
        (F.col("c") * F.col("n_types")).alias("tok"),
    )
    return (
        per.groupBy("top_k")
        .agg(
            F.sum("covered").cast("long").alias("covered_tokens"),
            F.sum("tok").cast("long").alias("total_tokens"),
        )
        .select(
            F.col("top_k").cast("long").alias("top_k"),
            "covered_tokens",
            "total_tokens",
            F.expr("(10000 * covered_tokens) DIV total_tokens").alias(
                "coverage_bp"
            ),
        )
        .orderBy("top_k")
    )


TEXT_VOCAB_COVERAGE_ORACLE = f"""
WITH toks AS (
  SELECT unnest(list_filter(str_split(trim(text), ' '), w -> w <> '')) AS w
  FROM documents
), counts AS (
  SELECT w, count(*) AS c FROM toks GROUP BY w
), hist AS (
  SELECT c, count(*) AS n_types FROM counts GROUP BY c
), cum AS (
  SELECT c, n_types,
         coalesce(sum(n_types) OVER (ORDER BY c DESC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS types_before
  FROM hist
), per AS (
  SELECT k.top_k,
         c * greatest(0, least(n_types, k.top_k - types_before)) AS covered,
         c * n_types AS tok
  FROM cum, (SELECT unnest({list(COVERAGE_KS)!r}) AS top_k) k
)
SELECT top_k::BIGINT AS top_k,
       sum(covered)::BIGINT AS covered_tokens,
       sum(tok)::BIGINT AS total_tokens,
       ((10000 * sum(covered)) // sum(tok))::BIGINT AS coverage_bp
FROM per GROUP BY top_k ORDER BY top_k
"""


# ---------------------------------------------------------------------------
# Interpolated bigram LM scoring (the KenLM-filter shape)
# ---------------------------------------------------------------------------

#: Jelinek-Mercer interpolation weight for the bigram term, in tenths:
#: p = (LM_LAMBDA_TENTHS·p_bi + (10-LM_LAMBDA_TENTHS)·p_uni) / 10
LM_LAMBDA_TENTHS = 7


def text_bigram_lm_score(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document interpolated bigram LM score — the n-gram-LM quality
    filter (CCNet scores documents with a KenLM 5-gram; this is the same
    pipeline shape at n=2 with Jelinek-Mercer smoothing and exact integer
    surrogates, like ``text_unigram_lm_score``).

    Per bigram position: p_bi_milli = (1000·C(w1 w2)) DIV C(w1·) (conditional
    MLE), p_uni_milli = (1000·C(w2)) DIV total_tokens, interpolated in
    integer milli-probability space. Per doc: sum and DIV-average.

    Plan: the token stream shuffles twice into count tables (unigram,
    bigram — both map-side combined); the doc's bigram stream equi-joins
    each count table on its word key (sharded joins — the bigram table is
    corpus-scale state and is NEVER broadcast or collected, exactly how
    distributed KenLM scoring shards its model), then one per-doc
    aggregation. Docs with <2 tokens have no bigrams and are excluded on
    both sides."""
    d = t(spark, sf, "documents").select("doc_id", words("text").alias("__ws"))
    toks = d.select(F.explode("__ws").alias("w"))
    uni = toks.groupBy("w").agg(F.count(F.lit(1)).alias("cu"))
    bi_stream = d.select(
        "doc_id",
        F.explode(
            F.zip_with(
                F.slice("__ws", 1, F.size("__ws") - 1),
                F.slice("__ws", 2, F.size("__ws") - 1),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("bg"),
    ).select("doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    bi = bi_stream.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cb"))
    total = toks.count()  # one scalar (total token occurrences)
    lam = LM_LAMBDA_TENTHS
    scored = (
        bi_stream.join(bi, ["w1", "w2"])
        .join(uni.select(F.col("w").alias("w1"), "cu"), "w1")
        .join(
            uni.select(F.col("w").alias("w2"), F.col("cu").alias("cu2")), "w2"
        )
        .select(
            "doc_id",
            (
                (
                    F.lit(lam) * F.expr("(1000 * cb) DIV cu")
                    + F.lit(10 - lam) * F.expr(f"(1000 * cu2) DIV {total}")
                )
                / F.lit(10)
            ).cast("long").alias("p_milli"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.sum("p_milli").cast("long").alias("score_num"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "score_num",
            F.expr("score_num DIV n_bigrams").alias("avg_p_milli"),
        )
        .orderBy("doc_id")
    )


def _bigram_oracle() -> str:
    lam = LM_LAMBDA_TENTHS
    return f"""
WITH ws AS (
  SELECT doc_id, list_filter(str_split(trim(text), ' '), w -> w <> '') AS w
  FROM documents
), toks AS (
  SELECT unnest(w) AS w FROM ws
), total AS (
  SELECT count(*) AS t FROM toks
), uni AS (
  SELECT w, count(*) AS cu FROM toks GROUP BY w
), bi_stream AS (
  SELECT doc_id, w[i] AS w1, w[i+1] AS w2
  FROM ws, LATERAL (SELECT unnest(generate_series(1, len(w) - 1)) AS i)
), bi AS (
  SELECT w1, w2, count(*) AS cb FROM bi_stream GROUP BY w1, w2
), scored AS (
  SELECT s.doc_id,
         (({lam} * ((1000 * b.cb) // u1.cu)
           + {10 - lam} * ((1000 * u2.cu) // total.t)) // 10)::BIGINT AS p_milli
  FROM bi_stream s
  JOIN bi b USING (w1, w2)
  JOIN uni u1 ON u1.w = s.w1
  JOIN uni u2 ON u2.w = s.w2
  CROSS JOIN total
)
SELECT doc_id,
       count(*)::BIGINT AS n_bigrams,
       sum(p_milli)::BIGINT AS score_num,
       (sum(p_milli) // count(*))::BIGINT AS avg_p_milli
FROM scored GROUP BY doc_id ORDER BY doc_id
"""


TEXT_BIGRAM_LM_ORACLE = _bigram_oracle()


SPECS: list[QuerySpec] = [
    QuerySpec(
        "pipe_paragraph_dedup",
        pipe_paragraph_dedup,
        PIPE_PARAGRAPH_DEDUP_ORACLE,
        "LLM:paragraph-dedup",
    ),
    QuerySpec(
        "pipe_semantic_decontaminate",
        pipe_semantic_decontaminate,
        PIPE_SEMANTIC_DECON_ORACLE,
        "LLM:semantic-decontamination",
    ),
    QuerySpec(
        "text_vocab_coverage",
        text_vocab_coverage,
        TEXT_VOCAB_COVERAGE_ORACLE,
        "LLM:vocab-coverage",
    ),
    QuerySpec(
        "text_bigram_lm_score",
        text_bigram_lm_score,
        TEXT_BIGRAM_LM_ORACLE,
        "LLM:bigram-lm-quality",
    ),
]
