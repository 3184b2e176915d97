"""Seventh LLM-pipeline battery: retrieval-based data selection — the two
corpus-selection primitives between "scored corpus" and "targeted subset".

- ``text_bm25_topk`` — BM25 ranked retrieval over the corpus for a fixed
  query-term set (Robertson/Spärck Jones probabilistic IDF with the +1
  positivity guard, k1/b saturation). This is the workhorse of
  retrieval-based data selection: given a handful of seed terms describing a
  target domain, pull the top-k most relevant documents. Reference analogue:
  the quickstart's filtered scans over keyed tables
  (`/root/reference/spark/src/main/python/quickstart.py`) rank by column
  predicates; BM25 ranks by content relevance — the step a training-data
  pipeline needs that plain predicates can't express.
- ``pipe_dsir_affinity`` — hashed-n-gram importance weighting in the DSIR
  shape (Xie et al. 2023, "Data Selection for Language Models via Importance
  Resampling"): score every raw document by how its bigram-feature mass
  distributes under a target subcorpus versus the raw corpus. The canonical
  form sums log-probability ratios; this implementation keeps the
  exact-integer analogue — per-feature target/raw occurrence counts with
  add-one smoothing, summed as exact BIGINT masses and reduced to a
  ``(1000·t_mass) DIV r_mass`` affinity — so the driver gate hashes exact
  integers instead of boundary-roundable logs (same trick as
  ``text_unigram_lm_score``). Same ranking direction, same pipeline role.

Scale notes per-op; nothing collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hudi_examples_spark.functions.text import shingles_from, words
from hudi_examples_spark.operators.llm_pipeline5 import _docs
from hudi_examples_spark.operators.spec import QuerySpec

#: Fixed seed-term set for the BM25 battery. At production scale the query
#: side is always tiny (a domain description, tens of terms) and broadcast;
#: the corpus side is the 100 TB fact.
BM25_TERMS = ["spark", "merge", "window"]
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 20

#: Feature-table cap for DSIR affinity: only the TOP_F most frequent bigrams
#: (deterministic cut: raw count desc, feature asc) carry their own counts, so
#: the importance table stays broadcastable at corpus scale — the same
#: vocabulary-cap discipline as ``text_unigram_lm_score``'s TOP_V. At test
#: scale the bigram vocabulary is far below the cap, so the cut never bites.
DSIR_TOP_F = 65536
DSIR_TARGET_SOURCE = "src0"


def _bm25_scored(spark: SparkSession, sf: str) -> DataFrame:
    """BM25 scores for every document matching the fixed query-term set.

    Shape: tokens are filtered to the query terms BEFORE the tf shuffle (the
    explode stream drops ~99% of tokens map-side), document length is a
    map-side projection, and both global inputs — the |q|-row df table and
    the 1-row (N, avgdl) stats — broadcast back onto the tf stream. One
    keyed shuffle on (doc_id, term) plus two scalar aggregations; the final
    top-k is a TakeOrdered, never a global sort. At 100 TB nothing here
    grows with the corpus except the one pre-filtered tf aggregation.

    Float discipline: the scoring expression is written with the identical
    operation order as the oracle SQL (per-IEEE-op equivalence), so the only
    divergence source is the two engines' libm ``ln`` (≤1 ulp); scores are
    rounded to 4 decimals before the rank/limit, same as
    ``a_percentile_values``.
    """
    d = _docs(spark, sf).select("doc_id", words("text").alias("__ws"))
    dl = d.select("doc_id", F.size("__ws").alias("dl"))
    stats = dl.agg(
        F.avg("dl").alias("avgdl"), F.count(F.lit(1)).cast("long").alias("n")
    )
    tf = (
        d.select("doc_id", F.explode("__ws").alias("w"))
        .where(F.col("w").isin(BM25_TERMS))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_t = tf.groupBy("w").agg(F.countDistinct("doc_id").alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    sat = (F.col("tf") * F.lit(BM25_K1 + 1.0)) / (
        F.col("tf")
        + F.lit(BM25_K1)
        * (F.lit(1.0 - BM25_B) + F.lit(BM25_B) * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        tf.join(F.broadcast(df_t), "w")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn("addend", idf * sat)
        .groupBy("doc_id")
        .agg(F.sum("addend").alias("s"), F.count(F.lit(1)).alias("n_terms"))
    )
    return scored.select("doc_id", "n_terms", F.round("s", 4).alias("score"))


def text_bm25_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Top-k documents by BM25 score (see :func:`_bm25_scored` for the plan
    shape and float discipline); the final top-k is a TakeOrdered."""
    return (
        _bm25_scored(spark, sf).orderBy(F.desc("score"), "doc_id").limit(BM25_TOPK)
    )


TEXT_BM25_ORACLE = f"""
WITH ws AS (
  SELECT doc_id, list_filter(str_split(trim(text), ' '), w -> w <> '') AS w
  FROM documents
), dl AS (
  SELECT doc_id, len(w) AS dl FROM ws
), stats AS (
  SELECT avg(dl) AS avgdl, count(*)::BIGINT AS n FROM dl
), tf AS (
  SELECT doc_id, w, count(*) AS tf
  FROM (SELECT doc_id, unnest(w) AS w FROM ws)
  WHERE w IN ('spark', 'merge', 'window')
  GROUP BY doc_id, w
), df AS (
  SELECT w, count(DISTINCT doc_id) AS df FROM tf GROUP BY w
), scored AS (
  SELECT tf.doc_id,
         sum(
           ln(1 + (CAST(n - df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))
           * (CAST(tf AS DOUBLE) * {BM25_K1 + 1.0!r})
           / (CAST(tf AS DOUBLE)
              + {BM25_K1!r} * ({1.0 - BM25_B!r}
                               + {BM25_B!r} * CAST(dl.dl AS DOUBLE) / avgdl))
         ) AS s,
         count(*)::BIGINT AS n_terms
  FROM tf
  JOIN df USING (w)
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats
  GROUP BY tf.doc_id
)
SELECT doc_id, n_terms, round(s, 4) AS score
FROM scored
ORDER BY round(s, 4) DESC, doc_id
LIMIT {BM25_TOPK}
"""


def pipe_dsir_affinity(spark: SparkSession, sf: str) -> DataFrame:
    """Target-vs-raw bigram importance affinity per document (DSIR shape).

    Shape: one bigram shuffle builds the capped feature table (raw count +
    target-subcorpus count per bigram, TOP_F deterministic cut), which
    broadcasts back onto the per-document bigram counts — so the only global
    state is the bounded importance table, exactly how DSIR ships its hashed
    n-gram buckets. The per-document aggregation is keyed on doc_id (one
    shuffle); exact BIGINT masses all the way, ``(1000·t_mass) DIV r_mass``
    as the hash-stable affinity. Documents shorter than 2 tokens contribute
    no features and are excluded on both sides.
    """
    d = _docs(spark, sf).select("doc_id", "source", words("text").alias("__ws"))
    bg = d.select(
        "doc_id",
        "source",
        F.explode(
            F.when(F.size("__ws") >= 2, shingles_from(F.col("__ws"), 2)).otherwise(
                F.array().cast("array<string>")
            )
        ).alias("f"),
    )
    feat = (
        bg.groupBy("f")
        .agg(
            F.count(F.lit(1)).alias("c_r"),
            F.sum(
                F.when(F.col("source") == DSIR_TARGET_SOURCE, F.lit(1)).otherwise(
                    F.lit(0)
                )
            ).alias("c_t"),
        )
        .orderBy(F.desc("c_r"), F.asc("f"))
        .limit(DSIR_TOP_F)
    )
    per_doc = bg.groupBy("doc_id", "f").agg(F.count(F.lit(1)).alias("n_f"))
    scored = (
        per_doc.join(F.broadcast(feat), "f")
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("n_f") * (F.col("c_t") + 1)).cast("long").alias("t_mass"),
            F.sum(F.col("n_f") * (F.col("c_r") + 1)).cast("long").alias("r_mass"),
        )
    )
    return scored.select(
        "doc_id",
        "t_mass",
        "r_mass",
        F.expr("(1000 * t_mass) DIV r_mass").alias("affinity_milli"),
    ).orderBy(F.desc("affinity_milli"), "doc_id")


PIPE_DSIR_ORACLE = f"""
WITH ws AS (
  SELECT doc_id, source, list_filter(str_split(trim(text), ' '), w -> w <> '') AS w
  FROM documents
), bg AS (
  SELECT doc_id, source,
         unnest(list_transform(
           range(1, CASE WHEN len(w) > 1 THEN len(w) ELSE 1 END),
           i -> w[i] || ' ' || w[i + 1])) AS f
  FROM ws
), feat AS (
  SELECT f, count(*) AS c_r,
         sum(CASE WHEN source = '{DSIR_TARGET_SOURCE}' THEN 1 ELSE 0 END) AS c_t
  FROM bg GROUP BY f ORDER BY c_r DESC, f ASC LIMIT {DSIR_TOP_F}
), per_doc AS (
  SELECT doc_id, f, count(*) AS n_f FROM bg GROUP BY doc_id, f
), scored AS (
  SELECT doc_id,
         sum(n_f * (c_t + 1))::BIGINT AS t_mass,
         sum(n_f * (c_r + 1))::BIGINT AS r_mass
  FROM per_doc JOIN feat USING (f) GROUP BY doc_id
)
SELECT doc_id, t_mass, r_mass, ((1000 * t_mass) // r_mass)::BIGINT AS affinity_milli
FROM scored ORDER BY affinity_milli DESC, doc_id
"""


#: PQ geometry: 64-dim embeddings → M subspaces of SUBDIM dims; one codeword
#: per (label, subspace) — deterministic label-mean "training", same discipline
#: as sim_ivf_topk's centroids (a k-means refinement slots in unchanged).
PQ_M = 8
PQ_SUBDIM = 8
PQ_TOPK = 10


def sim_pq_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Product-quantization ANN (Jégou et al., the memory-bound 100 TB path):
    compress every embedding to M=8 codes (one per 8-dim subspace), answer the
    query with an ASYMMETRIC-distance scan — sum of precomputed
    ``||q_sub − codeword||²`` table lookups — so ranking touches only the
    8-byte codes, never the raw vectors.

    Spark shape, and why it holds at 100 TB: codebooks are |labels|×M rows
    (tiny — broadcast); encoding is a broadcast join + per-(row, subspace)
    argmin window, linear in the corpus with no vector-side shuffle wider
    than (vec_id, s); the query's ADC lookup table is M×|labels| rows
    (broadcast); the scan is one broadcast join + a groupBy(vec_id) sum over
    M rows each — the raw embedding column is never read again after
    encoding, which is the entire point of PQ at scale (32× less IO than
    brute force here: 64 floats → 8 codes). Distances are double-accumulated
    in the oracle's operation order; codeword margins (label means) are many
    orders above float-sum noise, same determinism argument as
    ``sim_ivf_topk``. Final ranking orders by the ROUNDED distance then
    vec_id on both sides, so the limit boundary is engine-stable."""
    from pyspark.sql.window import Window

    from hudi_examples_spark.functions.vectors import l2_sq
    from hudi_examples_spark.sources.readers import load_sf_table as t

    e = t(spark, sf, "embeddings")
    subs = e.select(
        "vec_id",
        "label",
        F.posexplode(
            F.array(*[F.slice("embedding", s * PQ_SUBDIM + 1, PQ_SUBDIM) for s in range(PQ_M)])
        ).alias("s", "subvec"),
    )
    # codebooks: per-(label, subspace) dimension means, rebuilt as arrays
    cb = (
        subs.select("label", "s", F.posexplode("subvec").alias("i", "v"))
        .groupBy("label", "s", "i")
        .agg(F.avg("v").alias("m"))
        .groupBy("label", "s")
        .agg(F.array_sort(F.collect_list(F.struct("i", "m"))).alias("im"))
        .select(
            F.col("label").alias("cand"),
            "s",
            F.transform("im", lambda x: x["m"]).alias("cw"),
        )
        # materialized once: the codebook (|labels|×M rows — bounded metadata)
        # feeds BOTH the corpus-encoding branch and the query's ADC
        # lookup-table branch; without the checkpoint Catalyst re-runs the
        # full two-level codebook aggregation (scan+explode+2 aggs) per
        # branch (plans/r10/sim_pq_topk_before.txt: 8 parquet scans)
        .localCheckpoint()
    )
    # distance of EVERY subvector (corpus rows and the query alike) to every
    # codeword of its subspace; argmin = the row's code, vec_id 0's row = the
    # query's ADC lookup-table entry for that (s, codeword)
    dists = subs.join(F.broadcast(cb), "s").select(
        "vec_id", "s", "cand", l2_sq("subvec", "cw").alias("dist")
    )
    w = Window.partitionBy("vec_id", "s").orderBy(F.asc("dist"), F.asc("cand"))
    codes = (
        dists.withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") == 1) & (F.col("vec_id") != 0))
        .select("vec_id", "s", F.col("cand").alias("code"))
    )
    lut = dists.filter(F.col("vec_id") == 0).select(
        "s", F.col("cand").alias("code"), F.col("dist").alias("adc_part")
    )
    return (
        codes.join(F.broadcast(lut), ["s", "code"])
        .groupBy("vec_id")
        .agg(F.round(F.sum("adc_part"), 6).alias("adc_dist"))
        .orderBy(F.asc("adc_dist"), F.asc("vec_id"))
        .limit(PQ_TOPK)
    )


SIM_PQ_ORACLE = """
WITH e AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS emb FROM embeddings
), subs AS (
  SELECT vec_id, label, s, emb[s*8+1 : s*8+8] AS subvec
  FROM e, (SELECT unnest(generate_series(0, 7)) AS s)
), cb AS (
  SELECT label AS cand, s, i, avg(subvec[i]) AS m
  FROM (SELECT label, s, subvec, unnest(generate_series(1, 8)) AS i FROM subs)
  GROUP BY label, s, i
), dists AS (
  SELECT sub.vec_id, sub.s, cb.cand, sum((sub.v - cb.m) * (sub.v - cb.m)) AS dist
  FROM (SELECT vec_id, s, i, subvec[i] AS v
        FROM (SELECT vec_id, s, subvec, unnest(generate_series(1, 8)) AS i FROM subs)) sub
  JOIN cb ON cb.s = sub.s AND cb.i = sub.i
  GROUP BY sub.vec_id, sub.s, cb.cand
), codes AS (
  SELECT vec_id, s, cand AS code
  FROM (SELECT vec_id, s, cand,
               row_number() OVER (PARTITION BY vec_id, s ORDER BY dist ASC, cand ASC) AS rn
        FROM dists)
  WHERE rn = 1 AND vec_id <> 0
), lut AS (
  SELECT s, cand AS code, dist AS adc_part FROM dists WHERE vec_id = 0
)
SELECT codes.vec_id, round(sum(lut.adc_part), 6) AS adc_dist
FROM codes JOIN lut ON lut.s = codes.s AND lut.code = codes.code
GROUP BY codes.vec_id
ORDER BY adc_dist ASC, codes.vec_id ASC
LIMIT 10
"""


#: RRF fusion knobs: depth of each input ranking, the standard k=60 damping,
#: and the fused top-k returned.
RRF_DEPTH = 50
RRF_K = 60
RRF_TOPK = 20


def sim_rrf_fusion(spark: SparkSession, sf: str) -> DataFrame:
    """Hybrid retrieval by reciprocal-rank fusion (Cormack et al.): fuse the
    BM25 lexical ranking and the embedding-cosine semantic ranking with
    ``Σ 1/(k + rank)`` — the standard score-free combiner behind every
    hybrid-search stack, and the data-selection step that catches documents
    either signal alone misses.

    Both input rankings are deterministic (scores rounded before ranking,
    doc_id tiebreak) and depth-capped at RRF_DEPTH, so each side of the
    fusion is a tiny list: the fusion itself is a full outer join of two
    ≤50-row broadcasts — at 100 TB the cost lives entirely in the two input
    rankings, which are each one pre-filtered shuffle + a TakeOrdered (see
    ``_bm25_scored`` / the brute-cosine note). The fused score sums exactly
    two IEEE divisions of small integers in a fixed order, so it is
    bit-stable across engines; ranking orders by the rounded fusion then
    doc_id. Absent-from-one-list ranks surface as NULL (same on both sides)."""
    from hudi_examples_spark.functions.vectors import cosine_similarity
    from hudi_examples_spark.sources.readers import load_sf_table as t

    from pyspark.sql.window import Window

    # depth-cap FIRST via TakeOrdered (distributed), THEN rank: the global
    # row_number window only ever sees the ≤RRF_DEPTH survivors, so the
    # single-partition window is O(depth), not O(corpus)
    bm25 = (
        _bm25_scored(spark, sf)
        .filter(F.col("doc_id") != 0)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(RRF_DEPTH)
        .withColumn(
            "bm25_rank",
            F.row_number().over(Window.orderBy(F.desc("score"), F.asc("doc_id"))),
        )
        .select("doc_id", "bm25_rank")
    )
    e = t(spark, sf, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q_emb"))
    cos = (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(cosine_similarity("embedding", "q_emb"), 6).alias("c"),
        )
        .orderBy(F.desc("c"), F.asc("doc_id"))
        .limit(RRF_DEPTH)
        .withColumn(
            "cos_rank",
            F.row_number().over(Window.orderBy(F.desc("c"), F.asc("doc_id"))),
        )
        .select("doc_id", "cos_rank")
    )
    fused = bm25.join(cos, "doc_id", "full_outer").select(
        "doc_id",
        "bm25_rank",
        "cos_rank",
        F.round(
            F.coalesce(F.lit(1.0) / (F.lit(RRF_K) + F.col("bm25_rank")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (F.lit(RRF_K) + F.col("cos_rank")), F.lit(0.0)),
            9,
        ).alias("rrf"),
    )
    return fused.orderBy(F.desc("rrf"), F.asc("doc_id")).limit(RRF_TOPK)


SIM_RRF_ORACLE = f"""
WITH ws AS (
  SELECT doc_id, list_filter(str_split(trim(text), ' '), w -> w <> '') AS w
  FROM documents
), dl AS (
  SELECT doc_id, len(w) AS dl FROM ws
), stats AS (
  SELECT avg(dl) AS avgdl, count(*)::BIGINT AS n FROM dl
), tf AS (
  SELECT doc_id, w, count(*) AS tf
  FROM (SELECT doc_id, unnest(w) AS w FROM ws)
  WHERE w IN ('spark', 'merge', 'window')
  GROUP BY doc_id, w
), df AS (
  SELECT w, count(DISTINCT doc_id) AS df FROM tf GROUP BY w
), scored AS (
  SELECT tf.doc_id,
         sum(
           ln(1 + (CAST(n - df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))
           * (CAST(tf AS DOUBLE) * {BM25_K1 + 1.0!r})
           / (CAST(tf AS DOUBLE)
              + {BM25_K1!r} * ({1.0 - BM25_B!r}
                               + {BM25_B!r} * CAST(dl.dl AS DOUBLE) / avgdl))
         ) AS s
  FROM tf
  JOIN df USING (w)
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats
  GROUP BY tf.doc_id
), bm25 AS (
  SELECT doc_id, bm25_rank FROM (
    SELECT doc_id,
           row_number() OVER (ORDER BY round(s, 4) DESC, doc_id ASC) AS bm25_rank
    FROM scored WHERE doc_id <> 0
  ) WHERE bm25_rank <= {RRF_DEPTH}
), q AS (
  SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0
), cos AS (
  SELECT doc_id, cos_rank FROM (
    SELECT vec_id AS doc_id,
           row_number() OVER (
             ORDER BY round(list_cosine_similarity(embedding::DOUBLE[], q_emb::DOUBLE[]), 6) DESC,
                      vec_id ASC
           ) AS cos_rank
    FROM embeddings, q WHERE vec_id <> 0
  ) WHERE cos_rank <= {RRF_DEPTH}
)
SELECT COALESCE(bm25.doc_id, cos.doc_id) AS doc_id,
       bm25.bm25_rank, cos.cos_rank,
       round(COALESCE(1.0 / ({RRF_K} + bm25.bm25_rank), 0.0)
             + COALESCE(1.0 / ({RRF_K} + cos.cos_rank), 0.0), 9) AS rrf
FROM bm25 FULL OUTER JOIN cos ON bm25.doc_id = cos.doc_id
ORDER BY rrf DESC, doc_id ASC
LIMIT {RRF_TOPK}
"""


SPECS = [
    QuerySpec("text_bm25_topk", text_bm25_topk, TEXT_BM25_ORACLE, "A3,O1 retrieval"),
    QuerySpec("sim_rrf_fusion", sim_rrf_fusion, SIM_RRF_ORACLE, "hybrid retrieval RRF"),
    QuerySpec("pipe_dsir_affinity", pipe_dsir_affinity, PIPE_DSIR_ORACLE, "A3 selection"),
    QuerySpec("sim_pq_topk", sim_pq_topk, SIM_PQ_ORACLE, "LLM:sim PQ/ADC"),
]
