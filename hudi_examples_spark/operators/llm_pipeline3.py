"""Third LLM-pipeline battery: corpus splitting, sequence packing, dup clustering.

Rounds out the training-data surface of ``llm_pipeline{,2}.py`` with the three
ops every pretraining data pipeline runs between "deduped corpus" and "tensors":

- ``pipe_hash_split`` — deterministic train/val/test assignment by content
  hash (re-running the pipeline never migrates a document across splits, and
  exact duplicates land in the SAME split — no train/test leakage);
- ``pipe_pack_sequences`` — concat-and-chunk context-window packing: documents
  stream in order into fixed token windows (docs may span windows), sharded so
  packing is embarrassingly parallel;
- ``dedup_clusters`` — connected components over the near-dup pair graph
  (pairs only say "a~b"; dedup must drop whole CLUSTERS, keeping one
  representative per component, or transitive dups survive pairwise removal).

Scale notes per-op; nothing collects to the driver beyond bounded loop scalars.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hudi_examples_spark.functions.text import token_count
from hudi_examples_spark.operators.llm_pipeline import (
    DEDUP_JACCARD_ORACLE,
    dedup_ngram_jaccard,
)
from hudi_examples_spark.operators.spec import QuerySpec
from hudi_examples_spark.sources.readers import load_sf_table as t

# ---------------------------------------------------------------------------
# Deterministic train/val/test split
# ---------------------------------------------------------------------------


def split_assignment_expr():
    """THE train/val/test assignment as a Column over ``text`` — the single
    definition every consumer shares (pipe_hash_split, the leakage audit via
    composition, pipe_semantic_decontaminate's eval-slice selector), so the
    split audited is always the split assigned. Content hash, engine-portable
    (two md5 hex chars through ascii(); 80/10/10 on the 0..99 bucket)."""
    h = F.md5("text")
    bucket = (F.ascii(F.substring(h, 1, 1)) * 16 + F.ascii(F.substring(h, 2, 1))) % 100
    return (
        F.when(bucket < 80, F.lit("train"))
        .when(bucket < 90, F.lit("val"))
        .otherwise(F.lit("test"))
    )


def pipe_hash_split(spark: SparkSession, sf: str) -> DataFrame:
    """80/10/10 split keyed on md5(text) — pure per-row projection, no shuffle.

    The bucket is a function of CONTENT, not position: appends/reorders of the
    corpus never move a doc between splits, and byte-identical duplicates
    always co-locate in one split (no leakage). Engine-portable bucket: two
    hex chars of the md5 mapped through ascii(), so the DuckDB oracle computes
    the identical assignment."""
    d = t(spark, sf, "documents")
    return d.select(
        "doc_id",
        split_assignment_expr().alias("split"),
        token_count("text").alias("n_tokens"),
    ).orderBy("doc_id")


PIPE_HASH_SPLIT_ORACLE = """
SELECT doc_id,
       CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split,
       CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT) AS n_tokens
FROM (
  SELECT doc_id, text,
         (ascii(substr(md5(text), 1, 1)) * 16 + ascii(substr(md5(text), 2, 1))) % 100 AS b
  FROM documents
)
ORDER BY doc_id
"""

# ---------------------------------------------------------------------------
# Context-window sequence packing
# ---------------------------------------------------------------------------


def pipe_pack_sequences(spark: SparkSession, sf: str, ctx: int = 512, n_shards: int = 8) -> DataFrame:
    """Concat-and-chunk packing: per shard, documents concatenate in doc_id
    order and slice into ``ctx``-token windows (docs may span windows — the
    standard pretraining tokenizer-packing layout). Emits each doc's window
    span.

    Scale shape: ONE running-sum window function partitioned by shard — the
    sequential recurrence parallelizes across shards (a 100 TB corpus packs as
    thousands of independent shards), never as one global ordering."""
    d = t(spark, sf, "documents").select(
        "doc_id",
        (F.col("doc_id") % n_shards).alias("shard"),
        token_count("text").alias("n_tokens"),
    )
    w = Window.partitionBy("shard").orderBy("doc_id")
    cum = F.sum("n_tokens").over(w)
    start = cum - F.col("n_tokens")
    return d.select(
        "doc_id",
        "shard",
        "n_tokens",
        F.floor(start / ctx).cast("bigint").alias("w_start"),
        F.floor((cum - 1) / ctx).cast("bigint").alias("w_end"),
    ).orderBy("doc_id")


PIPE_PACK_ORACLE = """
WITH toks AS (
  SELECT doc_id, doc_id % 8 AS shard,
         CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT) AS n_tokens
  FROM documents
), cums AS (
  SELECT doc_id, shard, n_tokens,
         sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id) AS cum
  FROM toks
)
SELECT doc_id, shard, n_tokens,
       CAST(floor((cum - n_tokens) / 512.0) AS BIGINT) AS w_start,
       CAST(floor((cum - 1) / 512.0) AS BIGINT) AS w_end
FROM cums
ORDER BY doc_id
"""

# ---------------------------------------------------------------------------
# Near-dup connected components
# ---------------------------------------------------------------------------


def dedup_clusters(spark: SparkSession, sf: str, max_iters: int = 15) -> DataFrame:
    """Duplicate CLUSTERS from the exact-Jaccard pair graph: min-label
    propagation until fixpoint — every doc in a component labels itself with
    the component's smallest doc_id (the canonical representative to keep).

    Scale shape: each iteration is one equi-join shuffle on the edge list and
    converges in O(component diameter) rounds (near-dup components are tiny —
    star-shaped around a source doc); the loop's only driver traffic is the
    one-row convergence count. This is the standard large-scale connected-
    components layout (label propagation, cf. Kiveris et al. "Connected
    Components in MapReduce"); lineage is cut per round with a local
    checkpoint so plans stay O(1) deep."""
    # materialize the Jaccard pair front once (r10): the symmetric-edge union
    # references `pairs` twice, and Catalyst re-ran the whole shingle +
    # min-hash + pair-score front per reference (the dominant cost here)
    pairs = dedup_ngram_jaccard(spark, sf).select("d1", "d2").localCheckpoint(
        eager=False
    )
    edges = (
        pairs.unionByName(pairs.select(F.col("d2").alias("d1"), F.col("d1").alias("d2")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("d1").alias("doc_id"))
        .distinct()
        .withColumn("label", F.col("doc_id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iters):
        nbr = edges.join(
            labels.select(F.col("doc_id").alias("d2"), F.col("label").alias("nl")), "d2"
        ).groupBy(F.col("d1").alias("doc_id")).agg(F.min("nl").alias("nmin"))
        # carry the changed flag THROUGH the checkpoint (r10): the old form
        # re-joined new vs old labels for the convergence count — a whole
        # extra shuffle per round; the flag is decided in the same join that
        # builds the new labels, and the count folds over checkpoint blocks
        new_labels = (
            labels.join(nbr, "doc_id", "left")
            .select(
                "doc_id",
                F.least(F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))).alias(
                    "__new_label"
                ),
                F.col("label").alias("__old_label"),
            )
            .select(
                "doc_id",
                F.col("__new_label").alias("label"),
                (F.col("__new_label") != F.col("__old_label")).alias("__changed"),
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.agg(
            F.sum(F.col("__changed").cast("long")).alias("c")
        ).collect()[0]["c"]
        labels = new_labels.select("doc_id", "label")
        if not changed:
            break
    return labels.select("doc_id", F.col("label").alias("cluster_id")).orderBy("doc_id")


# transitive closure over the same pair graph (small components at oracle SF)
DEDUP_CLUSTERS_ORACLE = f"""
WITH RECURSIVE pairs AS (
  {DEDUP_JACCARD_ORACLE}
), edges AS (
  SELECT d1, d2 FROM pairs UNION SELECT d2 AS d1, d1 AS d2 FROM pairs
), reach AS (
  SELECT d1 AS src, d2 AS dst FROM edges
  UNION
  SELECT r.src, e.d2 FROM reach r JOIN edges e ON e.d1 = r.dst
)
SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
FROM reach GROUP BY src ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Canonical-document selection per duplicate cluster
# ---------------------------------------------------------------------------


def dedup_keep_best(spark: SparkSession, sf: str) -> DataFrame:
    """Canonical selection: collapse each near-dup cluster to its single
    highest-quality member (argmax quality score, ties → smallest doc_id) —
    the step every dedup pipeline runs after clustering, since keeping the
    min-id representative throws away the best-written copy.

    Scale shape: cluster labels and per-doc quality scores join on doc_id
    (both corpus-keyed — an equi-join shuffle, no broadcast assumption since
    at 100 TB the cluster table is corpus-sized), then one window per
    cluster_id; clusters are tiny so the window state is bounded. Emits one
    row per cluster with the keeper and the drop count."""
    from hudi_examples_spark.operators.llm_pipeline5 import with_quality_columns

    clusters = dedup_clusters(spark, sf)
    scores = with_quality_columns(
        t(spark, sf, "documents").select("doc_id", "text")
    ).select("doc_id", "q_num")
    members = clusters.join(scores, "doc_id")
    w = Window.partitionBy("cluster_id").orderBy(F.desc("q_num"), F.asc("doc_id"))
    ranked = members.withColumn("rn", F.row_number().over(w))
    return (
        ranked.groupBy("cluster_id")
        .agg(
            F.max(F.when(F.col("rn") == 1, F.col("doc_id"))).alias("keep_doc_id"),
            F.max(F.when(F.col("rn") == 1, F.col("q_num"))).alias("best_q_num"),
            F.count(F.lit(1)).alias("n_members"),
        )
        .withColumn("n_dropped", F.col("n_members") - 1)
        .orderBy("cluster_id")
    )


def _keep_best_oracle() -> str:
    from hudi_examples_spark.operators.llm_pipeline5 import quality_sql

    return f"""
WITH RECURSIVE pairs AS (
  {DEDUP_JACCARD_ORACLE}
), edges AS (
  SELECT d1, d2 FROM pairs UNION SELECT d2 AS d1, d1 AS d2 FROM pairs
), reach AS (
  SELECT d1 AS src, d2 AS dst FROM edges
  UNION
  SELECT r.src, e.d2 FROM reach r JOIN edges e ON e.d1 = r.dst
), clusters AS (
  SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
  FROM reach GROUP BY src
), q AS (
  SELECT doc_id, q_num FROM ({quality_sql("doc_id")})
), ranked AS (
  SELECT c.cluster_id, c.doc_id, q.q_num,
         row_number() OVER (PARTITION BY c.cluster_id ORDER BY q.q_num DESC, c.doc_id ASC) AS rn
  FROM clusters c JOIN q USING (doc_id)
)
SELECT cluster_id,
       max(CASE WHEN rn = 1 THEN doc_id END) AS keep_doc_id,
       max(CASE WHEN rn = 1 THEN q_num END) AS best_q_num,
       count(*) AS n_members,
       count(*) - 1 AS n_dropped
FROM ranked GROUP BY cluster_id ORDER BY cluster_id
"""


DEDUP_KEEP_BEST_ORACLE = _keep_best_oracle()


def pipe_split_leakage(spark: SparkSession, sf: str) -> DataFrame:
    """Cross-split contamination audit: every near-duplicate pair annotated
    with its documents' train/val/test assignments and a ``leaks`` flag for
    pairs straddling a split boundary — the check a pipeline runs AFTER
    splitting, because the content-hash split co-locates byte-identical
    duplicates but NEAR-duplicates (template churn, edits) can still land on
    opposite sides and leak evaluation signal into training.

    Pure composition of two certified plans: the DF-capped shingle-Jaccard
    pair join and the per-row hash-split projection, stitched by two
    broadcast-size key joins. No new shuffle beyond what the pair join
    already does; at 100 TB the pair source swaps to the minhash/LSH
    variant with the same downstream shape."""
    pairs = dedup_ngram_jaccard(spark, sf)
    splits = pipe_hash_split(spark, sf).select("doc_id", "split")
    s1 = splits.select(F.col("doc_id").alias("d1"), F.col("split").alias("split1"))
    s2 = splits.select(F.col("doc_id").alias("d2"), F.col("split").alias("split2"))
    return (
        pairs.join(s1, "d1")
        .join(s2, "d2")
        .select(
            "d1",
            "d2",
            "jaccard",
            "split1",
            "split2",
            F.when(F.col("split1") != F.col("split2"), 1)
            .otherwise(0)
            .cast("long")
            .alias("leaks"),
        )
        .orderBy("d1", "d2")
    )


PIPE_SPLIT_LEAKAGE_ORACLE = f"""
WITH splits AS (
  SELECT doc_id,
         CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split
  FROM (
    SELECT doc_id,
           (ascii(substr(md5(text), 1, 1)) * 16 + ascii(substr(md5(text), 2, 1))) % 100 AS b
    FROM documents
  )
)
SELECT p.d1, p.d2, p.jaccard, sa.split AS split1, sb.split AS split2,
       (CASE WHEN sa.split <> sb.split THEN 1 ELSE 0 END)::BIGINT AS leaks
FROM ({DEDUP_JACCARD_ORACLE}) p
JOIN splits sa ON sa.doc_id = p.d1
JOIN splits sb ON sb.doc_id = p.d2
ORDER BY p.d1, p.d2
"""


SPECS: list[QuerySpec] = [
    QuerySpec("pipe_hash_split", pipe_hash_split, PIPE_HASH_SPLIT_ORACLE, "LLM:split"),
    QuerySpec("pipe_pack_sequences", pipe_pack_sequences, PIPE_PACK_ORACLE, "LLM:packing"),
    QuerySpec("dedup_clusters", dedup_clusters, DEDUP_CLUSTERS_ORACLE, "LLM:dedup-clusters"),
    QuerySpec("dedup_keep_best", dedup_keep_best, DEDUP_KEEP_BEST_ORACLE, "LLM:dedup-canonical"),
    QuerySpec(
        "pipe_split_leakage",
        pipe_split_leakage,
        PIPE_SPLIT_LEAKAGE_ORACLE,
        "LLM:cross-split near-dup contamination audit",
    ),
]
