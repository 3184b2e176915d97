"""Round-11 A/B: cosine_similarity variants per consumer shape (VERDICT item 1).

Variants (all value-identical: every accumulator folds left-to-right over the
same elements in the same order; the scalar combination is the same
``sqrt(na)*sqrt(nb)`` test and quotient):

- fused   : r10 form — one zip_with producing a 3-field struct per element +
            one struct-accumulator fold (current library implementation).
- prim3   : three separate primitive folds (dot, sum x^2, sum y^2) — no struct
            allocation; the double-cast inputs and the three fold results are
            each bound ONCE via the 1-element transform(array(struct(...)))
            trick, so nothing is evaluated twice.
- fold5   : pre-r10 naive form (when(l2*l2==0).otherwise(dot/(l2*l2))) — five
            folds, two evaluated twice; reference point only.

Usage: python tools/ab_cosine.py [--sf DIR] [--passes N]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hudi_examples_spark.session import get_spark
from hudi_examples_spark.sources.readers import load_sf_table as t


def _as_double(col):
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def cosine_fused(a, b) -> Column:
    stats = F.aggregate(
        F.zip_with(
            _as_double(a),
            _as_double(b),
            lambda x, y: F.struct((x * y).alias("d"), (x * x).alias("na"), (y * y).alias("nb")),
        ),
        F.struct(F.lit(0.0).alias("d"), F.lit(0.0).alias("na"), F.lit(0.0).alias("nb")),
        lambda acc, s: F.struct(
            (acc["d"] + s["d"]).alias("d"),
            (acc["na"] + s["na"]).alias("na"),
            (acc["nb"] + s["nb"]).alias("nb"),
        ),
    )
    return F.transform(
        F.array(stats),
        lambda s: F.when(F.sqrt(s["na"]) * F.sqrt(s["nb"]) == 0.0, F.lit(0.0)).otherwise(
            s["d"] / (F.sqrt(s["na"]) * F.sqrt(s["nb"]))
        ),
    )[0]


def cosine_prim3(a, b) -> Column:
    def combine(x, y):
        d = F.aggregate(F.zip_with(x, y, lambda u, v: u * v), F.lit(0.0), lambda acc, u: acc + u)
        na = F.aggregate(x, F.lit(0.0), lambda acc, u: acc + u * u)
        nb = F.aggregate(y, F.lit(0.0), lambda acc, u: acc + u * u)
        return F.transform(
            F.array(F.struct(d.alias("d"), na.alias("na"), nb.alias("nb"))),
            lambda s: F.when(F.sqrt(s["na"]) * F.sqrt(s["nb"]) == 0.0, F.lit(0.0)).otherwise(
                s["d"] / (F.sqrt(s["na"]) * F.sqrt(s["nb"]))
            ),
        )[0]

    return F.transform(
        F.array(F.struct(_as_double(a).alias("x"), _as_double(b).alias("y"))),
        lambda s: combine(s["x"], s["y"]),
    )[0]


def cosine_fold5(a, b) -> Column:
    def dot(x, y):
        return F.aggregate(F.zip_with(_as_double(x), _as_double(y), lambda u, v: u * v), F.lit(0.0), lambda acc, u: acc + u)

    def l2(x):
        return F.sqrt(F.aggregate(_as_double(x), F.lit(0.0), lambda acc, u: acc + u * u))

    return F.when(l2(a) * l2(b) == 0.0, F.lit(0.0)).otherwise(dot(a, b) / (l2(a) * l2(b)))


VARIANTS = {"fused": cosine_fused, "prim3": cosine_prim3, "fold5": cosine_fold5}


def knn_shape(spark, sf, cos) -> DataFrame:
    """sim_knn_join: corpus x 5-query cross join + per-query window top-3."""
    from pyspark.sql.window import Window

    e = t(spark, sf, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    scored = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id", F.round(cos("embedding", "q_emb"), 6).alias("cos_sim"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), "vec_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("q_id", "vec_id", "cos_sim", "rank")
        .orderBy("q_id", "rank")
    )


def brute_shape(spark, sf, cos) -> DataFrame:
    """sim_brute_topk: corpus x 1-query broadcast + global top-10."""
    e = t(spark, sf, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q_emb"))
    return (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != 0)
        .select("vec_id", F.round(cos("embedding", "q_emb"), 6).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), "vec_id")
        .limit(10)
    )


def pair_shape(spark, sf, cos) -> DataFrame:
    """dedup_semantic-style: self-join pair rescore (emb1 x emb2 per pair row)."""
    e = t(spark, sf, "embeddings")
    a = e.select(F.col("vec_id").alias("d1"), F.col("embedding").alias("emb1"))
    b = e.select(F.col("vec_id").alias("d2"), F.col("embedding").alias("emb2"))
    pairs = a.join(b, (F.col("d1") % 64) == (F.col("d2") % 64)).filter(F.col("d1") < F.col("d2"))
    return pairs.select("d1", "d2", F.round(cos("emb1", "emb2"), 6).alias("cos_sim")).filter(
        F.col("cos_sim") >= 0.4
    )


SHAPES = {"knn": knn_shape, "brute": brute_shape, "pairs": pair_shape}


def main() -> None:
    sf = "/root/testdata/sf0.1"
    passes = 3
    args = iter(sys.argv[1:])
    for a in args:
        if a == "--sf":
            sf = next(args)
        elif a == "--passes":
            passes = int(next(args))

    spark = get_spark(app_name="ab-cosine")
    spark.sparkContext.setLogLevel("ERROR")

    # cross-check: all variants must produce identical rows on the knn shape
    rows = {}
    for vname, cos in VARIANTS.items():
        rows[vname] = [tuple(r) for r in knn_shape(spark, sf, cos).collect()]
    assert rows["fused"] == rows["prim3"] == rows["fold5"], "variants diverge!"
    print(f"value check OK ({len(rows['fused'])} rows identical across variants)")

    for sname, shape in SHAPES.items():
        for vname, cos in VARIANTS.items():
            # warm pass (codegen hot)
            shape(spark, "/root/testdata/sf0.001", cos).write.format("noop").mode("overwrite").save()
            best = float("inf")
            for _ in range(passes):
                t0 = time.monotonic()
                shape(spark, sf, cos).write.format("noop").mode("overwrite").save()
                best = min(best, time.monotonic() - t0)
            print(f"{sname:8s} {vname:8s} min-of-{passes}: {best:.3f}s")


if __name__ == "__main__":
    main()
