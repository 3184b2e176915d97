"""Vector math over ``array<float>`` embedding columns — pure Column expressions.

Design for scale: these compile to Catalyst higher-order functions (``zip_with`` /
``aggregate``) that run inside the JVM per-row with no Python round-trip and no UDF
serialization; they vectorize fine across 100 TB because they are ordinary projections.
A Pandas-UDF path would only win if we batched into BLAS matmuls — that variant lives in
the ANN operator (`operators/llm_pipeline.py`) where the batch shape justifies it.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two float-array columns, accumulated in double."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    """Euclidean norm of a float-array column."""
    return F.sqrt(F.aggregate(_as_double(a), F.lit(0.0), lambda acc, x: acc + x * x))


def l2_sq(a: Column | str, b: Column | str) -> Column:
    """Squared euclidean distance of two float-array columns, in double —
    left-to-right accumulation, the order the PQ oracle mirrors."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; 0.0 for zero-norm inputs rather than NaN.

    Three primitive folds, everything bound once (r11). History: the pre-r10
    naive ``when(l2(a)*l2(b)==0, 0).otherwise(dot(a,b)/(l2(a)*l2(b)))``
    evaluated FIVE folds per row (two norms twice); r10 fused them into ONE
    fold accumulating a (Σxy, Σx², Σy²) struct — but that allocates a 3-field
    struct per array element in the ``zip_with`` plus a struct accumulator per
    fold step, and the r10 PERF artifact caught it ~40% SLOWER on the
    brute-force cross-join shape (sim_knn_join 0.65→1.05 s). The r11 A/B
    (tools/ab_cosine.py) shows three SEPARATE primitive folds — no struct
    allocation anywhere — win on every consumer shape: knn cross-join
    1.09→0.86 s, 1-query brute 0.47→0.36 s, pair rescore 1.27→0.69 s vs the
    fused form at sf0.1. The double-cast inputs bind once through a 1-element
    ``transform(array(struct(x, y)))``, and the three fold results bind once
    the same way, so no subtree is evaluated twice. Value-identical to both
    prior forms: each accumulator folds left-to-right over the same elements
    in the same order, and the scalar combination is the same
    ``sqrt(Σx²)·sqrt(Σy²)`` test and quotient."""

    def combine(x: Column, y: Column) -> Column:
        d = F.aggregate(
            F.zip_with(x, y, lambda u, v: u * v), F.lit(0.0), lambda acc, u: acc + u
        )
        na = F.aggregate(x, F.lit(0.0), lambda acc, u: acc + u * u)
        nb = F.aggregate(y, F.lit(0.0), lambda acc, u: acc + u * u)
        return F.transform(
            F.array(F.struct(d.alias("d"), na.alias("na"), nb.alias("nb"))),
            lambda s: F.when(
                F.sqrt(s["na"]) * F.sqrt(s["nb"]) == 0.0, F.lit(0.0)
            ).otherwise(s["d"] / (F.sqrt(s["na"]) * F.sqrt(s["nb"]))),
        )[0]

    return F.transform(
        F.array(F.struct(_as_double(a).alias("x"), _as_double(b).alias("y"))),
        lambda s: combine(s["x"], s["y"]),
    )[0]


def lsh_multi_table_buckets(
    a: Column | str, tables: list[list[list[float]]]
) -> Column:
    """Multi-table hyperplane LSH: one bucket id per hash table, as an
    ``array<bigint>``. Near-dup candidates collide in ≥1 table — multiple
    independent tables trade a constant-factor more shuffle rows (|tables|× on
    explode) for exponentially better recall at a fixed per-table selectivity,
    the standard ANN construction. Table index is baked into the bucket id so a
    single (bucket) equi-join key suffices downstream."""
    # bind the double-cast input ONCE for all tables' plane dots (r10: the
    # per-plane ``dot`` re-ran the cast transform — |tables|×|planes| times)
    def buckets_from(base: Column) -> Column:
        cols = []
        for ti, planes in enumerate(tables):
            bucket = _hyperplane_bits_precast(base, planes)
            # disjoint bucket spaces per table: shift in the table index
            cols.append(bucket + F.lit(ti << 56).cast("bigint"))
        return F.array(*cols)

    return F.transform(
        F.array(F.struct(_as_double(a).alias("e"))), lambda s: buckets_from(s["e"])
    )[0]


def lsh_hyperplane_bits(a: Column | str, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH signature: one bit per plane (sign of dot product),
    packed into a BIGINT bucket id. ``planes`` must be driver-side constants
    (seeded, ≤ 63 planes) so the expression is a pure literal tree — executors
    evaluate it with no shuffle and no Python.
    """
    return _hyperplane_bits_precast(_as_double(a), planes)


def _hyperplane_bits_precast(base: Column, planes: list[list[float]]) -> Column:
    """``lsh_hyperplane_bits`` over an ALREADY double-cast array expression —
    callers that evaluate many plane dots bind the cast once (r10)."""
    if len(planes) > 63:
        raise ValueError("at most 63 hyperplanes (bits of a signed 64-bit bucket id)")
    bucket = F.lit(0).cast("bigint")
    for i, plane in enumerate(planes):
        plane_col = F.array(*[F.lit(float(v)) for v in plane])
        d = F.aggregate(
            F.zip_with(base, plane_col, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bit = F.when(d >= 0, F.lit(1).cast("bigint")).otherwise(F.lit(0).cast("bigint"))
        bucket = bucket + (bit * F.lit(1 << i).cast("bigint"))
    return bucket
