"""Generate a larger scale factor by replicating /root/testdata/sf0.1 with
key-shifted copies (referential integrity preserved): customer/supplier/part/
orders/lineitem foreign keys shift together; events/documents/embeddings get
disjoint id spaces per replica. region/nation are dimension constants.

This exists for the sf1 parity sweep (judge round 4, item #8): the driver only
ships sf{0.001,0.01,0.1}, and a 10× step catches scale-sensitive bugs (spill
paths, skew, integer bounds in exact oracles). Types are preserved exactly —
notably events.ts stays TIMESTAMP(NANOS), which Spark 4 only reads via
nanosAsLong (tests/harness + load_sf_table depend on that shape).

Usage: python tools/make_scaled_sf.py [factor] [out_dir] [table ...]
       (defaults: 10, /root/repo/.scaled/sf1, all tables)

When tables are named, only those are replicated; every other table is
HARDLINKED from the sf0.1 source (zero bytes). That is the judge-round-5
item #6 shape: the token-heavy family (substring dedup, BPE, span
corruption, winnowing) only reads ``documents``, so another decade of scale
needs one table, not nine.
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

#: per-table key columns to shift per replica (column -> span source column)
SHIFTS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
#: key spaces shared across tables: shift spans must match on both sides
SPAN_SOURCE = {
    "c_custkey": ("customer", "c_custkey"),
    "o_custkey": ("customer", "c_custkey"),
    "o_orderkey": ("orders", "o_orderkey"),
    "l_orderkey": ("orders", "o_orderkey"),
    "p_partkey": ("part", "p_partkey"),
    "l_partkey": ("part", "p_partkey"),
    "s_suppkey": ("supplier", "s_suppkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("embeddings", "vec_id"),
}


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scaled/sf1"
    only = set(sys.argv[3:])  # empty = scale everything
    os.makedirs(out_dir, exist_ok=True)

    spans: dict[str, int] = {}
    for col, (tbl, src_col) in SPAN_SOURCE.items():
        if col not in spans:
            t = pq.read_table(os.path.join(SRC, f"{tbl}.parquet"), columns=[src_col])
            spans[col] = int(pc.max(t[src_col]).as_py()) + 1

    for tbl in ["region", "nation", *SHIFTS]:
        dest = os.path.join(out_dir, f"{tbl}.parquet")
        if only and tbl not in only and tbl not in ("region", "nation"):
            # not under scale for this run: hardlink the sf0.1 original so
            # every view still resolves, at zero bytes
            if os.path.exists(dest):
                os.remove(dest)
            try:
                os.link(os.path.join(SRC, f"{tbl}.parquet"), dest)
            except OSError:
                import shutil

                shutil.copy2(os.path.join(SRC, f"{tbl}.parquet"), dest)
            print(f"{tbl}: linked from sf0.1")
            continue
        # CRITICAL: a prior subset run may have left ``dest`` as a HARDLINK
        # into /root/testdata — pq.write_table opens the existing inode and
        # would truncate the READ-ONLY ORIGINAL through the link (root
        # bypasses the mode bits). Check the inode FIRST (while dest still
        # exists, so the check can actually fire), then unlink so the write
        # lands on a fresh inode either way.
        src_path = os.path.join(SRC, f"{tbl}.parquet")
        if os.path.exists(dest):
            if os.path.samefile(dest, src_path):
                print(f"{tbl}: dest shares an inode with the source; unlinking before write")
            os.remove(dest)
        src = pq.read_table(src_path)
        if tbl in ("region", "nation"):
            out = src
        else:
            copies = []
            for i in range(factor):
                t = src
                for col in SHIFTS[tbl]:
                    idx = t.schema.get_field_index(col)
                    shifted = pc.add(t[col], pa.scalar(i * spans[col], type=t[col].type))
                    t = t.set_column(idx, t.schema.field(idx), shifted)
                copies.append(t)
            out = pa.concat_tables(copies)
        pq.write_table(
            out,
            dest,
            coerce_timestamps=None,  # keep TIMESTAMP(NANOS) as-is
            store_schema=True,
        )
        print(f"{tbl}: {src.num_rows} -> {out.num_rows} rows")


if __name__ == "__main__":
    main()
