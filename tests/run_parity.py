"""Full driver-style parity sweep at sf0.01 (what CORRECTNESS_r{N}.json will see).

Usage: python tests/run_parity.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from hudi_examples_spark.session import get_spark
from tests.harness import run_all


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="parity-sweep")
    results = run_all(spark, sf_dir)
    n_bad = 0
    for r in results:
        status = "OK " if r.ok else "FAIL"
        notes = "; ".join(r.issues[:3])
        print(f"{status} {r.name:28s} rows={r.row_count} {notes}")
        n_bad += 0 if r.ok else 1
    print(f"\n{len(results) - n_bad}/{len(results)} queries match at {sf_dir}")
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
