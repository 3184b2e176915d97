"""Time every registry spec with the noop sink (guide §1: measure everything
before deciding what to optimize). One warm pass at sf0.001 per spec, then
``--passes`` timed passes at the target sf; reports the min.

Dev-loop ranking tool — artifacts of record stay bench.py's gated entries.

Usage:
    python tools/registry_sweep.py [--sf DIR] [--passes N] [--out FILE]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from hudi_examples_spark import registry
from hudi_examples_spark.session import get_spark


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    sf, passes, out_path = args.sf, args.passes, args.out
    warm_sf = "/root/testdata/sf0.001"

    spark = get_spark(app_name="registry-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    results: dict[str, float] = {}
    errors: dict[str, str] = {}
    specs = registry.all_specs()
    for i, s in enumerate(specs):
        try:
            spark.sparkContext.setJobDescription(f"warm:{s.name}")
            s.fn(spark, warm_sf).write.format("noop").mode("overwrite").save()
            best = None
            for p in range(passes):
                spark.sparkContext.setJobDescription(f"time:{s.name}:{p}")
                t0 = time.monotonic()
                s.fn(spark, sf).write.format("noop").mode("overwrite").save()
                dt = time.monotonic() - t0
                best = dt if best is None or dt < best else best
            results[s.name] = round(best, 3)
            print(f"[{i + 1}/{len(specs)}] {s.name}: {best:.3f}s", flush=True)
        except Exception as e:  # keep sweeping; a broken spec shows up in errors
            errors[s.name] = repr(e)[:200]
            print(f"[{i + 1}/{len(specs)}] {s.name}: ERROR {e!r}", flush=True)
        finally:
            spark.sparkContext.setJobDescription(None)

    ranked = sorted(results.items(), key=lambda kv: -kv[1])
    print("\n=== slowest 30 ===")
    for name, t in ranked[:30]:
        print(f"{t:8.3f}  {name}")
    print(f"total {sum(results.values()):.1f}s over {len(results)} specs,"
          f" {len(errors)} errors")
    if out_path:
        Path(out_path).write_text(
            json.dumps({"sf": sf, "passes": passes, "results": results,
                        "errors": errors}, indent=1)
        )


if __name__ == "__main__":
    main()
