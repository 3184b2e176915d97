"""Round-10 optimization harness: isolate one registry query, time it with the
noop sink (guide §1.4), and dump ``explain("formatted")`` for the plan
deliverables (plans/r10/<query>_{before,after}.txt).

Usage:
    python tools/opt_measure.py time  <query> [<query> ...] [--sf DIR] [--passes N]
    python tools/opt_measure.py plan  <query> [<query> ...] [--sf DIR] [--suffix before|after]

Timing methodology matches bench.py (same warm pass at sf0.001, same noop
materialization, min over passes); it is a dev-loop tool — the recorded
artifact is still bench.py under the burst-gated protocol.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from hudi_examples_spark import registry
from hudi_examples_spark.session import get_spark

PLANS_DIR = Path(__file__).resolve().parent.parent / "plans" / "r11"


def _fns():
    fns = {s.name: s.fn for s in registry.all_specs()}
    # bench measures the production variant of the minhash family
    from hudi_examples_spark.operators.llm_pipeline import dedup_minhash_lsh

    fns["dedup_minhash_lsh"] = dedup_minhash_lsh
    return fns


def _explain_formatted(df) -> str:
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


def main() -> None:
    mode = sys.argv[1]
    args = sys.argv[2:]
    sf = "/root/testdata/sf0.1"
    passes = 3
    suffix = "before"
    names: list[str] = []
    it = iter(args)
    for a in it:
        if a == "--sf":
            sf = next(it)
        elif a == "--passes":
            passes = int(next(it))
        elif a == "--suffix":
            suffix = next(it)
        else:
            names.append(a)

    spark = get_spark(app_name="opt-measure")
    spark.sparkContext.setLogLevel("ERROR")
    fns = _fns()

    if mode == "plan":
        PLANS_DIR.mkdir(parents=True, exist_ok=True)
        for name in names:
            df = fns[name](spark, sf)
            txt = _explain_formatted(df)
            out = PLANS_DIR / f"{name}_{suffix}.txt"
            out.write_text(txt)
            print(f"{name}: wrote {out} ({len(txt.splitlines())} lines)")
        return

    if mode == "time":
        # warm pass: codegen + parquet reader paths hot (bench.py discipline)
        for name in names:
            try:
                fns[name](spark, "/root/testdata/sf0.001").write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception as e:  # pragma: no cover - warm failures are real bugs
                print(f"WARM FAIL {name}: {e}")
        for name in names:
            spark.sparkContext.setJobDescription(f"opt_measure: {name}")
            best = None
            samples = []
            for _ in range(passes):
                t0 = time.perf_counter()
                fns[name](spark, sf).write.format("noop").mode("overwrite").save()
                el = time.perf_counter() - t0
                samples.append(round(el, 3))
                best = el if best is None or el < best else best
            spark.sparkContext.setJobDescription(None)
            print(f"{name}: min {best:.3f}s  passes {samples}")
        return

    raise SystemExit(f"unknown mode {mode!r}")


if __name__ == "__main__":
    main()
