"""Dev-loop job counter: run one registry fixture and report how many Spark
jobs it launched (and their stage/task shapes) — per-commit driver overhead
in the table-layer fixtures is job-count-dominated, so the optimization
currency here is "jobs removed", not bytes.

Usage: python tools/job_count.py <query> [--sf DIR]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from hudi_examples_spark import registry
from hudi_examples_spark.session import get_spark


def main() -> None:
    args = sys.argv[1:]
    sf = "/root/testdata/sf0.1"
    names = []
    it = iter(args)
    for a in it:
        if a == "--sf":
            sf = next(it)
        else:
            names.append(a)

    spark = get_spark(app_name="job-count")
    spark.sparkContext.setLogLevel("ERROR")
    fns = {s.name: s.fn for s in registry.all_specs()}
    tracker = spark.sparkContext.statusTracker()

    for name in names:
        # warm pass
        fns[name](spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()
        before = set(tracker.getJobIdsForGroup(None) or [])
        t0 = time.perf_counter()
        fns[name](spark, sf).write.format("noop").mode("overwrite").save()
        el = time.perf_counter() - t0
        after = set(tracker.getJobIdsForGroup(None) or [])
        new = sorted(after - before)
        print(f"===== {name}: {len(new)} jobs in {el:.3f}s =====")
        for j in new:
            info = tracker.getJobInfo(j)
            if info is None:
                print(f"  job {j}: (evicted)")
                continue
            stages = []
            n_tasks = 0
            for sid in info.stageIds:
                si = tracker.getStageInfo(sid)
                if si:
                    stages.append(f"{sid}:{si.numTasks}t")
                    n_tasks += si.numTasks
            print(f"  job {j}: {len(info.stageIds)} stages, {n_tasks} tasks  [{' '.join(stages)}]")


if __name__ == "__main__":
    main()
