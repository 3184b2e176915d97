"""Dev-loop profiler: run one registry fixture under cProfile and print the
top cumulative-time entries, so per-commit driver overhead (py4j, planning,
footer reads) is attributable to specific Table methods.

Usage: python tools/profile_fixture.py <query> [--sf DIR] [--top N]
"""

from __future__ import annotations

import cProfile
import pstats
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from hudi_examples_spark import registry
from hudi_examples_spark.session import get_spark


def main() -> None:
    args = sys.argv[1:]
    sf = "/root/testdata/sf0.1"
    top = 45
    names = []
    it = iter(args)
    for a in it:
        if a == "--sf":
            sf = next(it)
        elif a == "--top":
            top = int(next(it))
        else:
            names.append(a)

    spark = get_spark(app_name="profile-fixture")
    spark.sparkContext.setLogLevel("ERROR")
    fns = {s.name: s.fn for s in registry.all_specs()}

    for name in names:
        # warm pass (codegen, reader paths)
        fns[name](spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()
        pr = cProfile.Profile()
        pr.enable()
        fns[name](spark, sf).write.format("noop").mode("overwrite").save()
        pr.disable()
        print(f"===== {name} =====")
        st = pstats.Stats(pr)
        st.sort_stats("cumulative").print_stats(top)


if __name__ == "__main__":
    main()
