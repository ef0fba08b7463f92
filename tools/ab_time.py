"""Targeted A/B query timer: times the named registry queries with the
bench's exact methodology (one count() warm-up outside the window, then
best-of-N noop-sink evaluations) and writes one JSON dict to the given
output path.  Run it once from the optimized tree and once from a
pristine-HEAD worktree, interleaved, to get same-window before/after
numbers that a noisy VM cannot fake.

Usage: python tools/ab_time.py OUT.json [sf_dir] [reps] query...
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out = sys.argv[1]
    sf_dir = sys.argv[2]
    reps = int(sys.argv[3])
    names = sys.argv[4:]
    from bigarrays_jl_spark.operators import ALL_QUERIES
    from bigarrays_jl_spark.session import get_spark
    spark = get_spark("ab_time")
    warm = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    warm.count()
    warm.limit(64).repartition(
        int(os.environ.get("SPARK_GRAFT_CPUS", "32"))) \
        .mapInPandas(lambda it: it, schema=warm.schema).count()
    res: dict[str, list[float]] = {}
    for name in names:
        fn = ALL_QUERIES[name]
        fn(spark, sf_dir).count()            # warm-up, outside the window
        runs = []
        for _ in range(reps):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 3))
        res[name] = runs
        print(f"# {name}: best {min(runs)} samples={runs}", file=sys.stderr)
    with open(out, "w") as fh:
        json.dump(res, fh, indent=1)


if __name__ == "__main__":
    main()
