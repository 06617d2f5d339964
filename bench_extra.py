"""Per-query measurement harness for optimization work (bench.py is frozen
for the driver's measurement; this file exists so optimization evidence —
noop-sink isolation per guide §1.4, explain plans, repeated timings — can be
collected without touching it).

Usage:
  python bench_extra.py time  [sf_dir] [query ...]   # warm + min-of-N timings
  python bench_extra.py plan  [outdir] [sf_dir] [query ...]  # explain("formatted")
  python bench_extra.py noop  [sf_dir] [query ...]   # noop-sink timing (all columns)

Defaults: sf_dir = $SPARK_GRAFT_SF_DIR or /root/testdata/sf1.0; queries =
the frozen HEADLINE list from bench.py. Timing methodology matches bench.py
(.count() after one warmup, min-of-2) so numbers are comparable with
BENCH_r*.json; `noop` adds the full-column variant the guide recommends.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "time"
    args = sys.argv[2:]
    outdir = None
    if mode == "plan":
        outdir = Path(args[0]) if args else Path("plans/r07")
        args = args[1:]
    sf_dir = args[0] if args and "/" in args[0] else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0"
    )
    if args and "/" in args[0]:
        args = args[1:]

    from bench import CPUS, HEADLINE
    from kgspark.entry_queries import QUERIES
    from kgspark.session import get_spark, unpersist_all

    names = args or HEADLINE
    spark = get_spark(
        app_name="kgspark-bench-extra",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
    )
    spark.sparkContext.setLogLevel("ERROR")

    if mode == "plan":
        outdir.mkdir(parents=True, exist_ok=True)
        suffix = os.environ.get("PLAN_SUFFIX", "_before")
        for name in names:
            df = QUERIES[name](spark, sf_dir)
            p = outdir / f"{name}{suffix}.txt"
            p.write_text(df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"))
            print(f"wrote {p}")
        spark.stop()
        return

    repeats = int(os.environ.get("BENCH_EXTRA_REPEATS", "2"))
    for name in names:
        fn = QUERIES[name]
        spark.sparkContext.setJobDescription(f"{mode}:{name}")
        t0 = time.time()
        if mode == "noop":
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        else:
            fn(spark, sf_dir).count()
        warm = time.time() - t0
        best = float("inf")
        for _ in range(repeats):
            t0 = time.time()
            if mode == "noop":
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            else:
                fn(spark, sf_dir).count()
            best = min(best, time.time() - t0)
        print(f"{name:32s} warm={warm:7.3f}s best={best:7.3f}s", flush=True)
        unpersist_all(spark)
    spark.stop()


if __name__ == "__main__":
    main()
