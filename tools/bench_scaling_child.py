"""One scaling-bench measurement in a FRESH process.

Usage: python tools/bench_scaling_child.py <master> <n_pages>

Prints exactly one JSON line on stdout:
  {"master": ..., "pages": N, "triples": N, "dt_sec": s, "sentinel_sec": s}

Why a subprocess per measurement (rather than SparkSession restarts in one
process): PySpark's internal Python-accumulator server does not survive
repeated SparkContext stop/start in a single interpreter — round 1's bench
recorded a PythonAccumulatorV2.merge stack trace mid-run and noise-dominated
timings. A fresh JVM + fresh interpreter per measurement gives fully
independent, residue-free observations; JVM/JIT warmup happens inside the
child (untimed small pipeline run) so the timed run measures the engine.

The sentinel is a fixed PARALLEL spin: as many worker processes as the
master has threads, each doing the same fixed pure-Python loop; the wall
time of the slowest worker is reported. A single-thread sentinel cannot see
the failure mode that matters here — a neighbor hogging most of the VM's
cores leaves one thread fast but an 8-thread job starved (observed: clean
single-thread sentinel while the same pipeline ran 3x slow). The parent
compares sentinels PER MASTER (an 8-proc spin is only comparable to another
8-proc spin) and discards rounds >1.3x the per-master best.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _spin(_arg: int) -> int:
    x = 0
    for i in range(3_000_000):
        x = (x * 1103515245 + 12345 + i) & 0xFFFFFFFF
    return x


def sentinel_sec(n_procs: int) -> float:
    """Wall time for n_procs concurrent fixed spins; min-of-2 rounds."""
    best = float("inf")
    with mp.Pool(n_procs) as pool:
        pool.map(_spin, range(n_procs))  # warm the pool (fork cost out)
        for _ in range(2):
            t0 = time.perf_counter()
            pool.map(_spin, range(n_procs))
            best = min(best, time.perf_counter() - t0)
    return best


def read_steal_ticks() -> int:
    """Hypervisor steal ticks from /proc/stat (field 8 of the cpu line).
    Unlike the sentinel (a point-in-time probe), the before/after delta
    covers the WHOLE timed run — a mid-run steal burst is visible here and
    in nothing else."""
    with open("/proc/stat") as f:
        parts = f.readline().split()
    return int(parts[8])


def main() -> None:
    import os

    master = sys.argv[1]
    n_pages = int(sys.argv[2])
    stages_mode = "--stages" in sys.argv[3:]
    # Realistic page weight: the fixture's sentence skeleton is ~0.6KB of
    # html — toy-sized next to Common-Crawl pages (tens of KB). The bench
    # corpus carries ~13KB/page of pattern-inert filler so the measured
    # job is extraction/annotation-bound like the real workload, not
    # driver-floor-bound. Golden triples are unchanged at any bulk size.
    bulk_words = int(os.environ.get("BENCH_BULK_WORDS", "2000"))

    from kgspark import fixtures
    from kgspark.pipeline import run_pipeline
    from kgspark.session import get_spark, unpersist_all

    # Pipeline runs interpreted: whole-stage-codegen compile of the ~50-stage
    # plan is ~60s of serial driver time that amortizes to zero on a
    # long-lived cluster (see BENCH/BASELINE.md methodology).
    # 24g heap: the localCheckpointed stages of a heavy corpus overflow the
    # 8g default into GC thrash; the box has 128 GiB and one JVM at a time.
    os.environ.setdefault("KGSPARK_DRIVER_MEM", "24g")
    # shuffle partitions scale with the corpus (spill-aware sizing): 8
    # partitions at 360k pages means ~45k pages (~90MB+) per sort — past
    # the spill threshold, and spilling is superlinear. ~20k pages per
    # shuffle partition keeps sorts in memory at any bench size.
    spark = get_spark(
        app_name=f"kgspark-scaling-{master}",
        master=master,
        shuffle_partitions=max(8, n_pages // 20000),
        extra_conf={"spark.sql.codegen.wholeStage": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # untimed warmup: JIT + Arrow/pandas import on workers. Steal is also
    # measured ACROSS the warmup: if the host is already in a burst, abort
    # now (~1 min sunk) instead of burning a full timed round that the
    # parent's clean-gate would discard anyway (~5-10 min sunk).
    abort_rate = float(os.environ.get("BENCH_CHILD_ABORT_RATE", "0.3"))
    wst0, wt0 = read_steal_ticks(), time.time()
    warm = run_pipeline(
        spark,
        fixtures.gen_pages(spark, max(n_pages // 50, 500), bulk_words=bulk_words),
        fixtures.gen_alias_index(spark),
    )
    warm["triples"].count()
    unpersist_all(spark)
    warm_rate = (read_steal_ticks() - wst0) / 100.0 / max(time.time() - wt0, 0.1)
    if not stages_mode and warm_rate > abort_rate:
        print(
            json.dumps(
                {
                    "master": master,
                    "pages": n_pages,
                    "aborted": "steal_during_warmup",
                    "warmup_steal_rate": round(warm_rate, 3),
                }
            )
        )
        spark.stop()
        return

    if stages_mode:
        # Informational per-stage split: materialize each pipeline boundary
        # in order and report CUMULATIVE seconds. This run does extra work
        # (each boundary forces a job) so it never feeds the scaling ratio.
        t0 = time.time()
        out = run_pipeline(
            spark,
            fixtures.gen_pages(spark, n_pages, bulk_words=bulk_words),
            fixtures.gen_alias_index(spark),
        )
        splits = {}
        for stage in ("annotated", "links", "components", "triples"):
            out[stage].count()
            splits[stage] = round(time.time() - t0, 2)
        print(json.dumps({"master": master, "pages": n_pages, "stage_sec": splits}))
        spark.stop()
        return

    m = re.match(r"local\[(\d+)\]", master)
    n_threads = int(m.group(1)) if m else 2
    s = sentinel_sec(n_threads)

    # Mid-run steal watchdog: the parent's clean-gate is 0.15 stolen
    # cores/s averaged over the run; once the cumulative stolen core-time
    # exceeds what even a long run could amortize (0.15 x 400s = 60
    # core-sec), this round is mathematically doomed — kill it after ~2
    # minutes of burst instead of finishing a 10-minute run the gate will
    # discard anyway. os._exit from the daemon thread: the JVM dies with
    # us, the parent treats the aborted JSON line like a failed side.
    import threading

    abort_budget_core_sec = float(
        os.environ.get("BENCH_MIDRUN_ABORT_CORE_SEC", "60")
    )

    def watchdog(st_base: int) -> None:
        while True:
            time.sleep(15)
            stolen = (read_steal_ticks() - st_base) / 100.0
            if stolen > abort_budget_core_sec:
                print(
                    json.dumps(
                        {
                            "master": master,
                            "pages": n_pages,
                            "aborted": "steal_mid_run",
                            "stolen_core_sec": round(stolen, 1),
                        }
                    ),
                    flush=True,
                )
                os._exit(0)

    # The timed section covers the WHOLE job — plan construction, the
    # canonicalization loop (which executes inside run_pipeline), and the
    # final materialization. (A plan/exec split was tried and reverted:
    # connected-components runs its frontier jobs during pipeline
    # construction, so "plan time" would silently hide real work.)
    st0 = read_steal_ticks()
    threading.Thread(target=watchdog, args=(st0,), daemon=True).start()
    t0 = time.time()
    out = run_pipeline(
        spark,
        fixtures.gen_pages(spark, n_pages, bulk_words=bulk_words),
        fixtures.gen_alias_index(spark),
    )
    n_triples = out["triples"].count()
    dt = time.time() - t0
    steal_core_sec = (read_steal_ticks() - st0) / 100.0

    print(
        json.dumps(
            {
                "master": master,
                "pages": n_pages,
                "triples": n_triples,
                "dt_sec": round(dt, 2),
                "sentinel_sec": round(s, 3),
                "steal_core_sec": round(steal_core_sec, 1),
                # steal as a fraction of the core-time this run needed
                "steal_frac": round(steal_core_sec / (dt * n_threads), 3),
                # machine-wide stolen cores per wall-second: the side-
                # symmetric contention gauge (steal_frac divides by
                # n_threads, which makes the same ambient pressure look 4x
                # worse on the 1-thread side — measured: ~0.7 cores/s
                # ambient reads as frac 0.70 at local[1] vs 0.17 at
                # local[4])
                "steal_rate": round(steal_core_sec / dt, 3),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
