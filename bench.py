"""Benchmark driver: headline queries at $SPARK_GRAFT_SF_DIR plus the
north-rule scaling evidence (same KG-construction job at N and 4N cores).

Prints ONE JSON line:
  {"metric": "kg_triples_per_sec", "value": <steady-state triples/s at 4N>,
   "unit": "triples/sec", "queries": {<name>: <sec>, ...}, "sf": <sf>,
   "scaling": {...}}

Methodology notes (also written to BENCH/BASELINE.md):
- This sandbox is a shared VM with multi-minute CPU-steal bursts. Each
  scaling measurement runs PINNED to its own vCPUs (emulating a cluster
  executor's cgroup cpuset) and measures hypervisor steal per-CPU on
  exactly those vCPUs — noise on the other ~28 vCPUs no longer voids a
  round. Rounds are interleaved low/high pairs; the preferred estimator is
  the median of CLEAN rounds (<= 5% of pinned capacity stolen on both
  sides, raw wall times); if no round is clean, the fallback is the median
  of steal-CORRECTED rounds (work-conserving dt - stolen/n_pinned, trusted
  up to 35% stolen capacity), explicitly labeled `estimator:
  "steal_corrected"`. Only a bench where no round completes at all records
  an invalid 0.0.
- The warmup run exists to populate the JVM's JIT — on a real cluster these
  compile costs amortize over hours of executor lifetime; including them in
  a seconds-scale measurement would measure javac, not the engine.
- All persisted RDDs are dropped between runs (kgspark.session.unpersist_all)
  so repeats are independent.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time
from pathlib import Path

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# 45k pages x ~13KB (BENCH_BULK_WORDS in the child): realistic page weight
# makes the job extraction/annotation-bound like a real crawl; the serial
# driver floor (plan analysis + CC-loop jobs, constant across parallelism)
# is a few % of the local[1] run. At 100 TB the floor is irrelevant; the
# corpus is sized/weighted to measure the engine, not the floor — and sized
# so a full interleaved low/high round fits in ~6 minutes, leaving room for
# several rounds inside the wall budget (a single 20-minute round can never
# collect the >=2 clean rounds the methodology needs).
SCALE_PAGES = int(os.environ.get("BENCH_SCALE_PAGES", "45000"))
REPEATS = int(os.environ.get("BENCH_REPEATS", "2"))
MAX_REPEATS = int(os.environ.get("BENCH_MAX_REPEATS", "8"))
# Gates on the fraction of PINNED-vCPU capacity stolen during a timed run
# (child field steal_frac_cap — /proc/stat per-CPU steal delta over exactly
# the vCPUs the job is pinned to, divided by dt * n_pinned):
#   clean:       <= CLEAN_FRAC on both sides -> raw wall times trusted
#   correctable: <= CORR_FRAC on both sides  -> steal-corrected times
#                   (dt - stolen/n_pinned) trusted, estimator labeled
# Per-CPU measurement is what makes the gate fair: the old machine-wide
# 0.15-cores/s gate discarded rounds for ambient noise spread over 32
# vCPUs, ~87% of which this job never touches (round 3 recorded 0.0 with
# every round "contaminated" while a clean-window rerun measured eff 1.01).
CLEAN_FRAC = float(os.environ.get("BENCH_CLEAN_FRAC", "0.05"))
CORR_FRAC = float(os.environ.get("BENCH_CORR_FRAC", "0.35"))
# Two further contamination signals that pinned steal cannot see
# (measured: a 1.1 cores/s machine-wide burst ran the pipeline 2.5-3.5x
# slow at < 5% pinned steal — host SMT/memory-bandwidth pressure leaves no
# steal ticks, and a register-bound spin sentinel reads normal):
#   - machine-wide steal rate as an ENVIRONMENT indicator: the clean tier
#     requires <= MACHINE_MAX stolen cores/s on both sides (looser than
#     round 3's 0.15 gate — pinning shields direct theft; this only
#     excludes the heavy episodes that distort through the host);
#   - a RELATIVE BAND on the pipeline's own wall time, the one signal that
#     sees every form of contention: each side must run within
#     REL_BAND x that side's best across all completed rounds (clean
#     tier; REL_BAND_CORR for the corrected tier). local[1] at 45k pages
#     repeats within ~4% across quiet windows, so 1.3x is generous.
MACHINE_MAX = float(os.environ.get("BENCH_MACHINE_MAX", "0.35"))
# the corrected tier tolerates a dirtier environment than clean — but not
# an arbitrary one: a 0.7+ cores/s episode ran the pinned low side 4.1x
# slow (observed), which no steal correction can repair, and a half-slowed
# round yields nonsense ratios like 1.26. Beyond this bound a round is
# reported but never estimated from.
MACHINE_MAX_CORR = float(os.environ.get("BENCH_MACHINE_MAX_CORR", "0.6"))
REL_BAND = float(os.environ.get("BENCH_REL_BAND", "1.3"))
REL_BAND_CORR = float(os.environ.get("BENCH_REL_BAND_CORR", "1.5"))
# Hard wall-clock budget for the scaling phase: stop adding rounds when
# exceeded even if the efficiency target hasn't been hit — a bench that
# outlives its caller's patience records nothing at all.
TIME_BUDGET_SEC = float(os.environ.get("BENCH_TIME_BUDGET_SEC", "2400"))
# Absolute quiet-host anchor: before each scaling round the parent probes a
# parallel spin PINNED to the high side's vCPU set and waits (bounded) for
# a quiet window rather than burning a round into a contention episode.
QUIET_CEILING = float(os.environ.get("BENCH_QUIET_CEILING", "0.8"))
# Heavy host episodes last tens of minutes; waiting ~14 min beats burning
# a 15-minute round the gates will reject (waits are cheap spins). After
# QUIET_WAITS attempts the round starts anyway — classification, not the
# scheduler, has the final word.
QUIET_WAITS = int(os.environ.get("BENCH_QUIET_WAITS", "18"))
QUIET_SLEEP_SEC = float(os.environ.get("BENCH_QUIET_SLEEP_SEC", "45"))
# Scaling pair: this sandbox VM exposes 32 hyperthreads over ~16 physical
# cores (a pure-JVM compute kernel saturates at ~2.3x going 8->32 threads),
# so the N vs 4N comparison must stay well inside the physical core budget.
# 1 vs 4 threads (not 2 vs 8): the pipeline carries an ~8-15s serial driver
# floor (plan analysis + job launches) that is constant across parallelism;
# at 240k pages (~230s of parallel work) that floor costs ~3% of the
# local[1] run but ~25% of a local[8] run — 2-vs-8 tops out near eff 0.7 on
# an IDLE host while 1-vs-4 measures ~0.9 for the identical engine. A
# 4-thread high side is also far less exposed to neighbor-VM core pressure.
SCALE_LOW = int(os.environ.get("BENCH_SCALE_LOW", "1"))
SCALE_HIGH = int(os.environ.get("BENCH_SCALE_HIGH", "4"))
# Opportunistic pairs collected across the round by tools/scaling_hunt.py —
# the SAME pinned child with the same gates, logged one JSON line per
# observation. Merged into the estimator below (round-5 verdict #2: the
# bench's own 40-minute window missed every quiet minute of a bursty
# evening while in-round hunter pairs would have been valid evidence).
HUNT_LOG = os.environ.get("BENCH_HUNT_LOG", "scaling_hunt_r06.jsonl")
# The KG pipeline is a ~50-stage plan; whole-stage-codegen compilation of it
# costs ~60s of serial driver time per plan shape — on a long-lived cluster
# that amortizes to zero, in a seconds-scale bench it IS the measurement.
# The pipeline is python-UDF + shuffle bound (codegen gains ~nothing here,
# measured), so the scaling child runs it interpreted
# (tools/bench_scaling_child.py).

# headline operator queries timed at SF_DIR (one execution each, after the
# session is warm — these are scan-bound, not compile-bound)
HEADLINE = [
    "kg_mention_detect",
    "kg_mention_topk",
    "kg_cooccurrence_edges",
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "window_top_order_per_customer",
    "unpivot_lineitem",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_minhash_lsh_fast",
    "text_quality_score",
    "ann_cosine_topk",
    "events_sessionize",
    "corpus_span_dedup",
    "text_tfidf_topk",
    "pack_sequences",
    "graph_pagerank",
    # round 6: the consensus stage gained a driver oracle and
    # group_quantiles switched to histogram rank selection — track both
    "kg_pipeline_consensus",
    "stats_group_quantiles",
    # round 6 new ops: decontamination screen, bigram-LM scoring,
    # degree-oriented triangle counting, single-pass curation composite
    "corpus_decontaminate",
    "corpus_bigram_lm",
    "graph_triangles",
    "corpus_c4_filter",
]


def _sf_of(path: str) -> float:
    name = Path(path).name  # e.g. sf0.1
    try:
        return float(name.replace("sf", ""))
    except ValueError:
        return -1.0


def _run_child(master: str, n_pages: int) -> dict | None:
    """One measurement in a FRESH process (fresh JVM + interpreter — no
    accumulator-server residue, no leftover checkpoint RDDs, independent
    JIT state), self-pinned to its own vCPUs. Child stderr is captured, not
    forwarded: Spark's shutdown chatter must not pollute the one-JSON-line
    bench contract."""
    child = Path(__file__).parent / "tools" / "bench_scaling_child.py"
    try:
        proc = subprocess.run(
            [sys.executable, str(child), master, str(n_pages)],
            capture_output=True,
            text=True,
            cwd=str(Path(__file__).parent),
            timeout=1800,
        )
    except subprocess.TimeoutExpired:
        # a hung child voids this round only — accumulated rounds survive
        print(f"[scaling] child timeout: {master}", file=sys.stderr, flush=True)
        return None
    for line in proc.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                r = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "aborted" in r:
                # child bailed (steal burst beyond even the corrected
                # tier's tolerance) — cheap skip
                print(f"[scaling] {json.dumps(r)}", file=sys.stderr, flush=True)
                return None
            return r
    if proc.returncode != 0:
        tail = proc.stderr.strip().splitlines()[-3:]
        print(
            f"[scaling] child failed rc={proc.returncode}: {' | '.join(tail)}",
            file=sys.stderr,
            flush=True,
        )
    return None


def _hunter_rounds(n_pages: int) -> list[dict]:
    """Load completed low/high pairs from this round's scaling-hunt ledger
    (tools/scaling_hunt.py runs tools/bench_scaling_child.py — the same
    pinned measurement — whenever it sees a quiet window). Each pair joins
    the rounds list tagged source=hunter and passes through the SAME
    clean/correctable gates as live rounds, including the relative band
    against each side's best across ALL rounds."""
    path = Path(__file__).parent / "BENCH" / HUNT_LOG
    if not path.exists():
        return []
    by_round: dict[int, dict] = {}
    sides = {f"local[{SCALE_LOW}]": "low", f"local[{SCALE_HIGH}]": "high"}
    for line in path.read_text().splitlines():
        try:
            o = json.loads(line)
        except json.JSONDecodeError:
            continue
        if "aborted" in o or "dt_sec" not in o or o.get("pages") != n_pages:
            continue
        side = sides.get(o.get("master"))
        if side is None or o.get("hunt_round") is None:
            continue
        by_round.setdefault(o["hunt_round"], {})[side] = o
    out = []
    for hr in sorted(by_round):
        pair = by_round[hr]
        if "low" in pair and "high" in pair:
            out.append(
                {
                    "round": f"hunter-{hr}",
                    "low": pair["low"],
                    "high": pair["high"],
                    "source": "hunter",
                }
            )
    return out


def measure_scaling(n_pages: int, repeats: int) -> dict:
    """North-rule evidence: the same KG job at N and 4N cores.

    Robustness against this shared VM's bursty CPU steal (multi-minute
    episodes of 0.5-2.5 stolen cores, appearing WITH load):
      - each measurement runs in its own subprocess pinned to its own
        vCPUs, and measures per-CPU steal on exactly those (see
        tools/bench_scaling_child.py docstring);
      - rounds are interleaved low/high pairs with an explicit round index
        — ratios are only ever computed WITHIN a round, never across;
      - TIERED estimator: a round is CLEAN when both sides lost <=
        CLEAN_FRAC of pinned capacity to steal AND saw <= MACHINE_MAX
        machine-wide stolen cores/s AND ran within REL_BAND of that
        side's best wall time across rounds (three independent
        contamination signals — see the gate comments above); the primary
        efficiency is the MEDIAN of clean-round raw ratios. If NO round
        is clean, the fallback is the median of steal-CORRECTED ratios
        over rounds within CORR_FRAC, MACHINE_MAX_CORR, and REL_BAND_CORR
        (work-conserving
        correction, valid for this ~95%-map job), labeled `estimator:
        "steal_corrected"`. Rounds beyond those bounds are reported but
        never estimated from. Only a bench with zero completed rounds
        records `valid: false`;
      - sampling stops only on (a) >= `repeats` clean rounds collected,
        (b) MAX_REPEATS total rounds, or (c) the wall budget — never on
        the efficiency value itself (no stop-when-it-looks-good bias).
    """
    m_low, m_high = f"local[{SCALE_LOW}]", f"local[{SCALE_HIGH}]"
    # {"round": i, "low": obs|None, "high": obs|None}; seeded with this
    # round's opportunistic hunter pairs (same child, same gates)
    rounds: list[dict] = _hunter_rounds(n_pages)
    if rounds:
        print(
            f"[scaling] merged {len(rounds)} completed pair(s) from "
            f"BENCH/{HUNT_LOG}",
            file=sys.stderr,
            flush=True,
        )

    def frac(o: dict) -> float:
        return o.get("steal_frac_cap", 9.9)

    def machine(o: dict) -> float:
        return o.get("machine_steal_rate", 9.9)

    def _complete(r: dict) -> bool:
        return r["low"] is not None and r["high"] is not None

    def side_best(key: str) -> dict[str, float]:
        done = [r for r in rounds if _complete(r)]
        return {
            s: min(r[s].get(key, r[s]["dt_sec"]) for r in done)
            for s in ("low", "high")
        }

    def in_band(r: dict, key: str, band: float) -> bool:
        best = side_best(key)
        return all(
            r[s].get(key, r[s]["dt_sec"]) <= band * best[s] for s in ("low", "high")
        )

    def round_clean(r: dict) -> bool:
        # pinned steal AND machine environment AND the pipeline's own wall
        # time (relative to each side's best round) must all be quiet —
        # see the gate comments at the top of the file for why one signal
        # alone is not enough on this host
        return (
            _complete(r)
            and frac(r["low"]) <= CLEAN_FRAC
            and frac(r["high"]) <= CLEAN_FRAC
            and machine(r["low"]) <= MACHINE_MAX
            and machine(r["high"]) <= MACHINE_MAX
            and in_band(r, "dt_sec", REL_BAND)
        )

    def round_correctable(r: dict) -> bool:
        return (
            _complete(r)
            and frac(r["low"]) <= CORR_FRAC
            and frac(r["high"]) <= CORR_FRAC
            and machine(r["low"]) <= MACHINE_MAX_CORR
            and machine(r["high"]) <= MACHINE_MAX_CORR
            and in_band(r, "dt_corr_sec", REL_BAND_CORR)
        )

    def round_eff(r: dict, corrected: bool) -> float:
        k = "dt_corr_sec" if corrected else "dt_sec"
        lo = r["low"].get(k, r["low"]["dt_sec"])
        hi = r["high"].get(k, r["high"]["dt_sec"])
        return round((lo / hi) / (SCALE_HIGH / SCALE_LOW), 3)

    def current() -> dict:
        complete = [r for r in rounds if r["low"] and r["high"]]
        clean = [r for r in complete if round_clean(r)]
        correctable = [r for r in complete if round_correctable(r)]
        if not complete:
            # zero complete rounds (every child aborted/failed): emit a
            # structurally complete, clearly-invalid artifact rather than
            # crashing after the headline phase already ran
            empty = {
                "master": "",
                "pages": n_pages,
                "triples": 0,
                "times_sec": [],
                "times_corr_sec": [],
                "sentinels_sec": [],
                "steal_frac_caps": [],
                "machine_steal_rates": [],
                "best_sec": 0.0,
                "triples_per_sec": 0.0,
                "pages_per_sec": 0.0,
            }
            return {
                "low": {**empty, "master": m_low},
                "high": {**empty, "master": m_high},
                "efficiency": 0.0,
                "estimator": "none",
                "valid": False,
                "efficiency_per_round": [],
                "efficiency_corr_per_round": [],
                "efficiency_per_clean_round": [],
                "n_rounds": 0,
                "n_clean_rounds": 0,
                "n_correctable_rounds": 0,
                "clean_frac": CLEAN_FRAC,
                "corr_frac": CORR_FRAC,
            }

        raw_effs = [round_eff(r, corrected=False) for r in complete]
        corr_effs_all = [round_eff(r, corrected=True) for r in complete]
        clean_effs = [round_eff(r, corrected=False) for r in clean]
        corr_effs = [round_eff(r, corrected=True) for r in correctable]
        if clean_effs:
            estimator, efficiency, basis, corrected = (
                "clean",
                round(statistics.median(clean_effs), 3),
                clean,
                False,
            )
        elif corr_effs:
            estimator, efficiency, basis, corrected = (
                "steal_corrected",
                round(statistics.median(corr_effs), 3),
                correctable,
                True,
            )
        else:
            # every completed round beyond the correction bound: report the
            # corrected median anyway but mark it invalid
            estimator, efficiency, basis, corrected = (
                "contaminated",
                round(statistics.median(corr_effs_all), 3),
                complete,
                True,
            )
        summary = {}
        tkey = "dt_corr_sec" if corrected else "dt_sec"
        for side, m in (("low", m_low), ("high", m_high)):
            obs_all = [r[side] for r in complete]
            obs_basis = [r[side] for r in basis]
            best = min(o.get(tkey, o["dt_sec"]) for o in obs_basis)
            n_triples = obs_basis[0]["triples"]
            summary[side] = {
                "master": m,
                "pages": n_pages,
                "triples": n_triples,
                "times_sec": [o["dt_sec"] for o in obs_all],
                "times_corr_sec": [o.get("dt_corr_sec", o["dt_sec"]) for o in obs_all],
                "sentinels_sec": [o["sentinel_sec"] for o in obs_all],
                "steal_frac_caps": [frac(o) for o in obs_all],
                "machine_steal_rates": [machine(o) for o in obs_all],
                "pinned": obs_all[0].get("pinned", []),
                "best_sec": round(best, 2),
                "triples_per_sec": round(n_triples / best, 1),
                "pages_per_sec": round(n_pages / best, 1),
            }
        return {
            "low": summary["low"],
            "high": summary["high"],
            "efficiency": efficiency,
            "estimator": estimator,
            "valid": estimator in ("clean", "steal_corrected"),
            "efficiency_per_round": raw_effs,
            "efficiency_corr_per_round": corr_effs_all,
            "efficiency_per_clean_round": clean_effs,
            "n_rounds": len(complete),
            "n_clean_rounds": len(clean),
            "n_correctable_rounds": len(correctable),
            "n_hunter_rounds": len([r for r in complete if r.get("source") == "hunter"]),
            "clean_frac": CLEAN_FRAC,
            "corr_frac": CORR_FRAC,
        }

    sys.path.insert(0, str(Path(__file__).parent / "tools"))
    from bench_scaling_child import PIN_BASE, PIN_EXTRA, read_steal_ticks, sentinel_sec

    def wait_quiet() -> None:
        """Steal on this host appears WITH load (oversubscribed hypervisor:
        demanding N cores yields steal when the host can't deliver), so an
        idle steal probe proves nothing. Probe under load ON THE PINNED
        SET: pin this process to the high side's vCPUs, run the N-proc
        spin, and measure the per-CPU steal delta across it; high steal
        while we demand those vCPUs means the host can't currently give
        them. Affinity is restored afterwards."""
        high_set = list(range(PIN_BASE, PIN_BASE + SCALE_HIGH + PIN_EXTRA))
        prior = os.sched_getaffinity(0)
        for _ in range(QUIET_WAITS):
            try:
                os.sched_setaffinity(0, high_set)
                st0 = read_steal_ticks(high_set)
                mst0 = read_steal_ticks()
                t0 = time.time()
                spin = sentinel_sec(SCALE_HIGH)
                probe_wall = max(time.time() - t0, 0.1)
                stolen_frac = (
                    (read_steal_ticks(high_set) - st0)
                    / 100.0
                    / (probe_wall * len(high_set))
                )
                machine_rate = (read_steal_ticks() - mst0) / 100.0 / probe_wall
            finally:
                os.sched_setaffinity(0, prior)
            # machine-wide rate gates the heavy episodes whose pressure
            # arrives through the host (bandwidth/SMT), not as our steal
            if (
                spin <= QUIET_CEILING
                and stolen_frac <= CLEAN_FRAC
                and machine_rate <= MACHINE_MAX
            ):
                return
            time.sleep(QUIET_SLEEP_SEC)

    t_start = time.time()
    for rnd in range(MAX_REPEATS):
        if len([x for x in rounds if round_clean(x)]) >= repeats:
            # hunter pairs already satisfy the clean-round quota: don't
            # burn the (possibly noisy) bench window on redundant rounds
            print("[scaling] clean quota met by merged rounds", file=sys.stderr)
            break
        r: dict = {"round": rnd, "low": None, "high": None}
        # alternate which side goes first so a drifting host doesn't always
        # bias the same side of the ratio
        order = [("low", m_low), ("high", m_high)]
        if rnd % 2:
            order.reverse()
        for i, (side, m) in enumerate(order):
            if i and r[order[0][0]] is None:
                # first side aborted/failed: the round can never pair —
                # don't burn the (possibly 4-15 min) second side into it
                break
            wait_quiet()
            o = _run_child(m, n_pages)
            if o is not None:
                o["round"] = rnd
                r[side] = o
                # stream partial data: a killed bench still leaves evidence
                print(f"[scaling] {json.dumps(o)}", file=sys.stderr, flush=True)
        rounds.append(r)
        snap = current()
        print(
            f"[scaling] round={rnd + 1} clean={snap.get('n_clean_rounds', 0)}"
            f"/{snap.get('n_rounds', 0)} eff={snap.get('efficiency')} "
            f"({snap.get('estimator')})",
            file=sys.stderr,
            flush=True,
        )
        n_clean = len([x for x in rounds if round_clean(x)])
        if n_clean >= repeats:
            break
        if time.time() - t_start > TIME_BUDGET_SEC:
            print("[scaling] time budget exhausted", file=sys.stderr, flush=True)
            break
    return current()


def _run_stage_splits(n_pages: int) -> dict:
    """One instrumented pipeline run (fresh child, high side) reporting
    cumulative stage boundaries — extract/annotate -> link -> canonicalize
    -> triples — so corpus changes can't orphan the trend line. Not part of
    the scaling estimate (materializing each boundary adds work)."""
    child = Path(__file__).parent / "tools" / "bench_scaling_child.py"
    try:
        proc = subprocess.run(
            [sys.executable, str(child), f"local[{SCALE_HIGH}]", str(n_pages), "--stages"],
            capture_output=True,
            text=True,
            cwd=str(Path(__file__).parent),
            timeout=1800,
        )
    except subprocess.TimeoutExpired:
        return {}
    for line in proc.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line).get("stage_sec", {})
            except json.JSONDecodeError:
                continue
    return {}


def _pause_hunter() -> None:
    """Suspend tools/scaling_hunt.py for the duration of this bench run:
    touch its pause file, then wait (bounded) for any in-flight pinned
    child to finish — a hunter child and a bench child pin the same vCPU
    block, and two concurrent measurements contaminate both. The pause
    file is removed in main()'s finally so hunting resumes after."""
    (Path(__file__).parent / "BENCH" / "hunt_pause").touch()
    deadline = time.time() + 420
    while time.time() < deadline:
        probe = subprocess.run(
            ["pgrep", "-f", "bench_scaling_child"], capture_output=True, text=True
        )
        if probe.returncode != 0:  # no match: nothing in flight
            return
        print("[bench] waiting for a hunter child to drain", file=sys.stderr)
        time.sleep(20)


def main() -> None:
    import atexit

    from kgspark.session import get_spark, unpersist_all

    _pause_hunter()
    # resolve the path NOW: module globals (__file__) are already torn
    # down when atexit lambdas run, so a late lookup NameErrors and leaves
    # the hunter paused forever
    pause_path = Path(__file__).parent / "BENCH" / "hunt_pause"
    atexit.register(lambda p=pause_path: p.unlink(missing_ok=True))

    results: dict[str, float] = {}

    sys.path.insert(0, str(Path(__file__).parent / "tools"))
    from bench_scaling_child import read_steal_ticks

    # --- scaling FIRST: it is the fragile measurement (a full round needs
    # ~6 quiet minutes; headline queries are sub-second with min-of-2 and
    # a retry pass) — give it the freshest quiet window the run has
    # instead of spending that window on 12 minutes of headline timings.
    scaling = measure_scaling(SCALE_PAGES, REPEATS)
    stage_splits = _run_stage_splits(SCALE_PAGES)

    # --- headline queries at SF_DIR on local[CPUS]
    spark = get_spark(app_name="kgspark-bench", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    from kgspark.entry_queries import QUERIES

    def run_headline() -> tuple[dict[str, float], float]:
        out: dict[str, float] = {}
        st0, t0_all = read_steal_ticks(), time.time()
        for name in HEADLINE:
            fn = QUERIES[name]
            t0 = time.time()
            fn(spark, SF_DIR).count()  # warmup (codegen)
            t_warm = time.time() - t0
            best = float("inf")
            for _ in range(2):  # min-of-2: one burst must not poison the number
                t0 = time.time()
                fn(spark, SF_DIR).count()
                best = min(best, time.time() - t0)
            out[name] = round(best, 3)
            print(
                f"[headline] {name} warm={t_warm:.2f}s best={best:.3f}s",
                file=sys.stderr,
                flush=True,
            )
            unpersist_all(spark)
        rate = round(
            (read_steal_ticks() - st0) / 100.0 / (time.time() - t0_all), 3
        )
        print(f"[headline] steal_rate={rate} cores/s", file=sys.stderr, flush=True)
        return out, rate

    # One retry in a quieter window when the whole phase ran inside a steal
    # episode (these queries run unpinned on local[32], so machine-wide
    # rate IS their contention gauge); keep whichever pass was quieter —
    # per-query min across passes would mix windows.
    results, headline_steal_rate = run_headline()
    if headline_steal_rate > MACHINE_MAX:
        print(
            f"[headline] phase contaminated (> {MACHINE_MAX}); waiting for "
            "a quiet window and re-running once",
            file=sys.stderr,
            flush=True,
        )
        for _ in range(QUIET_WAITS):
            st0, t0 = read_steal_ticks(), time.time()
            time.sleep(10)
            if (read_steal_ticks() - st0) / 100.0 / (time.time() - t0) <= MACHINE_MAX:
                break
            time.sleep(QUIET_SLEEP_SEC)
        retry, retry_rate = run_headline()
        if retry_rate < headline_steal_rate:
            results, headline_steal_rate = retry, retry_rate

    spark.stop()

    low, high = scaling["low"], scaling["high"]
    efficiency = scaling["efficiency"]
    results["kg_pipeline"] = high["best_sec"]
    n_pages = SCALE_PAGES

    # Fallback primary metric (round-5 verdict #6): when the scaling phase
    # lands zero usable rounds, kg_triples_per_sec must still be measured —
    # one high-side pipeline child, up to 3 attempts (the child self-aborts
    # on warmup steal, so a failed attempt costs ~1 min). Labeled in the
    # output; it feeds value/pages_per_sec/kg_pipeline, never the
    # efficiency estimate.
    value = high["triples_per_sec"]
    pages_per_sec = high["pages_per_sec"]
    pipeline_fallback = None
    if high["best_sec"] == 0.0:
        for _ in range(3):
            o = _run_child(f"local[{SCALE_HIGH}]", SCALE_PAGES)
            if o is not None:
                pipeline_fallback = o
                results["kg_pipeline"] = o["dt_sec"]
                value = round(o["triples"] / o["dt_sec"], 1)
                pages_per_sec = round(SCALE_PAGES / o["dt_sec"], 1)
                break
            time.sleep(60)

    # --- BENCH/BASELINE.md
    md = Path(__file__).parent / "BENCH" / "BASELINE.md"
    md.parent.mkdir(exist_ok=True)
    valid = scaling.get("valid", False)
    estimator = scaling.get("estimator", "none")

    # Append-only scaling-evidence ledger (round-4 verdict #5): BASELINE.md
    # is a snapshot rewritten per run, which silently replaced the committed
    # 0.911 artifact with the next run's 0.842. Every run now appends one
    # row to HISTORY.md and the snapshot embeds the full ledger, so no
    # clean measurement is ever lost to a later rewrite.
    import datetime

    hist = md.parent / "HISTORY.md"
    if not hist.exists():
        hist.write_text(
            "# Scaling-evidence ledger (append-only; one row per bench run)\n\n"
            "| utc | pages | low best (s) | high best (s) | estimator | "
            "efficiency | valid | clean/total rounds | headline steal "
            "(cores/s) | triples/s (high) |\n"
            "|---|---|---|---|---|---|---|---|---|---|\n"
        )
    with hist.open("a") as fh:
        fh.write(
            f"| {datetime.datetime.utcnow().strftime('%Y-%m-%dT%H:%MZ')} "
            f"| {n_pages} | {low['best_sec']} | {high['best_sec']} "
            f"| {estimator} | {efficiency} | {valid} "
            f"| {scaling.get('n_clean_rounds', 0)}/{scaling.get('n_rounds', 0)} "
            f"| {headline_steal_rate} | {value} |\n"
        )
    md.write_text(
        "# BENCH — kgspark measured numbers\n\n"
        f"Corpus: deterministic synthetic pages (seed=42), {n_pages} pages "
        f"(~13 KB/page); sf dir `{SF_DIR}`.\n\n"
        "## Scaling (north rule: same job at N and 4N cores)\n\n"
        "Shared-VM methodology: each measurement runs in a FRESH subprocess "
        "(own JVM; one untimed warmup run inside it), PINNED via "
        "sched_setaffinity to its own vCPUs before the JVM starts — "
        f"local[{SCALE_LOW}] owns {SCALE_LOW}+1 vCPUs, local[{SCALE_HIGH}] "
        f"owns {SCALE_HIGH}+1 (task vCPUs at exactly 4x, plus one 'driver "
        "node' vCPU on each side: on a real cluster the driver is a "
        "separate machine that does not scale with executors; the high "
        "set is a superset of the low set, so both sides sample the same "
        "host cores). This is the resource envelope a real cluster gives "
        "an executor (cgroup cpuset), and it makes hypervisor "
        "steal measurable per-CPU on exactly the vCPUs the job runs on "
        "(/proc/stat per-CPU steal-tick delta across the timed run — a "
        "point-in-time probe cannot see a mid-run burst; the delta can). "
        "Rounds are interleaved low/high PAIRS with an explicit round "
        "index; the efficiency ratio is only ever computed within a round. "
        "TIERED estimator: a round is CLEAN when (a) both sides lost <= "
        f"{CLEAN_FRAC:.0%} of pinned capacity to steal, (b) both sides "
        f"measured <= {MACHINE_MAX} machine-wide stolen cores/s (heavy "
        "host episodes press through SMT/memory bandwidth and leave no "
        "steal ticks on our vCPUs — measured: 2.5-3.5x pipeline slowdown "
        "at < 5% pinned steal during a 1.1 cores/s machine burst), and "
        f"(c) both sides ran within {REL_BAND}x of that side's best wall "
        "time across all rounds — the pipeline's own runtime is the one "
        "signal that sees every form of contention (local[1] repeats "
        "within ~4% across quiet windows). Clean estimate = median of "
        "clean-round raw ratios. If no round is clean, rounds within "
        f"{CORR_FRAC:.0%} pinned steal, {MACHINE_MAX_CORR} machine-wide "
        f"cores/s, and {REL_BAND_CORR}x of best are "
        "STEAL-CORRECTED (work-conserving dt - stolen_core_sec/n_pinned — "
        "valid because the pipeline is ~95% embarrassingly-parallel map "
        "work that saturates the pinned set) and the estimator is labeled "
        "`steal_corrected`. Rounds beyond those bounds are reported but "
        "never estimated from. Sampling "
        f"stops on >= {REPEATS} clean rounds, {MAX_REPEATS} total rounds, "
        f"or the {int(TIME_BUDGET_SEC)}s wall budget — never on the "
        "efficiency value itself. Timed section = execution (input scan "
        "-> triple materialization), run interpreted: whole-stage-codegen "
        "compile (~60s for the ~50-stage plan) amortizes to zero over a "
        "long-lived 100 TB job and gains ~0 for this python-UDF + "
        "shuffle bound pipeline (measured).\n\n"
        "| master | pinned vCPUs | pages | triples | times (s) | "
        "corrected (s) | steal frac of capacity | machine steal (cores/s) "
        "| best (s) | triples/s | pages/s |\n"
        "|---|---|---|---|---|---|---|---|---|---|---|\n"
        + "".join(
            f"| {r['master']} | {r.get('pinned', [])} | {r['pages']} | "
            f"{r['triples']} | {r['times_sec']} | {r['times_corr_sec']} | "
            f"{r['steal_frac_caps']} | {r.get('machine_steal_rates', [])} | "
            f"{r['best_sec']} | {r['triples_per_sec']} | {r['pages_per_sec']} |\n"
            for r in (low, high)
        )
        + f"\nRounds: {scaling.get('n_rounds', 0)} total "
        f"({scaling.get('n_hunter_rounds', 0)} merged from the in-round "
        f"opportunistic hunter ledger BENCH/{HUNT_LOG} — same pinned child, "
        "same gates), "
        f"{scaling.get('n_clean_rounds', 0)} clean, "
        f"{scaling.get('n_correctable_rounds', 0)} correctable. "
        f"Raw per-round efficiencies {scaling.get('efficiency_per_round', [])}; "
        f"corrected {scaling.get('efficiency_corr_per_round', [])}; clean-round "
        f"{scaling.get('efficiency_per_clean_round', [])}.\n\n"
        + (
            f"**Scaling efficiency ({SCALE_LOW} -> {SCALE_HIGH} cores, "
            f"estimator `{estimator}`): {efficiency}**\n\n"
            if valid
            else f"**NO VALID ROUND (every round beyond the {CORR_FRAC:.0%} "
            f"correction bound) — the recorded ratio {efficiency} is NOT a "
            "trusted scaling measurement; rerun in a quieter window.**\n\n"
        )
        + "## Pipeline stage splits (one instrumented run, high side)\n\n"
        "| stage | cumulative boundary (s) |\n|---|---|\n"
        + "".join(f"| {k} | {v} |\n" for k, v in stage_splits.items())
        + "\n## Headline query times (s, warm)\n\n"
        f"Measured at machine-wide steal rate {headline_steal_rate} cores/s "
        "(compare across rounds only at similar rates; > 0.3 means the "
        "numbers are contention-inflated).\n\n"
        "| query | sec |\n|---|---|\n"
        + "".join(f"| {k} | {v} |\n" for k, v in results.items())
        + "\nReference baseline (BASELINE.md): ~173 links/s single-threaded "
        "temporal linking; Neo4j 2.3-2.8 s multi-hop queries on the built "
        "graph.\n\n"
        "## Scaling evidence history (append-only across runs)\n\n"
        + hist.read_text().split("\n", 2)[2]
    )

    print(
        json.dumps(
            {
                "metric": "kg_triples_per_sec",
                "value": value,
                "unit": "triples/sec",
                "queries": results,
                "sf": _sf_of(SF_DIR),
                "headline_steal_rate": headline_steal_rate,
                "pages_per_sec": pages_per_sec,
                "pipeline_fallback": pipeline_fallback,
                "stage_sec": stage_splits,
                "scaling": scaling,
            }
        )
    )


if __name__ == "__main__":
    main()
