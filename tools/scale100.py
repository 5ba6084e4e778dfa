#!/usr/bin/env python3
"""100x spot probe — the third decade (r10 verdict item 6).

scale_check gates at 10x and scale30 at 30x; this tool probes 100x for
the cheapest top-cost families whose scale argument is "the aggregation
grid never grows with rows" (percentile/weighted-median value grids,
the banded-LSH dedup buckets, the one-scan profile): it benches them on
the 10x replica (tmp/sf1) and a 100x replica (tmp/sf10, probed tables
only — lineitem/orders/documents), and records each query's 100x/10x
growth against the 10x data ratio. growth <= ~10x is linear-or-better
across a full decade; the grid argument predicts well UNDER 10x for
the percentile family (the grid is constant; only the scan grows).

Methodology matches scale30: N runs per JVM, the first discarded as
JIT/page-cache warm-up, steady-state = median of the rest; first-run
numbers are recorded so the discard is visible.

    python3 tools/scale100.py --out SCALE100_r11.json [--runs 5]
"""
import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF1 = os.path.join(REPO, "tmp", "sf1")      # 10x
SF10 = os.path.join(REPO, "tmp", "sf10")    # 100x
SF01 = "/root/testdata/sf0.1"

# the probed families and the tables the 100x replica must carry
QUERIES = [
    "q_agg_percentile", "q_agg_weighted_median",
    "q_dedup_minhash", "q_profile_table",
]
TABLES = "lineitem,orders,documents"


def wait_quiet(max_load: float, timeout_s: int = 900, tag: str = "") -> None:
    """Idle until the 1-minute loadavg drops under max_load (or timeout)
    — chained legs otherwise start in the prior JVM's teardown churn
    and the first runs measure the neighbor, not the engine (see
    tools/scale30.py for the r10→r11 lesson)."""
    import time
    t0 = time.time()
    while time.time() - t0 < timeout_s:
        load = os.getloadavg()[0]
        if load < max_load:
            print(f"[scale] {tag} starting at loadavg {load:.2f}", flush=True)
            return
        time.sleep(10)
    print(f"[scale] {tag} cooldown TIMED OUT at loadavg "
          f"{os.getloadavg()[0]:.2f} — recording anyway", flush=True)


def bench(sf_dir: str, runs: int, cpus: str) -> dict:
    out = tempfile.NamedTemporaryFile(suffix=".json", delete=False).name
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_CPUS=cpus,
               SPARK_GRAFT_BENCH_RUNS=str(runs),
               SPARK_GRAFT_BENCH_ONLY=",".join(QUERIES),
               SPARK_GRAFT_BENCH_OUT=out)
    proc = subprocess.run(
        ["sbt", "-batch", "runMain graft.Bench"],
        cwd=REPO, env=env, capture_output=True, text=True)
    if proc.returncode != 0:
        sys.stderr.write(proc.stdout[-4000:] + proc.stderr[-4000:])
        raise SystemExit(f"bench at {sf_dir} failed (rc={proc.returncode})")
    with open(out) as f:
        payload = json.load(f)
    os.unlink(out)
    return payload


def median(xs):
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2


def steady(payload: dict, q: str):
    runs = [r[q] for r in payload.get("per_run", []) if q in r]
    if not runs:
        return None, None
    tail = runs[1:] if len(runs) > 1 else runs
    return runs[0], median(tail)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="SCALE100_LAST.json")
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--threshold", type=float, default=10.0,
                    help="100x/10x growth gate (10.0 = linear in data)")
    ap.add_argument("--cpus", default="32")
    ap.add_argument("--max-load", type=float, default=2.0,
                    help="wait until 1-min loadavg is below this before each leg")
    args = ap.parse_args()

    if not os.path.isdir(SF1):
        print(f"[scale100] building 10x replica at {SF1} ...", flush=True)
        subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "make_sf1.py"),
             SF01, SF1, "10"], check=True)
    if not os.path.isdir(SF10):
        print(f"[scale100] building 100x replica at {SF10} "
              f"(tables: {TABLES}) ...", flush=True)
        subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "make_sf1.py"),
             SF01, SF10, "100", TABLES], check=True)

    wait_quiet(args.max_load, tag="10x leg")
    print(f"[scale100] bench 10x ({args.runs} runs) ...", flush=True)
    ten = bench(SF1, args.runs, args.cpus)
    wait_quiet(args.max_load, tag="100x leg")
    print(f"[scale100] bench 100x ({args.runs} runs) ...", flush=True)
    hundred = bench(SF10, args.runs, args.cpus)

    table = {}
    for q in QUERIES:
        f10, t10 = steady(ten, q)
        f100, t100 = steady(hundred, q)
        growth = round(t100 / t10, 2) if t10 and t100 else None
        table[q] = {"sf1_sec": round(t10, 3) if t10 else None,
                    "sf10_sec": round(t100, 3) if t100 else None,
                    "sf1_first_run_sec": round(f10, 3) if f10 else None,
                    "sf10_first_run_sec": round(f100, 3) if f100 else None,
                    "growth_100x_over_10x": growth}
    over = {q: r for q, r in table.items()
            if r["growth_100x_over_10x"] is not None
            and r["growth_100x_over_10x"] > args.threshold}
    t10sum = sum(r["sf1_sec"] for r in table.values() if r["sf1_sec"])
    t100sum = sum(r["sf10_sec"] for r in table.values() if r["sf10_sec"])
    result = {
        "data_ratio": 10.0,
        "threshold": args.threshold,
        "methodology": "per-query steady-state = median of runs 2..N "
                       "(run 1 discarded as JIT/page-cache warm-up; "
                       "recorded as *_first_run_sec)",
        "runs": args.runs,
        "loadavg_10x": ten.get("loadavg"),
        "loadavg_100x": hundred.get("loadavg"),
        "total_sf1": round(t10sum, 3),
        "total_sf10": round(t100sum, 3),
        "total_growth": round(t100sum / t10sum, 2) if t10sum else None,
        "n_queries": len(table),
        "n_over_threshold": len(over),
        "over_threshold": over,
        "queries": table,
    }
    with open(os.path.join(REPO, args.out), "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)
    print(f"[scale100] {len(table)} queries: {result['total_sf1']}s -> "
          f"{result['total_sf10']}s ({result['total_growth']}x at 10x data); "
          f"{len(over)} over {args.threshold}x -> {args.out}", flush=True)
    for q, r in sorted(over.items(),
                       key=lambda kv: -kv[1]["growth_100x_over_10x"]):
        print(f"[scale100] OVER: {q} {r['sf1_sec']}s -> {r['sf10_sec']}s "
              f"({r['growth_100x_over_10x']}x)", flush=True)
    return 1 if over else 0


if __name__ == "__main__":
    raise SystemExit(main())
