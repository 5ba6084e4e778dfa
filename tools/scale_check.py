#!/usr/bin/env python3
"""The 10x scale rehearsal, as a single un-skippable entry point.

Benches the full declared query surface at sf0.1 and at the key-shifted
10x replica (tmp/sf1, built by make_sf1.py on demand), takes per-query
medians on both sides, and emits a machine-readable growth table:

    python3 tools/scale_check.py --out SCALE_r6.json [--runs 3]
                                 [--threshold 10.0] [--rebuild]

Exit 0 only if EVERY query's growth (sf1 median / sf0.1 median) is at
or under the threshold; otherwise it prints the offenders and exits 1.
A query growing faster than the data (>10x at 10x) is super-linear —
the signature of an accidental quadratic (the r5 rehearsal caught
exactly that in q_semdedup) or a single-task collapse.
"""
import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(REPO, "tmp", "sf1")


def wait_quiet(max_load: float, timeout_s: int = 900, tag: str = "") -> None:
    """Idle until the 1-minute loadavg drops under max_load (or timeout)
    — chained legs otherwise start in the prior JVM's teardown churn
    (see tools/scale30.py for the r10→r11 lesson)."""
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
    """One graft.Bench invocation; returns the full medians payload."""
    out = tempfile.NamedTemporaryFile(suffix=".json", delete=False).name
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_CPUS=cpus,
               SPARK_GRAFT_BENCH_RUNS=str(runs),
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


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="SCALE_LAST.json")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--threshold", type=float, default=10.0)
    ap.add_argument("--cpus", default="32")
    ap.add_argument("--rebuild", action="store_true",
                    help="rebuild tmp/sf1 even if present")
    ap.add_argument("--max-load", type=float, default=2.0,
                    help="wait until 1-min loadavg is below this before each leg")
    args = ap.parse_args()

    if args.rebuild or not os.path.isdir(SF1):
        print(f"[scale] building 10x replica at {SF1} ...", flush=True)
        subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "make_sf1.py"),
             SF01, SF1], check=True)

    wait_quiet(args.max_load, tag="sf0.1 leg")
    print(f"[scale] bench sf0.1 ({args.runs} runs) ...", flush=True)
    small = bench(SF01, args.runs, args.cpus)
    wait_quiet(args.max_load, tag="sf1 leg")
    print(f"[scale] bench sf1 ({args.runs} runs) ...", flush=True)
    big = bench(SF1, args.runs, args.cpus)

    table = {}
    for q, t01 in sorted(small["medians"].items()):
        t1 = big["medians"].get(q)
        growth = round(t1 / t01, 2) if t1 is not None and t01 > 0 else None
        table[q] = {"sf01_sec": round(t01, 3),
                    "sf1_sec": round(t1, 3) if t1 is not None else None,
                    "growth": growth}
    over = {q: r for q, r in table.items()
            if r["growth"] is not None and r["growth"] > args.threshold}
    missing = sorted(set(small["medians"]) ^ set(big["medians"]))
    result = {
        "data_ratio": 10,
        "threshold": args.threshold,
        "runs": args.runs,
        "total_sf01": round(small["total_of_medians"], 3),
        "total_sf1": round(big["total_of_medians"], 3),
        "total_growth": round(
            big["total_of_medians"] / small["total_of_medians"], 2),
        "n_queries": len(table),
        "n_over_threshold": len(over),
        "over_threshold": over,
        "missing_on_one_side": missing,
        "queries": table,
    }
    with open(os.path.join(REPO, args.out), "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)
    print(f"[scale] {len(table)} queries: total {result['total_sf01']}s -> "
          f"{result['total_sf1']}s ({result['total_growth']}x at 10x data); "
          f"{len(over)} over {args.threshold}x -> {args.out}", flush=True)
    for q, r in sorted(over.items(), key=lambda kv: -kv[1]["growth"]):
        print(f"[scale] OVER: {q} {r['sf01_sec']}s -> {r['sf1_sec']}s "
              f"({r['growth']}x)", flush=True)
    if missing:
        print(f"[scale] WARNING: asymmetric query sets: {missing}", flush=True)
    return 1 if over or missing else 0


if __name__ == "__main__":
    raise SystemExit(main())
