#!/usr/bin/env python3
"""Isolated heavy-query bench -> BENCH_HEAVY_SELF.json.

The in-suite bench (graft.Bench over the full registry) reports heavy
queries (> the adaptive-trials cut, 3 s) from a SINGLE trial inside a
400+-query session — round-over-round comparisons of those numbers ride
on one sample taken under whatever GC/codegen pressure the preceding
queries left behind. This script is the isolated bracket: one FRESH JVM
per heavy query (java -cp, no sbt), one untimed warm-up execution, then
3 timed trials (5 on >3x spread — graft.Bench's own retrial rule, which
applies because SPARK_GRAFT_HEAVY_CUT is raised out of the way), median
reported.

Usage:
  python3 tools/bench_heavy.py                 # queries >= 5 s in BENCH_SELF.json
  python3 tools/bench_heavy.py --threshold 7
  python3 tools/bench_heavy.py q383_hyperanf,q316_...

Each JVM runs from a scratch cwd so graft.Bench's BENCH_SELF.json side
file never clobbers the committed suite-level artifact.
"""
import json, os, subprocess, sys, time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRATCH = "/tmp/bench_heavy_cwd"
CP = f"{REPO}/target/scala-2.13/classes:/opt/spark/jars/*"


def pick_queries(threshold):
    with open(f"{REPO}/BENCH_SELF.json") as f:
        self_bench = json.load(f)
    meds = self_bench["queries"]
    return sorted((n for n, v in meds.items() if v >= threshold),
                  key=lambda n: -meds[n])


def run_one(name, sf):
    env = dict(os.environ,
               SPARK_GRAFT_CPUS="32",
               SPARK_GRAFT_SF_DIR=sf,
               SPARK_GRAFT_ONLY=name,
               SPARK_GRAFT_TRIALS="3",
               SPARK_GRAFT_HEAVY_CUT="1000000000",
               SPARK_GRAFT_BENCH_SOFT_BUDGET="1000000000",
               SPARK_GRAFT_BENCH_HARD_BUDGET="1000000000")
    t0 = time.time()
    p = subprocess.run(
        ["java", "-cp", CP, "graft.Bench"],
        cwd=SCRATCH, env=env, capture_output=True, text=True, timeout=1200)
    wall = time.time() - t0
    for line in p.stdout.splitlines():
        if '"trials"' in line:
            d = json.loads(line)
            return {"median": d["queries"][name],
                    "trials": d["trials"][name],
                    "jvm_wall_sec": round(wall, 1)}
    return {"median": -1.0, "trials": [], "jvm_wall_sec": round(wall, 1),
            "rc": p.returncode}


def main():
    threshold = 5.0
    names = None
    args = sys.argv[1:]
    while args:
        a = args.pop(0)
        if a == "--threshold":
            threshold = float(args.pop(0))
        else:
            names = a.split(",")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if names is None:
        names = pick_queries(threshold)
    os.makedirs(SCRATCH, exist_ok=True)
    out = {"sf": sf, "method": "one fresh JVM per query (java -cp, "
           "scratch cwd), 1 untimed warm-up + 3 timed trials "
           "(5 on >3x spread), median", "threshold": threshold,
           "queries": {}}
    for i, name in enumerate(names):
        r = run_one(name, sf)
        out["queries"][name] = r
        print(f"[{i + 1}/{len(names)}] {name}: median={r['median']} "
              f"trials={r['trials']}", flush=True)
    with open(f"{REPO}/BENCH_HEAVY_SELF.json", "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {REPO}/BENCH_HEAVY_SELF.json ({len(names)} queries)")


if __name__ == "__main__":
    main()
