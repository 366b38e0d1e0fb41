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

The query list is the UNION of queries >= threshold in BENCH_SELF.json
(the committed quiet-host suite run) and in the latest driver artifact
(BENCH_r*.json) — so every driver-side mover gets a committed isolated
rebuttal even when it stayed under the cut on the quiet host.

Usage:
  python3 tools/bench_heavy.py                 # union >= 5 s
  python3 tools/bench_heavy.py --threshold 7
  python3 tools/bench_heavy.py q383_hyperanf,q316_...

Each JVM runs from a scratch cwd so graft.Bench's BENCH_SELF.json side
file never clobbers the committed suite-level artifact. The output JSON
is rewritten after every query, so a hung or killed run keeps every
completed measurement; a per-query timeout records a sentinel row
instead of aborting the sweep.
"""
import glob, json, os, re, subprocess, sys, time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRATCH = "/tmp/bench_heavy_cwd"
CP = f"{REPO}/target/scala-2.13/classes:/opt/spark/jars/*"


def load_queries(path):
    try:
        with open(path) as f:
            return json.load(f).get("queries", {}) or {}
    except (OSError, ValueError):
        return {}


def latest_driver_bench():
    rounds = sorted(glob.glob(f"{REPO}/BENCH_r*.json"),
                    key=lambda p: int(re.search(r"r(\d+)", p).group(1)))
    return rounds[-1] if rounds else None


def pick_queries(threshold):
    """Union of (self >= threshold, latest driver >= threshold)."""
    self_q = load_queries(f"{REPO}/BENCH_SELF.json")
    driver = latest_driver_bench()
    driver_q = load_queries(driver) if driver else {}
    names = {n for n, v in self_q.items()
             if isinstance(v, (int, float)) and v >= threshold}
    names |= {n for n, v in driver_q.items()
              if isinstance(v, (int, float)) and v >= threshold
              and n in load_all_names()}
    src = {"self": f"{REPO}/BENCH_SELF.json", "driver": driver}

    def key(n):
        return -max(self_q.get(n, 0) if isinstance(self_q.get(n, 0),
                                                   (int, float)) else 0,
                    driver_q.get(n, 0) if isinstance(driver_q.get(n, 0),
                                                     (int, float)) else 0)
    return sorted(names, key=key), src


def load_all_names():
    """Registered query names — guards against stale driver keys for
    queries renamed/removed since the driver artifact was written."""
    names = set()
    for p in glob.glob(f"{REPO}/src/main/scala/graft/queries/*.scala"):
        with open(p) as f:
            names |= set(re.findall(r'"(q\d+[a-z0-9_]*)"', f.read()))
    return names


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
    try:
        p = subprocess.run(
            ["java", "-cp", CP, "graft.Bench"],
            cwd=SCRATCH, env=env, capture_output=True, text=True,
            timeout=1200)
    except subprocess.TimeoutExpired:
        return {"median": -1.0, "trials": [],
                "jvm_wall_sec": round(time.time() - t0, 1),
                "timeout": True}
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
    src = None
    if names is None:
        names, src = pick_queries(threshold)
    os.makedirs(SCRATCH, exist_ok=True)
    out = {"sf": sf, "method": "one fresh JVM per query (java -cp, "
           "scratch cwd), 1 untimed warm-up + 3 timed trials "
           "(5 on >3x spread), median", "threshold": threshold,
           "sources": src, "queries": {}}
    for i, name in enumerate(names):
        r = run_one(name, sf)
        out["queries"][name] = r
        print(f"[{i + 1}/{len(names)}] {name}: median={r['median']} "
              f"trials={r['trials']}", flush=True)
        # incremental write: a hung/killed later query loses nothing
        with open(f"{REPO}/BENCH_HEAVY_SELF.json", "w") as f:
            json.dump(out, f, indent=1)
    print(f"wrote {REPO}/BENCH_HEAVY_SELF.json ({len(names)} queries)")


if __name__ == "__main__":
    main()
