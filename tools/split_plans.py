#!/usr/bin/env python3
"""Split a graft.Explain dump (========== qNNN ========== sections) into
per-query plan files: plans/r13/<query>_<suffix>.txt.

Usage: split_plans.py <dump.txt> <outdir> <suffix>
"""
import sys, os, re

dump, outdir, suffix = sys.argv[1], sys.argv[2], sys.argv[3]
os.makedirs(outdir, exist_ok=True)
text = open(dump).read()
parts = re.split(r"\n?========== (\S+) ==========\n", text)
# parts[0] is preamble; then alternating name, body
n = 0
for i in range(1, len(parts) - 1, 2):
    name, body = parts[i], parts[i + 1]
    with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
        f.write(body.strip() + "\n")
    n += 1
print(f"wrote {n} plan files to {outdir} (suffix {suffix})")
