#!/usr/bin/env python3
"""Regenerate src/main/resources/graft/bench_ref.tsv from a bench.json.

The tsv is Bench's pinned per-query steady reference band (see
Bench.scala RefSteady): it only decides when to RESAMPLE and when to
flag a value as `noisy` in the artifact -- it is never folded into the
emitted numbers. Regenerate from a quiet-host full run (host_factor
near 1.0, no `noisy` entries) whenever the query set or plans
materially change:

    SPARK_GRAFT_CPUS=32 sbt "runMain graft.Bench /tmp/bench_ref.json"
    python3 tools/gen_bench_ref.py /tmp/bench_ref.json
"""
import json, sys
src = sys.argv[1] if len(sys.argv) > 1 else "bench.json"
out = sys.argv[2] if len(sys.argv) > 2 else \
    "src/main/resources/graft/bench_ref.tsv"
d = json.load(open(src))
if d.get("noisy"):
    print("WARNING: source run itself has noisy entries %s -- use a "
          "quieter window" % list(d["noisy"]))
lines = [
    "# Pinned per-query steady reference band for Bench's noise detection",
    "# (VERDICT r10 task #1). Source: full quiet-host bench, sf0.1,",
    "# local[32], host_factor %.3f, total %.1fs." % (
        d.get("host_factor", -1), d.get("value", -1)),
    "# Regenerate with tools/gen_bench_ref.py <bench.json> when the query",
    "# set or plans materially change. Used only to trigger resampling /",
    "# the `noisy` flag -- never folded into emitted numbers.",
]
for k in sorted(d["queries"]):
    lines.append("%s\t%.3f" % (k, d["queries"][k]))
open(out, "w").write("\n".join(lines) + "\n")
print("%d entries -> %s" % (len(d["queries"]), out))
