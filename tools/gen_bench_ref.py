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
import datetime, json, sys
args = [a for a in sys.argv[1:] if a not in ("--force", "--merge")]
force = "--force" in sys.argv[1:]
# --merge (round-13): ADD bands for queries missing from the existing
# tsv, keeping every existing pin untouched -- the additive-query
# case, where wholesale re-pinning from whatever run happens to be
# available would silently loosen (or tighten) 300+ good bands to
# that run's conditions just to cover one new row.
merge = "--merge" in sys.argv[1:]
src = args[0] if len(args) > 0 else "bench.json"
out = args[1] if len(args) > 1 else \
    "src/main/resources/graft/bench_ref.tsv"
d = json.load(open(src))
# Refuse (VERDICT r11 task #1) to pin a band from a run that flags its
# own numbers: a noisy source would bake contention into the reference
# and defeat every downstream band check. --force overrides (e.g. to
# pin the non-noisy majority while a known-hot host cools down).
if d.get("noisy") and not force:
    sys.exit("REFUSED: source run has noisy entries %s -- regenerate "
             "from a quiet window, or pass --force" % list(d["noisy"]))
if d.get("failed") and not force:
    sys.exit("REFUSED: source run has failed queries %s -- their bands "
             "would silently vanish; fix or pass --force"
             % list(d["failed"]))
# Round-15: the bench now stamps each run promotable against its drift
# (run total / CURRENT pinned total). A stamped-false source ran in a
# diffuse window the per-query noise defenses could not localize --
# pinning from it would bake that window into every band at once, the
# whole-file version of the per-query contamination refused above.
# (Absent field = pre-r15 artifact, no check.)
if d.get("promotable") is False and not force:
    sys.exit("REFUSED: source run is stamped promotable:false (drift "
             "%s > threshold %s) -- regenerate from a promotable run, "
             "or pass --force" % (d.get("drift"), d.get("promote_threshold")))
import os
# --merge against a missing tsv degrades to a plain regen (r13 ADVICE:
# an unhandled FileNotFoundError here is just a worse way to say "there
# is nothing to merge into").
if merge and not os.path.exists(out):
    print("--merge: %s does not exist yet; falling back to full regen"
          % out)
    merge = False
# The human-readable Source line is rewritten from the SOURCE RUN'S OWN
# totals on every full regen (VERDICT r13 task #2 -- a stale Source
# header that contradicts NOTES is exactly the archaeology the
# generated: stamp was meant to kill). In --merge mode the source run
# only vouches for the ADDED pins, so the prior Source line -- which
# describes the kept majority -- is preserved and the merge-source run
# is described on its own line scoped to the added entries.
prior_source = []
if merge:
    # 'host_factor' is in the marker set (r14 ADVICE): the full-regen
    # format writes Source as TWO lines and the continuation line
    # ('# host_factor 1.015, total 130.9s.') matched none of the
    # original markers, so the first merge dropped the kept pins'
    # host_factor/total and left a dangling 'Source: ...,' line.
    prior_source = [l.rstrip("\n") for l in open(out)
                    if l.startswith("#") and
                    ("Source:" in l or "merge-source" in l or
                     "local[32]" in l or "host_factor" in l)]
if merge and prior_source:
    source_lines = prior_source
else:
    source_lines = [
        "# Source: full quiet-host bench, sf0.1, local[32],",
        "# host_factor %.3f, total %.1fs." % (
            d.get("host_factor", -1), d.get("value", -1)),
    ]
lines = [
    # Provenance stamp (VERDICT r12 task #6): Bench emits this line's
    # value plus the tsv's SHA-256 in every artifact as `ref_tsv`, so a
    # stale-band analysis never needs git archaeology.
    "# generated: %s" % datetime.datetime.now(
        datetime.timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ"),
    "# Pinned per-query steady reference band for Bench's noise detection",
    "# (VERDICT r10 task #1).",
] + source_lines + [
    "# Regenerate with tools/gen_bench_ref.py <bench.json> when the query",
    "# set or plans materially change. Used only to trigger resampling /",
    "# the `noisy` flag -- never folded into emitted numbers.",
]
entries = {k: "%.3f" % d["queries"][k] for k in d["queries"]}
if merge:
    kept = {}
    for line in open(out):
        line = line.strip()
        if line and not line.startswith("#") and "\t" in line:
            k, v = line.split("\t", 1)
            kept[k] = v
    added = sorted(set(entries) - set(kept))
    if not added:
        sys.exit("--merge: no new queries to add; tsv unchanged")
    entries = {**{k: kept[k] for k in kept}, **{k: entries[k] for k in added}}
    lines[0] += " merge:+%d" % len(added)
    # scope the merge-source run to the pins it actually produced
    lines.insert(3, "# merge-source (added pins %s only): host_factor "
                 "%.3f, total %.1fs." % (
                     ",".join(added), d.get("host_factor", -1),
                     d.get("value", -1)))
    print("merge: keeping %d pins, adding %s" % (len(kept), added))
for k in sorted(entries):
    lines.append("%s\t%s" % (k, entries[k]))
open(out, "w").write("\n".join(lines) + "\n")
print("%d entries -> %s" % (len(entries), out))
