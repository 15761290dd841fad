#!/usr/bin/env python3
"""Cross-coverage verdict over two scale_probe runs (round-16, VERDICT
r15 task #2).

Round 15's dual-run discipline — on a day of roving contention waves,
run the full probe twice and check that every arm elevated in one run
reads clean in the other — was executed by hand, and the NOTES prose
summarizing it overclaimed ("No arm is elevated in both runs") because
the diff was manual. This tool automates it: given two weak_scaling
JSONs from the same code, it emits a per-arm
{adj_in_a, adj_in_b, min_adj_in, elevated_in_both} map with STANDING
adjudications carved out in-artifact, and a one-word verdict.

An arm is "elevated" when its adj_in (time ratio / input growth; 1.0 =
perfectly input-linear on fixed cores) exceeds the threshold. An arm
elevated in BOTH runs is a plan-regression suspect UNLESS a standing
adjudication explains it:

  - deliberate:    an exact grounding arm whose cost is the point
                   (two_hop_exact grounds two_hop_sketch's recall);
  - output_bound:  output grows much faster than input by construction
                   (graph_triangles: 10x input is ~1000x output
                   triangles on the densified corpus), so the honest
                   metric is the PER-OUTPUT adj_ratio, which the entry
                   then reports and judges instead;
  - persists_solo: the artifact's own in-run adjudication re-ran the
                   arm solo in a fresh JVM and the growth persisted —
                   a by-construction classification, not contention
                   (carved out only when BOTH runs that adjudicated it
                   agree).

Standing tags are read from the artifacts themselves when present
(ScaleProbe emits "deliberate"/"output_bound" arm tags from round 16
on) and fall back to the built-in map below for pre-r16 artifacts.

Usage:
  cross_cover.py A.json B.json [-o out.json] [--threshold 1.5]
Exit 0 when every both-elevated arm is explained; 1 otherwise.
"""
import argparse
import json
import sys

# Standing adjudications for artifacts that predate the in-artifact
# tags (r15 and earlier). Keep in sync with ScaleProbe.ArmTags.
BUILTIN_STANDING = {
    "two_hop_exact": "deliberate",
    "graph_triangles": "output_bound",
}


def load(path):
    with open(path) as f:
        return json.load(f)


def arm_map(doc):
    """name -> arm object, skipping the non-arm top-level keys."""
    skip = {"metric", "copies", "adj_threshold", "adjudication"}
    return {k: v for k, v in doc.items()
            if k not in skip and isinstance(v, dict) and "adj_in" in v}


def effective_adj_in(doc, name, arm):
    """The run's best reading for the arm: the in-run adjudication's
    SOLO adj_in when one exists (a fresh-JVM re-run supersedes the
    contended full-run reading), else the full-run adj_in."""
    adj = doc.get("adjudication") or {}
    entry = adj.get(name)
    if entry and isinstance(entry.get("solo"), dict):
        solo = entry["solo"].get("adj_in")
        if solo is not None:
            return float(solo), entry.get("verdict", "")
    return float(arm["adj_in"]), (entry or {}).get("verdict", "")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_a")
    ap.add_argument("run_b")
    ap.add_argument("-o", "--out", default=None)
    ap.add_argument("--threshold", type=float, default=1.5)
    args = ap.parse_args()

    a, b = load(args.run_a), load(args.run_b)
    arms_a, arms_b = arm_map(a), arm_map(b)
    common = sorted(set(arms_a) & set(arms_b))
    only_a = sorted(set(arms_a) - set(arms_b))
    only_b = sorted(set(arms_b) - set(arms_a))

    out_arms = {}
    unexplained = []
    for name in common:
        ai, va = effective_adj_in(a, name, arms_a[name])
        bi, vb = effective_adj_in(b, name, arms_b[name])
        elevated_a = ai > args.threshold
        elevated_b = bi > args.threshold
        both = elevated_a and elevated_b
        # standing adjudication: in-artifact tag (either run) first,
        # then the built-in fallback for pre-tag artifacts, then a
        # persists_solo agreement between both runs' own adjudications
        standing = None
        for arm in (arms_a[name], arms_b[name]):
            if arm.get("deliberate"):
                standing = "deliberate"
            elif arm.get("output_bound"):
                standing = standing or "output_bound"
        standing = standing or BUILTIN_STANDING.get(name)
        if standing is None and va == "persists_solo" and vb == "persists_solo":
            standing = "persists_solo"
        entry = {
            "adj_in_a": round(ai, 3),
            "adj_in_b": round(bi, 3),
            "min_adj_in": round(min(ai, bi), 3),
            "elevated_in_both": both,
        }
        if standing:
            entry["standing"] = standing
        if standing == "output_bound":
            # the honest metric for an output-bound arm: per-output time
            entry["adj_ratio_a"] = arms_a[name].get("adj_ratio")
            entry["adj_ratio_b"] = arms_b[name].get("adj_ratio")
            ra = entry["adj_ratio_a"]
            rb = entry["adj_ratio_b"]
            # still a suspect if even the per-output ratio is elevated
            # in both runs
            if both and ra is not None and rb is not None and \
                    ra > args.threshold and rb > args.threshold:
                unexplained.append(name)
        elif both and standing is None:
            unexplained.append(name)
        out_arms[name] = entry

    result = {
        "metric": "cross_cover",
        "threshold": args.threshold,
        "runs": [args.run_a, args.run_b],
        "arms": out_arms,
        "only_in_a": only_a,
        "only_in_b": only_b,
        "elevated_in_both_unexplained": unexplained,
        "verdict": "clean" if not unexplained else "regression_suspect",
    }
    text = json.dumps(result, indent=1)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text + "\n")
    print(text)
    return 0 if not unexplained else 1


if __name__ == "__main__":
    sys.exit(main())
