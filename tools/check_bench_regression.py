#!/usr/bin/env python3
"""Per-query bench regression gate.

Compares a new Bench run against a stored baseline and fails (exit 1) on
high-confidence regressions. A query is flagged only when its ENTIRE new
spread sits above `threshold` x its ENTIRE old spread (new_min >
threshold * old_max): with interleaved passes (Bench.scala), a contention
burst can taint at most one of the three samples, so all-three-samples
shifts are real. Queries present on only one side are listed as
informational (added/removed) and never fail the gate — refresh the
baseline when the query set or an implementation intentionally changes:

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" \
      2>/dev/null | grep -o '{"metric".*}' > BENCH_BASELINE.json

Usage: check_bench_regression.py BASELINE.json NEW.json [threshold]
Inputs are the raw one-line Bench stdout JSON ({"queries":..,"spread":..}).
"""
import json
import sys


def load(path):
    with open(path) as f:
        text = f.read().strip()
    # tolerate an sbt "[info] " prefix on a captured line
    start = text.find('{"metric"')
    if start < 0:
        raise SystemExit(f"{path}: no Bench JSON line found")
    d = json.loads(text[start:])
    return d.get("spread", {}), d.get("queries", {})


def main():
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    base_path, new_path = sys.argv[1], sys.argv[2]
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    base_spread, base_med = load(base_path)
    new_spread, new_med = load(new_path)

    common = sorted(set(base_spread) & set(new_spread))
    added = sorted(set(new_spread) - set(base_spread))
    removed = sorted(set(base_spread) - set(new_spread))

    regressions = []
    print(f"{'query':40s} {'old [min med max]':>26s} {'new [min med max]':>26s} "
          f"{'med ratio':>9s}  verdict")
    for q in common:
        ob, nb = base_spread[q], new_spread[q]
        if ob[0] < 0 or nb[0] < 0:  # a failed pass on either side
            verdict = "FAILED-PASS"
            regressions.append(q)
        else:
            ratio = nb[1] / ob[1] if ob[1] > 0 else float("inf")
            regressed = nb[0] > threshold * ob[2]
            verdict = f"REGRESSED(> {threshold}x)" if regressed else "ok"
            if regressed:
                regressions.append(q)
        def fmt(s):
            return "[" + " ".join(f"{x:.2f}" for x in s) + "]"
        # A failed pass is recorded as a single-element [-1.0] spread, so
        # the median index only exists on healthy passes.
        r = (nb[1] / ob[1]
             if len(ob) > 1 and len(nb) > 1 and ob[1] > 0 and nb[1] >= 0
             else float("nan"))
        print(f"{q:40s} {fmt(ob):>26s} {fmt(nb):>26s} {r:9.2f}  {verdict}")
    for q in added:
        print(f"{q:40s} {'-':>26s} {str(new_spread[q]):>26s} {'':9s}  new (no baseline)")
    for q in removed:
        print(f"{q:40s} {str(base_spread[q]):>26s} {'-':>26s} {'':9s}  removed")

    print(f"\n{len(common)} compared, {len(added)} new, {len(removed)} removed, "
          f"{len(regressions)} regressions (threshold {threshold}x)")
    if regressions:
        print("REGRESSED: " + ", ".join(regressions))
        sys.exit(1)
    print("bench regression gate: clean")


if __name__ == "__main__":
    main()
