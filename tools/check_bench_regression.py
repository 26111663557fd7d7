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

Runs carrying "load" markers (Bench.scala r15+: /proc/loadavg, JVM count,
wall-vs-CPU per pass) are checked for MACHINE CONTENTION first: when either
side's non-us runnable load exceeds the contention threshold, or the two
sides' load differs materially, the tool REFUSES to compare (exit 2,
LOAD-MISMATCH) — same-code drift on a contended machine is not a
regression, and r13/r14 each burned an adjudication cycle proving that by
hand. Runs without markers (pre-r15 artifacts) compare as before.

Usage: check_bench_regression.py BASELINE.json NEW.json [threshold]
       check_bench_regression.py --self-test
Inputs are the raw one-line Bench stdout JSON ({"queries":..,"spread":..}).
"""
import json
import sys

# non-us runnable load (loadavg minus our own cpu/wall) above this
# fraction of the core count marks a run as contended; two runs whose
# other-load differs by more than this are not comparable either way
CONTENTION_FRAC = 0.15

# stolen hypervisor cycles above this fraction of (wall x cores) mark a
# run as contended even when other-load is clean (uniform slowdown mode);
# idle baseline on this host is ~0.028, the r17 1.21x incident implies
# ~0.17 — the bar sits well between the two
STEAL_FRAC = 0.05


def load(path):
    with open(path) as f:
        text = f.read().strip()
    # tolerate an sbt "[info] " prefix on a captured line
    start = text.find('{"metric"')
    if start < 0:
        raise SystemExit(f"{path}: no Bench JSON line found")
    d = json.loads(text[start:])
    return d.get("spread", {}), d.get("queries", {}), d.get("load")


def load_verdict(base_load, new_load):
    """(refuse, reason) from the two runs' load markers.

    Marker semantics: other_load_max = max over passes of
    (loadavg - our_cpu/wall), i.e. the runnable load that was NOT this
    bench. -1 / missing = marker unavailable (old artifact) -> comparable
    by default, exactly as before r15.
    """
    def other(l):
        if not l or l.get("other_load_max", -1) < 0:
            return None
        return float(l["other_load_max"])
    def cores(l):
        return float(l.get("cores", 32)) if l else 32.0
    ob, on = other(base_load), other(new_load)
    lim_b = CONTENTION_FRAC * cores(base_load)
    lim_n = CONTENTION_FRAC * cores(new_load)
    for side, o, lim in (("baseline", ob, lim_b), ("new", on, lim_n)):
        if o is not None and o > lim:
            return True, (f"{side} run is CONTENDED: other-load {o:.2f} > "
                          f"{lim:.2f} ({CONTENTION_FRAC} x cores)")
    # both below the contended bar can still be incomparable: half the
    # contention limit of asymmetry (e.g. 2.4 cores at 32) shifts shuffle-
    # heavy queries well past the 1.5x gate without either side "failing"
    if (ob is not None and on is not None
            and abs(ob - on) > 0.5 * min(lim_b, lim_n)):
        return True, (f"load markers differ materially: other-load "
                      f"{ob:.2f} (baseline) vs {on:.2f} (new)")
    # hypervisor steal (r17 marker): a co-tenant VM's cycles slow every
    # task UNIFORMLY without adding runnable load, so other-load stays
    # clean — the r17 close measured a 1.21x whole-suite min-vs-min shift
    # at other_load 0.93 whose only fingerprint was /proc/stat steal.
    # steal_frac_max is stolen-cycles / (wall x cores) per pass, maxed.
    def steal(l):
        if not l or l.get("steal_frac_max", -1) < 0:
            return None
        return float(l["steal_frac_max"])
    sb, sn = steal(base_load), steal(new_load)
    for side, s in (("baseline", sb), ("new", sn)):
        if s is not None and s > STEAL_FRAC:
            return True, (f"{side} run is STEAL-CONTENDED: steal fraction "
                          f"{s:.3f} > {STEAL_FRAC} of machine cycles")
    if sb is not None and sn is not None and abs(sb - sn) > 0.5 * STEAL_FRAC:
        return True, (f"steal markers differ materially: "
                      f"{sb:.3f} (baseline) vs {sn:.3f} (new)")
    return False, None


def main():
    if len(sys.argv) >= 2 and sys.argv[1] == "--self-test":
        self_test()
        return
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    base_path, new_path = sys.argv[1], sys.argv[2]
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    base_spread, base_med, base_load = load(base_path)
    new_spread, new_med, new_load = load(new_path)

    for tag, l in (("baseline", base_load), ("new", new_load)):
        if l:
            print(f"{tag} load: jvms={l.get('jvms')} "
                  f"other_load_max={l.get('other_load_max')} "
                  f"steal_frac_max={l.get('steal_frac_max', 'n/a')} "
                  f"cores={l.get('cores')}")
        else:
            print(f"{tag} load: no markers (pre-r15 artifact)")
    refuse, reason = load_verdict(base_load, new_load)
    if refuse:
        print(f"\nLOAD-MISMATCH: refusing to compare — {reason}")
        print("Re-run the bench serially (no other JVMs) and compare that.")
        sys.exit(2)

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


def self_test():
    """Prove the contention refusal works — the r14 verdict's 'done' bar:
    a contended run (the driver's 440.6 s re-run shape: other-load far
    above idle) must be FLAGGED, not compared."""
    clean = {"cores": 32, "jvms": 1,
             "passes": [{"wall": 100, "cpu": 900, "loadavg": 9.5}],
             "other_load_max": 0.5}
    # the r14 driver-rerun shape: a second JVM and ~12 runnable cores
    # that are not us
    contended = {"cores": 32, "jvms": 3,
                 "passes": [{"wall": 150, "cpu": 900, "loadavg": 18.0}],
                 "other_load_max": 12.0}
    mild = {"cores": 32, "jvms": 1,
            "passes": [{"wall": 100, "cpu": 900, "loadavg": 11.0}],
            "other_load_max": 2.0}
    cases = [
        ("clean vs clean compares", clean, clean, False),
        ("contended NEW run refused", clean, contended, True),
        ("contended BASELINE refused", contended, clean, True),
        ("materially different other-load refused", clean,
         dict(clean, other_load_max=6.0), True),
        ("sub-threshold but asymmetric load refused", clean,
         dict(clean, other_load_max=4.0), True),
        ("mild, similar load compares", mild, dict(mild, other_load_max=2.5),
         False),
        ("pre-r15 artifacts (no markers) compare", None, None, False),
        ("one-sided markers compare (old baseline)", None, clean, False),
        ("unavailable marker (-1) treated as absent", clean,
         dict(clean, other_load_max=-1), False),
        # r17 steal cases: uniform hypervisor slowdown with CLEAN
        # other-load must still refuse (the 1.21x-at-other_load-0.93
        # incident), and idle-level steal must stay comparable
        ("steal-contended NEW run refused (clean other-load)",
         dict(clean, steal_frac_max=0.02),
         dict(clean, steal_frac_max=0.17), True),
        ("steal-contended BASELINE refused",
         dict(clean, steal_frac_max=0.17),
         dict(clean, steal_frac_max=0.02), True),
        ("materially different steal refused",
         dict(clean, steal_frac_max=0.005),
         dict(clean, steal_frac_max=0.045), True),
        ("idle-level steal both sides compares",
         dict(clean, steal_frac_max=0.028),
         dict(clean, steal_frac_max=0.031), False),
        ("absent steal marker (old artifact) compares",
         clean, dict(clean, steal_frac_max=0.03), False),
        ("unavailable steal (-1) treated as absent",
         dict(clean, steal_frac_max=-1),
         dict(clean, steal_frac_max=0.03), False),
    ]
    failed = 0
    for name, b, n, want_refuse in cases:
        got, reason = load_verdict(b, n)
        ok = got == want_refuse
        print(f"{'ok ' if ok else 'FAIL'} {name}"
              + (f" ({reason})" if got else ""))
        failed += 0 if ok else 1
    if failed:
        raise SystemExit(f"self-test: {failed} case(s) failed")
    print("self-test: all cases pass")


if __name__ == "__main__":
    main()
