#!/usr/bin/env python3
"""Two-SF scaling audit: run graft.Bench at a small and a large scale
factor on the same query subset and report per-query scaling exponents.

    exponent = log10(t_large / t_small)   for a 10x SF ratio:
    1.0 = linear in data, 0 = flat (scheduling-floor-bound), 2.0 = quadratic

This is the protocol that caught d03 (2.08), d10 (1.63) and g38 (1.78)
in round 9 (PERF.md). Usage:

    python3 tools/gen_sf1.py                      # once, builds target/sf1.0
    python3 tools/scaling_audit.py g38,g36,g47    # audit a subset
    python3 tools/scaling_audit.py --all          # every query (slow)
    python3 tools/scaling_audit.py --threshold 2.0 BENCH.json
                                                  # derive the subset from a
                                                  # prior bench json (queries
                                                  # >= 2s)

Exponents are single-run: sf1.0 noise on heavy queries is +/-30-40%
(PERF.md round 9), so treat anything under ~1.2 as noise-compatible
with linear and re-run with --runs 3 before acting.

ENFORCE mode (round 10, VERDICT r9 item 3 — makes the audit
self-enforcing instead of report-only):

    python3 tools/scaling_audit.py --enforce --runs 3 g05,g08,d03,...

fails (exit 1) when any NON-ALLOW-LISTED query with a large-SF median
>= 2 s shows exponent > 1.2 on the run medians. The allow-list carries
the two CONTRACTUAL super-linears with their reasons; anything else
going super-linear is a regression. Demo of the tripwire (documented
dry run, PERF.md round 10): `--enforce --plant q=exp` injects a fake
exponent for one query and must exit non-zero.
"""
import json
import math
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SMALL = os.environ.get("GRAFT_AUDIT_SMALL", "/root/testdata/sf0.1")
LARGE = os.environ.get("GRAFT_AUDIT_LARGE", os.path.join(REPO, "target/sf1.0"))


def run_bench(sf_dir, only, runs):
    per_query = {}
    for _ in range(runs):
        # SPARK_GRAFT_RUNS=1: this loop does its own cold-JVM draws and
        # medians them; Bench's internal multi-run mode (round 12) would
        # re-run the sweep warm inside one JVM, which is a different (and
        # for scaling purposes less honest) protocol.
        env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir, SPARK_GRAFT_CPUS="32",
                   SPARK_GRAFT_RUNS="1")
        if only:
            env["SPARK_GRAFT_ONLY"] = only
        out = subprocess.run(
            ["sbt", "runMain graft.Bench"], cwd=REPO, env=env,
            capture_output=True, text=True, check=True).stdout
        qline = next(l for l in out.splitlines() if l.startswith("{") and '"queries"' in l)
        for k, v in json.loads(qline)["queries"].items():
            per_query.setdefault(k, []).append(v)
    return {k: statistics.median(v) for k, v in per_query.items()}


# Contractual super-linear queries: enforcement applies a PER-QUERY CEILING
# exponent instead of the global limit (round 12 — an unconditional waiver
# would let a contractual query regress arbitrarily without tripping).
# Ceilings = observed r10 exponent + noise headroom: v07 drew 1.79 (exact
# all-pairs is ~2.0 by contract), v09 drew 1.61 (output-driven).
ALLOWED_SUPERLINEAR = {
    "v07": (2.1, "declared exact all-pairs embedding near-dup baseline "
                 "(quadratic by contract; v09 is the scale path)"),
    "v09": (1.9, "output-driven: gen_sf1's noise-perturbed replicas multiply "
                 "the near-dup pair count 722x; runtime is sub-linear per "
                 "output row"),
}

ENFORCE_EXPONENT = 1.2   # on run medians, queries with large-SF >= 2 s
ENFORCE_FLOOR_SEC = 2.0


def main():
    args = [a for a in sys.argv[1:]]
    runs = 1
    if "--runs" in args:
        i = args.index("--runs")
        runs = int(args[i + 1])
        del args[i:i + 2]
    enforce = "--enforce" in args
    if enforce:
        args.remove("--enforce")
    plant = None
    if "--plant" in args:
        i = args.index("--plant")
        q, e = args[i + 1].split("=")
        plant = (q, float(e))
        del args[i:i + 2]
    threshold = None
    if "--threshold" in args:
        i = args.index("--threshold")
        threshold = float(args[i + 1])
        del args[i:i + 2]
    only = None
    if args and args[0] == "--all":
        pass
    elif threshold is not None and args:
        prior = json.load(open(args[0]))
        qs = prior.get("queries") or prior.get("parsed", {}).get("queries", {})
        only = ",".join(sorted({k.split("_")[0] for k, v in qs.items() if v >= threshold}))
        print(f"# derived subset: {only}")
    elif args:
        only = args[0]
    else:
        print(__doc__)
        sys.exit(2)

    if not os.path.isdir(LARGE):
        sys.exit(f"{LARGE} missing - run tools/gen_sf1.py first")
    a = run_bench(SMALL, only, runs)
    b = run_bench(LARGE, only, runs)
    if plant:
        # tripwire demo: pretend query q's large-SF time implies the
        # given exponent, so --enforce must flag it and exit non-zero
        q, e = plant
        if q not in a:
            a[q] = 1.0
        b[q] = a[q] * (10 ** e)
        print(f"# planted {q} at exponent {e}")
    rows = sorted(((k, a[k], b[k], math.log10(max(b[k], 1e-3) / max(a[k], 1e-3)))
                   for k in a if k in b), key=lambda r: -r[3])
    limit = ENFORCE_EXPONENT if enforce else 1.05
    print(f"{'query':40s} {'small(s)':>9} {'large(s)':>9} {'exponent':>9}")
    bad, waived = [], []
    for k, t0, t1, e in rows:
        short = k.split("_")[0]
        ceiling = ALLOWED_SUPERLINEAR.get(short, (limit,))[0]
        over = e > ceiling and t1 > ENFORCE_FLOOR_SEC
        if over:
            bad.append(k)
            flag = "  <-- SUPER-LINEAR" + (
                f" (exceeds contractual ceiling {ceiling})"
                if short in ALLOWED_SUPERLINEAR else "")
        elif short in ALLOWED_SUPERLINEAR and e > limit and t1 > ENFORCE_FLOOR_SEC:
            waived.append(k)
            flag = f"  (contractual, within ceiling {ceiling})"
        else:
            flag = ""
        print(f"{k:40s} {t0:9.2f} {t1:9.2f} {e:9.2f}{flag}")
    for k in waived:
        c, reason = ALLOWED_SUPERLINEAR[k.split("_")[0]]
        print(f"# within ceiling {c} {k}: {reason}")
    if bad:
        print(f"\n{len(bad)} super-linear (limit {limit}, floor "
              f"{ENFORCE_FLOOR_SEC}s): {bad}")
    else:
        print("\nall linear-or-better (excluding allow-listed)")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
