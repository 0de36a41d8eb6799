#!/usr/bin/env python3
"""Scale-up smoke: compare two Bench JSON lines (e.g. sf0.1 vs sf1 = 10x rows)
and flag queries whose wall time grew superlinearly.

Usage: python3 tools/scale_check.py <small_bench.log> <big_bench.log> [factor]

`factor` is the data-scale ratio between the two runs (default 10). A query
scaling linearly grows <= factor; with per-query fixed cost (plan, codegen,
task dispatch ~0.2 s locally) the observed ratio sits well below it, so the
superlinear flag fires only ABOVE factor * SLACK. Labeled quadratic anchors
(exact all-pairs / exact sort shapes whose scale twins ship alongside) are
expected to grow ~factor^2 and are reported separately, not flagged.

Exit 1 if any non-anchor query is superlinear or errored in the big run.
"""
import json
import re
import sys

# Deliberate exact anchors documented in README (scale twin in parentheses):
# q48 exact all-pairs cosine (twin q24 LSH), q23 exact n-gram Jaccard probes
# (twin q21 MinHash-LSH), q31 exact sort percentiles (twin q52 GK),
# q71 exact percentile_disc winsorization (twin q71b sketch caps),
# q82 exact bitext margins over a %-stride probe set that grows with the
# corpus — probes x candidates is quadratic by construction (twin: q25/q39
# ANN candidate generation feeding the same ranking tail),
# q92 exact hard-negative mining (probes x corpus = N^2/40; twin: q92b's
# IVF-fed candidate generation feeding the same rank-and-gate tail).
ANCHORS = {"q48": "q24", "q23": "q21", "q31": "q52", "q71": "q71b",
           "q82": "q25", "q92": "q92b",
           # round 12: the deterministic-seed oracle twins hold their
           # codebook FIXED at the fixture's 16 cells so the assignment
           # arithmetic stays SQL-mirrorable at any sf — which makes q92c's
           # per-probe scan n/4 and its total pair mass n^2/160 (quadratic
           # BY DESIGN: its job is pinning the cell-join+gate+rank code
           # with a DuckDB hash, not scaling; q92b's sqrt(n)-cell form is
           # the scale path). q39b stays linear (5 fixed probes).
           "q92c": "q92b",
           # q99 exact semantic decon scores train x eval where eval is the
           # n/10 stride — pairs grow 100x per decade by construction (the
           # eval side is bounded in production; q99b's cell-mate pruning
           # is the scale path)
           "q99": "q99b"}
SLACK = 1.3  # box noise band observed across rounds 3-6


def load(path):
    with open(path) as f:
        text = f.read()
    line = None
    for ln in text.splitlines():
        if '"metric"' in ln:
            m = re.search(r'\{"metric".*\}', ln)
            if m:
                line = m.group(0)
    if line is None:
        sys.exit(f"no bench JSON line in {path}")
    return json.loads(line)


def main():
    small = load(sys.argv[1])
    big = load(sys.argv[2])
    factor = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    limit = factor * SLACK
    bad, anchors, rows = [], [], []
    # a query present in only one run escapes the ratio loop below — flag it
    # explicitly in both directions so renames/new queries can't silently
    # skip the superlinear and error checks
    for q in sorted(set(big["queries"]) - set(small["queries"])):
        bad.append((q, None, big["queries"][q], "only in big run (rename/new?)"))
    for q, t0 in sorted(small["queries"].items()):
        t1 = big["queries"].get(q)
        if t1 is None or t1 < 0:
            bad.append((q, t0, t1, "ERR/missing in big run"))
            continue
        if t0 <= 0:
            continue
        ratio = t1 / t0
        rows.append((ratio, q, t0, t1))
        if q in ANCHORS:
            anchors.append((q, t0, t1, ratio))
        elif ratio > limit:
            bad.append((q, t0, t1, f"ratio {ratio:.1f}x > {limit:.1f}x"))
    rows.sort(reverse=True)
    print(f"== scale check: {small.get('sf')} -> {big.get('sf')} "
          f"(data x{factor:g}, flag above x{limit:g})")
    print(f"total {small['value']}s -> {big['value']}s   "
          f"median {small['median']}s -> {big['median']}s   "
          f"headline {small['headline']}s -> {big['headline']}s")
    print("\nworst 12 scalers (ratio, query, small_s, big_s):")
    for ratio, q, t0, t1 in rows[:12]:
        tag = " [ANCHOR, twin=" + ANCHORS[q] + "]" if q in ANCHORS else ""
        print(f"  x{ratio:5.1f}  {q:12s} {t0:6.2f} -> {t1:6.2f}{tag}")
    if anchors:
        print("\nlabeled exact anchors (expected superlinear; twins are the scale path):")
        for q, t0, t1, r in anchors:
            print(f"  {q}: x{r:.1f} ({t0:.2f} -> {t1:.2f}s), twin {ANCHORS[q]} "
                  f"x{next((x for x, n, *_ in rows if n == ANCHORS[q]), float('nan')):.1f}")
    if big.get("n_err", 0):
        bad.append(("(bench)", None, None, f"{big['n_err']} errors in big run"))
    if bad:
        print("\nSUPERLINEAR / ERRORED / UNMATCHED (non-anchor):")
        for q, t0, t1, why in bad:
            shown = [f"{t:.2f}s" for t in (t0, t1) if t is not None]
            times = f" ({' -> '.join(shown)})" if shown else ""
            print(f"  {q}: {why}{times}")
        sys.exit(1)
    print("\n== PASS: no non-anchor query scales superlinearly")


if __name__ == "__main__":
    main()
