#!/usr/bin/env python3
"""Three-run bench adjudication (r6 verdict item 2): compare per-query warm
times across consecutive same-box runs to separate real regressions from the
documented floating stall. Usage:

    python3 tools/bench_adjudicate.py run1.json run2.json [run3.json ...]

Prints a table for the suspect queries plus any query whose max/min ratio
across runs exceeds 2x (stall signature: large within-box variance with no
code change).
"""
import json
import sys

SUSPECTS = [
    "q105_unigram_logprob", "q116_bigram_logprob",
    "q108_streaming_decontaminate", "q179_lsh_recall_audit",
]
# r5 warm numbers (BENCH_r05 era) and the r6-verdict cold numbers quoted in
# VERDICT.md's regression table, for reference in the printed output.
PRIOR = {"q105_unigram_logprob": 5.9, "q116_bigram_logprob": 4.5,
         "q108_streaming_decontaminate": 11.7, "q179_lsh_recall_audit": 4.8}


def main(paths):
    runs = [json.load(open(p)) for p in paths]
    warm = [r["queries_warm"] for r in runs]
    names = sorted(set().union(*[set(w) for w in warm]))
    print(f"{'query':42s} " + " ".join(f"run{i+1:>5d}"[-6:] for i in range(len(runs)))
          + "   max/min  prior")
    flagged = []
    for n in names:
        vs = [w.get(n, float('nan')) for w in warm]
        lo, hi = min(vs), max(vs)
        ratio = hi / lo if lo > 0 else float('inf')
        if n in SUSPECTS or ratio > 2.0:
            flagged.append((n, vs, ratio))
    for n, vs, ratio in sorted(flagged, key=lambda t: -t[2]):
        mark = " <== suspect" if n in SUSPECTS else ""
        prior = PRIOR.get(n, "")
        print(f"{n:42s} " + " ".join(f"{v:6.2f}" for v in vs)
              + f"   {ratio:6.2f}  {prior}{mark}")
    totals = [float(r["total_warm"]) for r in runs]
    print(f"\n{'TOTAL warm':42s} " + " ".join(f"{t:6.1f}" for t in totals))


if __name__ == "__main__":
    main(sys.argv[1:])
