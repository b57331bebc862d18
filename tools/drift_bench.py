"""Same-chip drift investigation (VERDICT r4 item 4).

BENCH_r03 -> BENCH_r04 drifted -5..-16% on the secondary metrics and
nobody could say whether that was code or shared-chip variance, because
each round has exactly one bench sample.  This tool takes the missing
measurements: run `bench.py` N times back-to-back on the SAME chip from
one or more source trees (e.g. the current tree and a git worktree of
the r3/r4 tag), then report per-metric mean, sigma, and the
tree-vs-tree delta in sigma units.

Usage:
  python tools/drift_bench.py --reps 3 [--tree /root/repo] \
      [--tree /tmp/r4tree] [--out benchmarks/results/drift_r5.json]
"""

import argparse
import json
import os
import statistics
import subprocess
import sys


def run_bench(tree: str):
    out = subprocess.run(
        [sys.executable, os.path.join(tree, "bench.py")],
        capture_output=True, text=True, cwd=tree, check=True,
        timeout=3000)
    for line in reversed(out.stdout.strip().splitlines()):
        if line.strip().startswith("{"):
            return json.loads(line)
    raise SystemExit(f"no JSON from bench.py in {tree}:\n{out.stdout[-2000:]}"
                     f"\n{out.stderr[-2000:]}")


def metrics_of(r):
    m = {"headline": float(r["value"])}
    for k, v in r.get("extra", {}).items():
        if ("per_s" in k or "per_chip" in k) and isinstance(v, (int, float)):
            m[k] = float(v)
    return m


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--tree", action="append", default=None,
                    help="source tree(s); repeat for A/B (default: cwd)")
    ap.add_argument("--out", default=None)
    a = ap.parse_args()
    trees = a.tree or [os.getcwd()]

    samples: dict[str, list[dict]] = {t: [] for t in trees}
    # interleave trees so slow chip-state drift affects both equally
    for rep in range(a.reps):
        for t in trees:
            r = run_bench(t)
            samples[t].append(metrics_of(r))
            print(f"rep {rep} {t}: headline "
                  f"{samples[t][-1]['headline']:.4g}", flush=True)

    report = {"reps": a.reps, "trees": {}}
    for t in trees:
        keys = set.intersection(*(set(s) for s in samples[t]))
        stats = {}
        for k in sorted(keys):
            vals = [s[k] for s in samples[t]]
            mean = statistics.fmean(vals)
            sd = statistics.stdev(vals) if len(vals) > 1 else 0.0
            stats[k] = {"mean": round(mean, 2), "sigma": round(sd, 2),
                        "rel_sigma": round(sd / mean, 4) if mean else None,
                        "values": vals}
        report["trees"][t] = stats
    if len(trees) == 2:
        t0, t1 = trees
        deltas = {}
        for k in report["trees"][t0]:
            if k in report["trees"][t1]:
                m0 = report["trees"][t0][k]["mean"]
                m1 = report["trees"][t1][k]["mean"]
                sd = max(report["trees"][t0][k]["sigma"],
                         report["trees"][t1][k]["sigma"], 1e-9)
                deltas[k] = {"ratio": round(m0 / m1, 4),
                             "delta_sigmas": round((m0 - m1) / sd, 2)}
        report["tree0_vs_tree1"] = deltas
    print(json.dumps(report, indent=1))
    if a.out:
        with open(a.out, "w") as f:
            json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
