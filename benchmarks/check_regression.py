"""Benchmark regression gate: compare bench.py output to a stored baseline.

The reference posts AirspeedVelocity performance deltas on every PR
(/root/reference/.github/workflows/benchmark.yml:14-21) so a perf
regression cannot merge silently; this is the analog.  CI runs::

    python benchmarks/check_regression.py --min-ratio 0.5

which executes ``bench.py``, picks the per-backend baseline from
``benchmarks/results/bench_baseline_<backend>.json``, and fails when the
headline metric drops below ``min_ratio`` of the baseline.  A loose
default ratio absorbs runner-generation variance; same-machine runs
(the TPU bench host) can use a tight one.  ``--write-baseline`` records
the current numbers as the new baseline.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

RESULTS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results")


def run_bench():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "bench.py")],
        capture_output=True,
        text=True,
        cwd=repo,
        check=True,
    )
    for line in reversed(out.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise SystemExit(f"bench.py produced no JSON line:\n{out.stdout}\n{out.stderr}")


def baseline_path(result):
    device = result.get("extra", {}).get("device", "")
    backend = "tpu" if "TPU" in device else "cpu"
    return os.path.join(RESULTS_DIR, f"bench_baseline_{backend}.json"), backend


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--min-ratio", type=float, default=0.5,
                    help="fail when value < min_ratio * baseline")
    ap.add_argument("--write-baseline", action="store_true",
                    help="record the current run as the new baseline")
    a = ap.parse_args(argv)

    result = run_bench()
    path, backend = baseline_path(result)

    if a.write_baseline or not os.path.exists(path):
        with open(path, "w") as f:
            json.dump(result, f, indent=1)
        print(json.dumps({"status": "baseline-written", "backend": backend,
                          "value": result["value"], "path": path}))
        return 0

    with open(path) as f:
        base = json.load(f)
    ratio = result["value"] / base["value"]
    status = {
        "status": "ok" if ratio >= a.min_ratio else "REGRESSION",
        "backend": backend,
        "metric": result["metric"],
        "value": result["value"],
        "baseline": base["value"],
        "ratio": round(ratio, 3),
        "min_ratio": a.min_ratio,
    }
    print(json.dumps(status))
    return 0 if ratio >= a.min_ratio else 1


if __name__ == "__main__":
    sys.exit(main())
