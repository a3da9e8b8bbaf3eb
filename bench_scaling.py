#!/usr/bin/env python
"""Scaling-efficiency evidence (north rule: ≥0.8 from N to 4N executors).

Runs the identical bench suite in two fresh subprocesses at two
parallelism levels (default local[8] vs local[32] — the sandbox proxy for
N vs 4N executors, per driver instruction), computes per-query throughput
scaling efficiency, and writes BENCH/BASELINE.md.

    efficiency = (throughput_4N / throughput_N) / 4
               = (sec_N / sec_4N) / 4          (same input, same work)

Usage: python bench_scaling.py [sf_dir] [low_cores] [high_cores] [rounds]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys


def run_at(cores: str, sf_dir: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=cores, SPARK_GRAFT_SF_DIR=sf_dir)
    out = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    if out.returncode != 0:
        raise RuntimeError(f"bench at local[{cores}] failed:\n{out.stderr[-3000:]}")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    low = sys.argv[2] if len(sys.argv) > 2 else "8"
    high = sys.argv[3] if len(sys.argv) > 3 else "32"
    ratio = int(high) / int(low)

    r_low = run_at(low, sf_dir)
    r_high = run_at(high, sf_dir)

    lines = [
        "# BENCH — scaling efficiency report",
        "",
        f"Identical workload at `local[{low}]` vs `local[{high}]` (same JVM heap,",
        f"same input, fresh process each) — the sandbox proxy for N vs {ratio:.0f}N",
        "executors per the driver instruction. Efficiency =",
        f"(sec_low/sec_high)/{ratio:.0f}.",
        "",
        f"- input: `{sf_dir}`; config: {json.dumps(r_low['config'])}",
        "",
        f"| query | local[{low}] sec | local[{high}] sec | speedup | efficiency |",
        "|---|---|---|---|---|",
    ]
    effs = []
    for q in r_low["queries"]:
        s_low, s_high = r_low["queries"][q], r_high["queries"][q]
        speedup = s_low / s_high if s_high else float("nan")
        eff = speedup / ratio
        effs.append((q, eff))
        lines.append(
            f"| {q} | {s_low:.2f} | {s_high:.2f} | {speedup:.2f}x | {eff:.2f} |"
        )
    total_eff = (r_low["value"] / r_high["value"]) / ratio
    lines += [
        f"| **total** | {r_low['value']:.2f} | {r_high['value']:.2f} | "
        f"{r_low['value']/r_high['value']:.2f}x | **{total_eff:.2f}** |",
        "",
        "## Per-iteration throughput (edges/sec/iteration)",
        "",
        f"| query | local[{low}] | local[{high}] |",
        "|---|---|---|",
    ]
    for q, d in r_low["detail"].items():
        a = d.get("edges_per_sec_per_iter")
        b = r_high["detail"].get(q, {}).get("edges_per_sec_per_iter")
        if a and b:
            lines.append(f"| {q} | {a:,} | {b:,} |")
    lines += [
        "",
        "Raw JSON:",
        "```json",
        json.dumps({"low": r_low, "high": r_high}, indent=1),
        "```",
    ]

    os.makedirs(os.path.join(os.path.dirname(__file__) or ".", "BENCH"), exist_ok=True)
    out_path = os.path.join(os.path.dirname(__file__) or ".", "BENCH", "BASELINE.md")
    with open(out_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(json.dumps({"total_efficiency": round(total_eff, 3), "report": out_path}))


if __name__ == "__main__":
    main()
