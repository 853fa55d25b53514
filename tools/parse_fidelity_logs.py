"""Aggregate the round-5 fidelity-campaign logs into one table.

Reads the convergence_run/layout_convergence logs named on the command
line (default: the r5 leg logs in /tmp), pulls every in-training
``Rollout fidelity`` line plus the last single-step val metrics, and
prints a markdown table in the BENCH_NOTES campaign format (one row per
leg: per-step curve at the final eval, mean, step-8, single-step val).

Usage: python tools/parse_fidelity_logs.py [log ...]
"""

from __future__ import annotations

import glob
import re
import sys

FID = re.compile(
    r"Rollout fidelity mean \[([0-9.]+)\] per-step \[([0-9. ]+)\]")
VAL = re.compile(r"miou.{0,4}[: \[]([0-9.]+)", re.IGNORECASE)


def parse(path: str):
    text = open(path, errors="replace").read()
    fids = FID.findall(text)
    # last "val" metrics line with an miou figure
    val = None
    for line in text.splitlines():
        if "miou" in line.lower() and "fidelity" not in line.lower():
            m = VAL.search(line)
            if m:
                val = float(m.group(1))
    return fids, val


def main(argv):
    paths = argv or sorted(glob.glob("/tmp/r5_leg*.log"))
    rows = []
    for p in paths:
        name = p.split("/")[-1].replace(".log", "")
        fids, val = parse(p)
        if not fids:
            rows.append((name, None, None, None, val, 0))
            continue
        mean, steps = fids[-1]
        rows.append((name, steps.strip(), float(mean),
                     float(steps.split()[-1]), val, len(fids)))
        # intermediate reads for trajectory
        traj = " -> ".join(f"{float(m):.4f}" for m, _ in fids)
        print(f"{name}: fidelity trajectory {traj}")
    print()
    print("| leg | per-step (final eval) | mean | step-8 | 1-step val |")
    print("|---|---|---|---|---|")
    for name, steps, mean, s8, val, n in rows:
        if steps is None:
            print(f"| {name} | (no fidelity line yet) | | | "
                  f"{val if val is not None else ''} |")
        else:
            print(f"| {name} | {steps} | {mean:.4f} | {s8:.4f} | "
                  f"{val if val is not None else '?'} |")


if __name__ == "__main__":
    main(sys.argv[1:])
