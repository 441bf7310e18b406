"""Summarize a long-horizon training run for PERF.md.

Parses <out>/acoustic/train.log (the per-log_interval loss lines plus
the *_lr_mult gap-aware-LR diagnostics surfaced by trainer/steps.py)
and reports:
  * loss trajectories (first/mid/last window means for every metric),
  * disc-LR multiplier occupancy stats in the same format as
    scripts/simulate_ema_cadence.py (geomean, p5/p50/p95, %@f_max,
    %@h_min) so the measured run can sit next to the 50k-step
    simulation envelope,
  * NaN watch (any nonfinite metric anywhere),
  * checkpoint/resume events.

Usage: python scripts/analyze_longrun.py /tmp/formant_longrun/out
"""

from __future__ import annotations

import math
import re
import sys

import numpy as np

F_MAX, H_MIN = 4.0, 0.01

LINE = re.compile(r"Epoch \[(\d+)/(\d+)\], Step \[(\d+)/(\d+)\] loss: (\S+), (.*)")


def parse(path):
    rows = []
    resumes = 0
    for ln in open(path, encoding="utf-8"):
        if "resuming from" in ln or "fast-forward" in ln:
            resumes += 1
        m = LINE.search(ln)
        if not m:
            continue
        metrics = {"loss": float(m.group(5)) if m.group(5) != "nan" else math.nan}
        for part in m.group(6).split(", "):
            if ": " in part:
                k, v = part.split(": ", 1)
                try:
                    metrics[k] = float(v)
                except ValueError:
                    pass
        rows.append((int(m.group(1)), metrics))
    return rows, resumes


def stats(m):
    m = np.asarray(m)
    return {
        "geomean": float(np.exp(np.mean(np.log(np.maximum(m, 1e-9))))),
        "p5": float(np.percentile(m, 5)),
        "p50": float(np.percentile(m, 50)),
        "p95": float(np.percentile(m, 95)),
        "pct_fmax": float(np.mean(m >= F_MAX * 0.999) * 100),
        "pct_hmin": float(np.mean(m <= H_MIN * 1.001) * 100),
    }


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/formant_longrun/out"
    rows, resumes = parse(f"{out}/acoustic/train.log")
    if not rows:
        print("no loss lines found")
        return 1
    n = len(rows)
    print(f"log intervals: {n} (epochs {rows[0][0]}..{rows[-1][0]}), "
          f"resume events: {resumes}")

    keys = sorted(rows[-1][1].keys())
    nonfinite = {
        k: sum(1 for _, m in rows if not np.isfinite(m.get(k, 0.0)))
        for k in keys
    }
    bad = {k: v for k, v in nonfinite.items() if v}
    print("nonfinite intervals per metric:", bad or "NONE")

    def window(frac0, frac1):
        lo, hi = int(n * frac0), max(int(n * frac1), int(n * frac0) + 1)
        return rows[lo:hi]

    print(f"{'metric':>16} {'first10%':>10} {'mid10%':>10} {'last10%':>10}")
    for k in keys:
        if k.endswith("_lr_mult"):
            continue
        vals = [
            float(np.nanmean([m.get(k, np.nan) for _, m in w]))
            for w in (window(0, 0.1), window(0.45, 0.55), window(0.9, 1.0))
        ]
        print(f"{k:>16} {vals[0]:>10.4f} {vals[1]:>10.4f} {vals[2]:>10.4f}")

    print("\ndisc-LR multiplier occupancy (vs simulate_ema_cadence format):")
    print("| series | geomean | p5 | p50 | p95 | %@f_max | %@h_min |")
    print("|---|---|---|---|---|---|---|")
    for k in keys:
        if not k.endswith("_lr_mult"):
            continue
        m = [r[1][k] for r in rows if k in r[1] and np.isfinite(r[1][k])]
        if not m:
            continue
        s = stats(m)
        print(f"| {k} | {s['geomean']:.3f} | {s['p5']:.3f} | {s['p50']:.3f} "
              f"| {s['p95']:.3f} | {s['pct_fmax']:.1f}% | {s['pct_hmin']:.1f}% |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
