"""Score the align-cache durations against the formant synthesizer's
ground truth (VERDICT r1 item 4: measured duration agreement).

Usage: python scripts/score_alignment.py <dataset_dir>
Reads alignment.safetensors (pipeline output) and
gt_alignment.safetensors (synthesis truth) and reports per-token frame
error statistics.
"""

from __future__ import annotations

import json
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    root = sys.argv[1]
    from stylish_tts_tpu.data.caches import load_cache

    pred = load_cache(f"{root}/alignment.safetensors")
    gt = load_cache(f"{root}/gt_alignment.safetensors")
    common = sorted(set(pred) & set(gt))
    if not common:
        raise SystemExit("no overlapping segments")
    errs, rel_errs, n_tok = [], [], 0
    boundary_errs = []
    for name in common:
        p = np.asarray(pred[name][0], np.float64)
        g = np.asarray(gt[name][0], np.float64)
        if p.shape != g.shape:
            print(f"skip {name}: {p.shape} vs {g.shape}")
            continue
        # interior tokens only: the pad tokens absorb rounding remainders
        pi, gi = p[1:-1], g[1:-1]
        errs.extend(np.abs(pi - gi))
        rel_errs.extend(np.abs(pi - gi) / np.maximum(gi, 1.0))
        n_tok += len(pi)
        # boundary positions (cumulative) are what matters downstream
        boundary_errs.extend(np.abs(np.cumsum(pi) - np.cumsum(gi)))
    report = {
        "segments": len(common),
        "tokens": n_tok,
        "mean_abs_err_frames": round(float(np.mean(errs)), 3),
        "median_abs_err_frames": round(float(np.median(errs)), 3),
        "p90_abs_err_frames": round(float(np.percentile(errs, 90)), 3),
        "mean_boundary_err_frames": round(float(np.mean(boundary_errs)), 3),
        "frames_per_token_gt": round(float(np.mean(gi)), 2),
    }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
