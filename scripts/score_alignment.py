"""Score the align-cache durations against the formant synthesizer's
ground truth (VERDICT r1 item 4: measured duration agreement), and
diff the two duration-attribution methods on identical posteriors
(VERDICT r2 item 4).

Usage:
  python scripts/score_alignment.py <dataset_dir>
      score alignment.safetensors vs gt_alignment.safetensors
  python scripts/score_alignment.py --attribution-diff <a.safetensors> <b.safetensors>
      per-token diff of two attribution runs (e.g. `stylish-train align
      --method k2` vs `--method torch` outputs on the same aligner)
"""

from __future__ import annotations

import json
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def score_vs_gt(root: str) -> dict:
    from stylish_tts_tpu.data.caches import load_cache

    pred = load_cache(f"{root}/alignment.safetensors")
    gt = load_cache(f"{root}/gt_alignment.safetensors")
    common = sorted(set(pred) & set(gt))
    if not common:
        raise SystemExit("no overlapping segments")
    errs, rel_errs, n_tok = [], [], 0
    boundary_errs = []
    gt_frames_per_token = []
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
        gt_frames_per_token.extend(gi)
        # boundary positions (cumulative) are what matters downstream
        boundary_errs.extend(np.abs(np.cumsum(pi) - np.cumsum(gi)))
    return {
        "segments": len(common),
        "tokens": n_tok,
        "mean_abs_err_frames": round(float(np.mean(errs)), 3),
        "median_abs_err_frames": round(float(np.median(errs)), 3),
        "p90_abs_err_frames": round(float(np.percentile(errs, 90)), 3),
        "mean_boundary_err_frames": round(float(np.mean(boundary_errs)), 3),
        "frames_per_token_gt": round(float(np.mean(gt_frames_per_token)), 2),
    }


def attribution_diff(path_a: str, path_b: str) -> dict:
    """Per-token diff of two alignment caches over identical posteriors
    (same trained aligner, different --method). Reports interior-token
    and pad-token statistics separately: the k2-vs-torch methods differ
    exactly in who owns the leading/trailing silence."""
    from stylish_tts_tpu.data.caches import load_cache

    a = load_cache(path_a)
    b = load_cache(path_b)
    common = sorted(set(a) & set(b))
    if not common:
        raise SystemExit("no overlapping segments")
    inner_err, pad_err, n_tok = [], [], 0
    mismatched = 0
    for name in common:
        da = np.asarray(a[name][0], np.float64)
        db = np.asarray(b[name][0], np.float64)
        if da.shape != db.shape:
            mismatched += 1
            continue
        inner_err.extend(np.abs(da[1:-1] - db[1:-1]))
        pad_err.extend([abs(da[0] - db[0]), abs(da[-1] - db[-1])])
        n_tok += len(da) - 2
    return {
        "segments": len(common),
        "shape_mismatches": mismatched,
        "interior_tokens": n_tok,
        "interior_mean_abs_diff_frames": round(float(np.mean(inner_err)), 3),
        "interior_median_abs_diff_frames": round(
            float(np.median(inner_err)), 3
        ),
        "interior_p90_abs_diff_frames": round(
            float(np.percentile(inner_err, 90)), 3
        ),
        "interior_identical_pct": round(
            100.0 * float(np.mean(np.asarray(inner_err) == 0)), 1
        ),
        "pad_mean_abs_diff_frames": round(float(np.mean(pad_err)), 3),
    }


def main():
    if sys.argv[1] == "--attribution-diff":
        report = attribution_diff(sys.argv[2], sys.argv[3])
    else:
        report = score_vs_gt(sys.argv[1])
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
