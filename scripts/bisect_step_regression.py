"""Bisect the r2->r3 acoustic-step-time regression (VERDICT r3 item 1a).

BENCH_r02 measured 16.2 ms at B=16/240 frames with the round-2
configuration: donate=False, all-3-MRD straight-line disc phase,
plain jit dispatch. BENCH_r03 measured 21.35 ms with the round-3
configuration: donate=True, sampled-MRD lax.switch disc phase, AOT
.lower().compile() dispatch. This script measures every intermediate
configuration on the same chip in one process sequence so the delta can
be attributed. Results append to the JSON-lines file given as argv[1]
(default /tmp/bisect_step.jsonl).

Run: python scripts/bisect_step_regression.py [out.jsonl]
"""

import json
import sys
import time

sys.path.insert(0, ".")

import bench  # noqa: E402  (repo-root bench.py)

COMBOS = [
    # (label, donate, sampled_mrd, aot)
    ("r3_production", True, True, True),
    ("r2_bench_config", False, False, False),
    ("donate_only", True, False, True),
    ("sampled_only_nodonate_jit", False, True, False),
    ("production_jit_dispatch", True, True, False),
]


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bisect_step.jsonl"
    for label, donate, sampled, aot in COMBOS:
        t0 = time.time()
        try:
            res = bench.bench_train_step(
                donate=donate, sampled_mrd=sampled, aot=aot,
                count_flops=(label == "r3_production"),
            )
        except Exception as exc:
            res = {"error": f"{type(exc).__name__}: {exc}"[:500]}
        res["label"] = label
        res["setup_wall_s"] = round(time.time() - t0, 1)
        line = json.dumps(res)
        print(line, flush=True)
        with open(out_path, "a") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
