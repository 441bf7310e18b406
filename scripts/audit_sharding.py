"""Audit: which fraction of parameters (and matmul FLOPs proxy) the 2-D
mesh rules actually shard, per model (VERDICT r1 item 9 / SCALING.md).

Run CPU-only:
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python scripts/audit_sharding.py
"""

from __future__ import annotations

import os.path as _osp
import sys as _sys

_sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.abspath(__file__))))

import numpy as np


def main():
    import jax

    from stylish_tts_tpu.config import ModelConfig
    from stylish_tts_tpu.models import build_model
    from stylish_tts_tpu.parallel.sharding_rules import spec_for_leaf
    from stylish_tts_tpu.trainer.init import init_all_params

    mc = ModelConfig()  # full-size flagship
    models = build_model(mc)
    params = jax.eval_shape(
        lambda: init_all_params(models, mc, jax.random.PRNGKey(0))
    )

    rows = []
    total_all = sharded_all = 0
    for name, tree in params.items():
        leaves = jax.tree_util.tree_leaves_with_path(tree)
        total = sharded = 0
        for path, leaf in leaves:
            n = int(np.prod(leaf.shape)) if leaf.shape else 1
            total += n
            spec = spec_for_leaf((jax.tree_util.DictKey(name),) + path, leaf)
            if any(s is not None for s in spec):
                sharded += n
        rows.append((name, total, sharded))
        total_all += total
        sharded_all += sharded

    print(f"{'model':28s} {'params':>12s} {'sharded':>12s} {'frac':>7s}")
    for name, total, sharded in sorted(rows, key=lambda r: -r[1]):
        print(f"{name:28s} {total:12,d} {sharded:12,d} {sharded / max(total, 1):7.1%}")
    print("-" * 62)
    print(
        f"{'TOTAL':28s} {total_all:12,d} {sharded_all:12,d} "
        f"{sharded_all / total_all:7.1%}"
    )


if __name__ == "__main__":
    main()
