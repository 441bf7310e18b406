"""Audit: which fraction of parameters AND step FLOPs the 2-D mesh
rules actually shard, per model (VERDICT r1 item 9 / r2 weak #7 /
SCALING.md).

Param share alone overstates TP coverage in the wrong units: ~46% of
all params are the three style encoders, which are a tiny FLOP
fraction of a step.  The binding number for tensor-parallel usefulness
is the FLOP share of the sharded modules, so this audit reports both:
per-module forward FLOPs (XLA HLO cost analysis of each module at the
PERF.md acoustic configuration, B=16 x 3 s) and the FLOP-weighted
sharded fraction (module FLOPs x that module's sharded-param frac).

Run CPU-only:
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python scripts/audit_sharding.py
"""

from __future__ import annotations

import os.path as _osp
import sys as _sys

_sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.abspath(__file__))))

import numpy as np


def _module_flops(models, params, mc):
    """Forward FLOPs per module from HLO cost analysis (abstract
    lowering only — no compile, runs in seconds on CPU)."""
    import jax
    import jax.numpy as jnp

    from stylish_tts_tpu.ops.duration import DurationProcessor

    B, L, F = 16, 64, 240
    S = F * mc.hop_length
    r = np.random.default_rng(0)
    audio = jnp.asarray((r.standard_normal((B, S)) * 0.1).astype(np.float32))
    texts = jnp.asarray(r.integers(1, 170, (B, L)).astype(np.int32))
    lengths = jnp.full((B,), L, jnp.int32)
    align = DurationProcessor().duration_to_alignment(
        jnp.full((B, L), F / L), F
    )
    pitch = jnp.full((B, F), 120.0)
    energy = jnp.zeros((B, F))
    voiced = jnp.ones((B, F))
    style = jnp.zeros((B, mc.style_dim))
    style_mel = jnp.asarray(r.standard_normal((B, 80, F)).astype(np.float32))
    spec = jnp.asarray(r.random((B, 1, 257, 563)).astype(np.float32))
    align_mel = jnp.asarray(
        r.standard_normal((B, F, mc.text_aligner.n_mels)).astype(np.float32)
    )

    calls = {
        "speech_predictor": (
            lambda p: models["speech_predictor"].apply(
                p, texts, lengths, align, pitch, energy, voiced, style,
                pitch, rng=jax.random.PRNGKey(0),
            ).audio,
        ),
        "pitch_energy_predictor": (
            lambda p: models["pitch_energy_predictor"].apply(
                p, texts, lengths, align, style
            ),
        ),
        "duration_predictor": (
            lambda p: models["duration_predictor"].apply(
                p, texts, lengths, style
            ),
        ),
        "text_aligner": (
            lambda p: models["text_aligner"].apply(p, align_mel, lengths),
        ),
        "speech_style_encoder": (
            lambda p: models["speech_style_encoder"].apply(p, style_mel),
        ),
        "pe_style_encoder": (
            lambda p: models["pe_style_encoder"].apply(
                p, style_mel, pitch, energy
            ),
        ),
        "duration_style_encoder": (
            lambda p: models["duration_style_encoder"].apply(p, style_mel),
        ),
        "mrd0": (lambda p: models["mrd0"].apply(p, spec),),
        "mrd1": (lambda p: models["mrd1"].apply(p, spec),),
        "mrd2": (lambda p: models["mrd2"].apply(p, spec),),
        "disc": (lambda p: models["disc"].apply(p, audio),),
        "pitch_disc": (
            lambda p: models["pitch_disc"].apply(
                p, jnp.stack([pitch * voiced, energy], 1)
            ),
        ),
        "dur_disc": (
            lambda p: models["dur_disc"].apply(
                p, jnp.full((B, 1, L), 4.0)
            ),
        ),
    }
    from stylish_tts_tpu.utils.flops import count_fn

    flops = {}
    analytic = {}
    for name, (fn,) in calls.items():
        if name not in params:
            continue
        try:
            lowered = jax.jit(fn).lower(params[name])
            ca = lowered.cost_analysis()
            ca = ca[0] if isinstance(ca, list) else ca
            flops[name] = float(ca.get("flops", 0.0))
        except Exception as exc:  # keep the audit robust to sig drift
            flops[name] = float("nan")
            print(f"  [flops failed for {name}: {type(exc).__name__}: {exc}]")
        try:
            # independent cross-check: analytic matmul/conv count from the
            # traced jaxpr (utils/flops.py) — the counter that caught the
            # round-3 MFU>1 inflation. Forward-only module calls contain no
            # lax.switch or remat, so XLA and analytic should agree within
            # the elementwise share; a large gap flags a counting bug.
            analytic[name] = count_fn(fn, params[name]).total
        except Exception as exc:
            analytic[name] = float("nan")
            print(f"  [analytic failed for {name}: {type(exc).__name__}: {exc}]")
    return flops, analytic


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

    rows = {}
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
        rows[name] = (total, sharded)
        total_all += total
        sharded_all += sharded

    real_params = init_all_params(models, mc, jax.random.PRNGKey(0))
    flops, analytic = _module_flops(models, real_params, mc)
    flops_total = sum(v for v in flops.values() if np.isfinite(v))
    # FLOP-weighted sharded fraction: each module's forward FLOPs scaled
    # by its sharded-param fraction (matmul/conv FLOPs follow the
    # kernels the rules shard, so the param fraction is the right proxy
    # within a module)
    flops_sharded = sum(
        f * (rows[n][1] / max(rows[n][0], 1))
        for n, f in flops.items()
        if np.isfinite(f)
    )

    hdr = (
        f"{'model':28s} {'params':>12s} {'p-frac':>7s} "
        f"{'fwd GFLOP':>10s} {'f-share':>8s} {'analytic':>10s} {'xla/ana':>8s}"
    )
    print(hdr)
    for name, (total, sharded) in sorted(rows.items(), key=lambda r: -r[1][0]):
        f = flops.get(name, float("nan"))
        fs = f / flops_total if np.isfinite(f) and flops_total else float("nan")
        a = analytic.get(name, float("nan"))
        ratio = f / a if np.isfinite(f) and np.isfinite(a) and a else float("nan")
        print(
            f"{name:28s} {total:12,d} {sharded / max(total, 1):7.1%} "
            f"{f / 1e9:10.2f} {fs:8.1%} {a / 1e9:10.2f} {ratio:8.2f}"
        )
    print("-" * len(hdr))
    print(
        f"{'TOTAL':28s} {total_all:12,d} {sharded_all / total_all:7.1%} "
        f"{flops_total / 1e9:10.2f}"
    )
    print(
        f"param-sharded fraction:     {sharded_all / total_all:7.1%}\n"
        f"FLOP-weighted sharded frac: {flops_sharded / max(flops_total, 1):7.1%}"
        f"   (B=16 x 3 s acoustic forwards)"
    )


if __name__ == "__main__":
    main()
