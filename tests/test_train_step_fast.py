"""A full acoustic G+D training step in the FAST tier (VERDICT r1 #7).

Runs the real jit'd generator+discriminator program on a tiny config
(B=2, 1-layer everything) so any raw pytest exercises the core training
path.  Compiles with jax_disable_most_optimizations (the 1-core VM pays
minutes for full XLA optimization of this graph; the math is identical).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _get_flag(name):
    # jax 0.9 exposes some flags only via config.values (attribute access
    # raises AttributeError for Flag objects, unlike States)
    return jax.config.values[name]


def _tiny_acoustic_setup(slm_loss_fn=None, frozen=None):
    import __graft_entry__ as graft

    from stylish_tts_tpu.config import Config
    from stylish_tts_tpu.models import build_model
    from stylish_tts_tpu.trainer.init import init_all_params
    from stylish_tts_tpu.trainer.normalization import NormalizationStats
    from stylish_tts_tpu.trainer.state import create_train_state
    from stylish_tts_tpu.trainer.steps import StepContext

    mc = graft._small_model_config()
    models = build_model(mc)
    B, L, F = 2, 8, 40
    params = init_all_params(
        models, mc, jax.random.PRNGKey(0), frames=F, text_len=L
    )
    state = create_train_state(params, mc.text_encoder.tokens + 1)
    if frozen is not None:
        state = state.replace(frozen=frozen)
    cfg = Config()
    ctx = StepContext(
        models, mc, cfg.loss_weight.model_dump(), NormalizationStats(),
        stage_steps=100, base_lr=1e-4, slm_loss_fn=slm_loss_fn,
    )
    return mc, ctx, state, (B, L, F)


def test_schedule_lr_from_frozen_state():
    """LR schedule scalars ride state.frozen["schedule"] (traced, so the
    compiled program is reusable across stage lengths/LRs); ctx constants
    are the fallback."""
    from stylish_tts_tpu.trainer.optim import cosine_lr
    from stylish_tts_tpu.trainer.state import create_train_state
    from stylish_tts_tpu.trainer.steps import _schedule_lr

    class Ctx:
        stage_steps = 100
        base_lr = 1e-4

    state = create_train_state({}, 5).replace(step=jnp.asarray(30, jnp.int32))
    np.testing.assert_allclose(
        _schedule_lr(Ctx, state), cosine_lr(1e-4, 30, 100), rtol=1e-6
    )
    state2 = state.replace(frozen={"schedule": {
        "stage_steps": jnp.asarray(200, jnp.int32),
        "base_lr": jnp.asarray(2e-4, jnp.float32),
    }})
    got = jax.jit(lambda s: _schedule_lr(Ctx, s))(state2)
    np.testing.assert_allclose(got, cosine_lr(2e-4, 30, 200), rtol=1e-6)


def test_acoustic_gd_step_tiny():
    prev = _get_flag("jax_disable_most_optimizations")
    jax.config.update("jax_disable_most_optimizations", True)
    try:
        from stylish_tts_tpu.trainer.steps import Batch, make_acoustic_step

        mc, ctx, state, (B, L, F) = _tiny_acoustic_setup()
        rng = np.random.default_rng(0)
        batch = Batch(
            jnp.asarray(
                (rng.standard_normal((B, F * mc.hop_length)) * 0.1)
                .astype(np.float32)
            ),
            jnp.asarray(rng.integers(1, 170, (B, L)).astype(np.int32)),
            jnp.full((B,), L, jnp.int32),
            jnp.full((B, F), 120.0, jnp.float32),
            jnp.full((B, L), F // L, jnp.int32),
        )
        step = jax.jit(make_acoustic_step(ctx))
        new_state, metrics = step(state, batch)
        jax.block_until_ready(metrics)
        for key in ("mel", "multi_phase", "generator", "discriminator"):
            assert np.isfinite(float(metrics[key])), (key, metrics[key])
        # params actually moved
        delta = jax.tree.reduce(
            lambda acc, x: acc + float(jnp.sum(jnp.abs(x))),
            jax.tree.map(
                lambda a, b: a.astype(jnp.float32) - b.astype(jnp.float32),
                new_state.params["speech_predictor"],
                state.params["speech_predictor"],
            ),
            0.0,
        )
        assert delta > 0.0
    finally:
        jax.config.update("jax_disable_most_optimizations", prev)


def test_acoustic_gd_step_tiny_with_slm():
    """Same tiny G+D program with the REAL frozen-WavLM slm term attached
    (random-init params — structural, matching the reference's always-on
    perceptual loss, reference losses.py:376-394 / stage_type.py:221-225).
    The weights ride TrainState.frozen["wavlm"] exactly as in the trainer
    (runtime buffers, not closure constants).  Verifies the slm metric is
    finite, weighted into the backward, and differentiable through the
    resampler + conv stack + 12 layers."""
    prev = _get_flag("jax_disable_most_optimizations")
    jax.config.update("jax_disable_most_optimizations", True)
    try:
        from stylish_tts_tpu.models.slm import WavLMEncoder, wavlm_loss
        from stylish_tts_tpu.trainer.steps import Batch, make_acoustic_step

        wavlm_params = WavLMEncoder().init(
            jax.random.PRNGKey(1), jnp.zeros((1, 4000), jnp.float32)
        )
        # numpy leaves — the production path (convert_torch_wavlm) yields
        # numpy, which once tripped a TracerArrayConversionError in jit
        wavlm_params = jax.tree.map(np.asarray, wavlm_params)
        mc, ctx, state, (B, L, F) = _tiny_acoustic_setup(
            slm_loss_fn=wavlm_loss, frozen={"wavlm": wavlm_params}
        )
        assert ctx.weights.get("slm", 0.0) > 0.0
        rng = np.random.default_rng(0)
        batch = Batch(
            jnp.asarray(
                (rng.standard_normal((B, F * mc.hop_length)) * 0.1)
                .astype(np.float32)
            ),
            jnp.asarray(rng.integers(1, 170, (B, L)).astype(np.int32)),
            jnp.full((B,), L, jnp.int32),
            jnp.full((B, F), 120.0, jnp.float32),
            jnp.full((B, L), F // L, jnp.int32),
        )
        step = jax.jit(make_acoustic_step(ctx))
        new_state, metrics = step(state, batch)
        jax.block_until_ready(metrics)
        assert "slm" in metrics
        for key in ("slm", "mel", "generator", "discriminator"):
            assert np.isfinite(float(metrics[key])), (key, metrics[key])
        assert float(metrics["slm"]) > 0.0
    finally:
        jax.config.update("jax_disable_most_optimizations", prev)


def test_dryrun_factorization_overrides():
    """ADVICE r2 item 4 + review: explicit slices/model overrides must be
    honored — including 1 (single-slice pod, TP off) and when the auto
    factorization declines (n % 4 != 0)."""
    import __graft_entry__ as graft

    # auto: 8 virtual devices -> 2 x 2 x 2
    assert graft._resolve_factorization(8, None, None, None) == (2, 2, 2)
    # explicit 1s are NOT "unset": single-slice pod with TP=4
    assert graft._resolve_factorization(8, None, 1, 4) == (1, 2, 4)
    # TP off entirely
    assert graft._resolve_factorization(8, None, 2, 1) == (2, 4, 1)
    # n % 4 != 0: auto declines, explicit override still works
    assert graft._resolve_factorization(6, None, None, None) is None
    assert graft._resolve_factorization(6, None, 1, 2) == (1, 3, 2)
    # indivisible request fails loudly, not silently rewritten
    import pytest

    with pytest.raises(AssertionError):
        graft._resolve_factorization(8, None, 3, 1)
