"""Analytic MXU FLOP counter (utils/flops.py): known-shape golden cases.

The counter is the MFU numerator for bench.py (round-3 verdict: XLA's
HLO cost analysis sums every lax.switch branch and printed an
impossible MFU of 1.09; the analytic count must make that class of
error structurally impossible)."""

import jax
import jax.lax as lax
import jax.numpy as jnp

from stylish_tts_tpu.utils.flops import count_fn


def test_dot_general():
    c = count_fn(lambda a, b: a @ b, jnp.zeros((8, 64)), jnp.zeros((64, 32)))
    assert c.matmul == 2 * 8 * 32 * 64
    assert c.conv == 0


def test_batched_dot():
    c = count_fn(
        lambda a, b: jnp.einsum("bij,bjk->bik", a, b),
        jnp.zeros((4, 8, 16)), jnp.zeros((4, 16, 32)),
    )
    assert c.matmul == 2 * 4 * 8 * 32 * 16


def test_conv():
    def conv(x, k):
        return lax.conv_general_dilated(x, k, (1, 1), "SAME")

    c = count_fn(conv, jnp.zeros((1, 3, 16, 16)), jnp.zeros((8, 3, 3, 3)))
    assert c.conv == 2 * 1 * 8 * 16 * 16 * 3 * 3 * 3


def test_grouped_conv_counts_per_group_features():
    # depthwise: feature_group_count=4, kernel (4, 1, 3)
    def conv(x, k):
        return lax.conv_general_dilated(
            x, k, (1,), "SAME", feature_group_count=4
        )

    c = count_fn(conv, jnp.zeros((2, 4, 10)), jnp.zeros((4, 1, 3)))
    assert c.conv == 2 * 2 * 4 * 10 * 3 * 1


def test_lhs_dilated_conv_counts_real_taps_only():
    """Transposed/fractionally-strided convs must not be counted dense.

    The round-4 bug: the iSTFT overlap-add *gradient* is a conv with
    K=n_fft and lhs_dilation=hop; counting all K taps overstated the
    acoustic step 4x (one leaf alone: 9.9 TF counted vs ~19 GF real).
    With lhs_dilation L only ~K/L kernel taps land on real samples.
    """
    def conv(x, k):
        return lax.conv_general_dilated(
            x, k, (1,), [(0, 0)], lhs_dilation=(4,)
        )

    # x: (1, 2, 8) -> dilated length 29; k: (3, 2, 8) -> out (1, 3, 22)
    c = count_fn(conv, jnp.zeros((1, 2, 8)), jnp.zeros((3, 2, 8)))
    # dense would be 2*|out|*K*cin = 2*(1*3*22)*8*2 = 2112;
    # real taps = K/L = 8/4 = 2 -> 2*(1*3*22)*2*2 = 528
    assert c.conv == 2 * (1 * 3 * 22) * (8 / 4) * 2


def test_scan_multiplies_by_length():
    def body(carry, x):
        return carry @ x, None

    def scanned(a, xs):
        out, _ = lax.scan(body, a, xs)
        return out

    c = count_fn(scanned, jnp.zeros((8, 8)), jnp.zeros((5, 8, 8)))
    assert c.matmul == 5 * 2 * 8 * 8 * 8


def test_switch_uses_branch_mean_not_sum():
    # the round-3 failure mode: XLA cost analysis SUMS branches
    def sw(i, a):
        return lax.switch(
            i,
            [
                lambda a: (a @ a).sum(),        # 1024 flops
                lambda a: ((a @ a) @ a).sum(),  # 2048 flops
                lambda a: a.sum(),              # 0 flops
            ],
            a,
        )

    c = count_fn(sw, jnp.int32(0), jnp.zeros((8, 8)))
    assert c.matmul == (1024 + 2048 + 0) / 3
    # branches differ >20% -> noted
    assert any("branches differ" in n for n in c.notes)


def test_while_is_lower_bound():
    def f(a):
        def cond(s):
            i, _ = s
            return i < 5

        def body(s):
            i, x = s
            return i + 1, x @ x

        _, out = lax.while_loop(cond, body, (0, a))
        return out

    c = count_fn(f, jnp.zeros((8, 8)))
    assert c.matmul == 1024  # body once
    assert c.lower_bound


def test_grad_through_checkpoint_counts_remat_recompute():
    def g(w, x):
        h = jax.checkpoint(lambda w, x: jnp.tanh(w @ x))(w, x)
        return (h @ h).sum()

    fwd = count_fn(g, jnp.zeros((8, 8)), jnp.zeros((8, 8)))
    bwd = count_fn(jax.grad(g), jnp.zeros((8, 8)), jnp.zeros((8, 8)))
    # the grad jaxpr contains the rematerialized forward + backward
    # matmuls: strictly more work than the forward alone
    assert bwd.matmul > fwd.matmul


def test_acoustic_step_countable_smoke():
    """The counter walks the real (tiny-config) acoustic G+D step without
    error and finds most FLOPs where they belong."""
    import numpy as np

    from stylish_tts_tpu.config import Config, ModelConfig
    from stylish_tts_tpu.models import build_model
    from stylish_tts_tpu.trainer.init import init_all_params
    from stylish_tts_tpu.trainer.normalization import NormalizationStats
    from stylish_tts_tpu.trainer.state import create_train_state
    from stylish_tts_tpu.trainer.steps import (
        Batch, StepContext, make_acoustic_step,
    )

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

    models = build_model(mc)
    params = init_all_params(models, mc, jax.random.PRNGKey(0))
    state = create_train_state(params, mc.text_encoder.tokens + 1)
    cfg = Config()
    B, L, F = 2, 8, 40
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
    counts = {}
    for sampled in (True, False):
        ctx = StepContext(
            models, mc, cfg.loss_weight.model_dump(), NormalizationStats(),
            stage_steps=100, base_lr=1e-4, sampled_mrd_only=sampled,
        )
        c = count_fn(make_acoustic_step(ctx), state, batch)
        assert c.total > 0
        assert not c.lower_bound  # no while loops in the production step
        counts[sampled] = c.total
    # sampled-only runs one MRD instead of three: strictly fewer FLOPs
    assert counts[True] < counts[False]
