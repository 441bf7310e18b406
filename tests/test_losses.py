"""Loss-function semantics tests (gap-aware LR, TPRLS, backwards loss)."""

import numpy as np

import jax
import jax.numpy as jnp

from stylish_tts_tpu import losses as L


def test_disc_lr_multiplier_bands():
    # reference losses.py:238-249: ideal=0.5*sub, band=0.05*sub,
    # f_max=4 when losing badly, h_min=0.01 when winning hard, 1 at ideal
    sub = 5.0
    ideal = 2.5
    assert abs(float(L.disc_lr_multiplier(jnp.asarray(ideal), sub)) - 1.0) < 1e-6
    assert abs(float(L.disc_lr_multiplier(jnp.asarray(ideal + 1.0), sub)) - 4.0) < 1e-6
    assert abs(float(L.disc_lr_multiplier(jnp.asarray(ideal - 1.0), sub)) - 0.01) < 1e-6
    # inside the band: smooth interpolation, monotone
    up_half = float(L.disc_lr_multiplier(jnp.asarray(ideal + 0.125), sub))
    assert 1.0 < up_half < 4.0
    assert abs(up_half - 2.0) < 1e-4  # 4^(0.5)
    down_half = float(L.disc_lr_multiplier(jnp.asarray(ideal - 0.125), sub))
    assert abs(down_half - 0.1) < 1e-4  # 0.01^(0.5)


def test_lsgan_pair_losses():
    # perfect discriminator: real=1, fake=0 -> lsgan loss 0 per head
    real = [jnp.ones((2, 10))]
    fake = [jnp.zeros((2, 10))]
    pair, raw = L.discriminator_pair_loss(real, fake)
    assert float(raw) == 0.0
    # fooled generator: fake scored 1 -> generator lsgan term 0
    g = L.generator_pair_loss(real, [jnp.ones((2, 10))])
    assert float(g) <= 0.05  # only the bounded tprls tau remains


def test_backwards_loss_normalization_semantics():
    # every loss except generator/align_loss is magnitude-normalized:
    # scaling such a loss by 1000x must not change the backward total's
    # gradient direction/scale
    def total(scale):
        metrics = {
            "mel": jnp.asarray(2.0) * scale,
            "generator": jnp.asarray(3.0),
        }
        return L.backwards_loss(metrics, {"mel": 5.0, "generator": 1.0})

    t1, t1000 = float(total(1.0)), float(total(1000.0))
    # normalized value contributes exactly its weight
    assert abs(t1 - (5.0 + 3.0)) < 1e-5
    assert abs(t1000 - t1) < 1e-5

    # but gradients still flow through the normalized term
    def loss_fn(x):
        metrics = {"mel": x * 2.0, "generator": jnp.asarray(0.0)}
        return L.backwards_loss(metrics, {"mel": 5.0})

    g = float(jax.grad(loss_fn)(jnp.asarray(4.0)))
    assert g > 0.0


def test_spectral_convergence_scale_invariance_of_target():
    rng = np.random.default_rng(0)
    t = [jnp.asarray(rng.random((1, 1, 8, 10)).astype(np.float32))]
    p = [jnp.asarray(rng.random((1, 1, 8, 10)).astype(np.float32))]
    base = float(L.spectral_convergence_loss(t, p))
    # identical target/pred -> 0
    assert float(L.spectral_convergence_loss(t, t)) < 1e-7
    assert base > 0


def test_anti_wrapping_phase_loss_wraps():
    # a 2*pi phase offset is no error under anti-wrapping
    rng = np.random.default_rng(1)
    phase = jnp.asarray(rng.uniform(-3, 3, (1, 8, 12)).astype(np.float32))
    shifted = phase + 2.0 * np.pi
    loss = float(L.differential_phase_loss(shifted, phase))
    assert loss < 1e-4
    loss2 = float(L.differential_phase_loss(phase + 0.5, phase))
    assert loss2 > 0.01


def test_nonfinite_grad_step_is_skipped():
    """bf16 GAN runs occasionally produce an inf/nan gradient on one
    pathological batch; torch's AMP GradScaler skips such steps, and
    apply_module_update mirrors that: the module's params AND optimizer
    moments must be untouched, while finite grads still update. The
    disc-loss EMA has the same guard (a nonfinite raw loss would
    permanently poison the gap-aware LR controller)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from stylish_tts_tpu.trainer.optim import (
        apply_module_update, make_optimizer, update_disc_ema,
    )

    params = {"w": jnp.ones((4,)), "b": jnp.zeros((2,))}
    opt = make_optimizer().init(params)
    lr = jnp.asarray(1e-2, jnp.float32)

    good = {"w": jnp.full((4,), 0.5), "b": jnp.full((2,), 0.5)}
    new_p, new_s = apply_module_update(params, opt, good, lr)
    assert not np.allclose(np.asarray(new_p["w"]), np.asarray(params["w"]))

    for poison in (jnp.nan, jnp.inf):
        bad = {"w": jnp.full((4,), 0.5).at[1].set(poison),
               "b": jnp.full((2,), 0.5)}
        skip_p, skip_s = apply_module_update(params, opt, bad, lr)
        for leaf_new, leaf_old in zip(
            jax.tree.leaves(skip_p), jax.tree.leaves(params)
        ):
            np.testing.assert_array_equal(
                np.asarray(leaf_new), np.asarray(leaf_old)
            )
        for leaf_new, leaf_old in zip(
            jax.tree.leaves(skip_s), jax.tree.leaves(opt)
        ):
            np.testing.assert_array_equal(
                np.asarray(leaf_new), np.asarray(leaf_old)
            )

    ema = jnp.asarray(2.5, jnp.float32)
    assert float(update_disc_ema(ema, jnp.asarray(3.0))) != float(ema)
    np.testing.assert_array_equal(
        np.asarray(update_disc_ema(ema, jnp.asarray(jnp.nan))),
        np.asarray(ema),
    )
