"""Pallas CTC kernels vs the pure-JAX scan implementation (interpret mode)."""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from stylish_tts_tpu.ops.ctc import ctc_loss_with_priors
from stylish_tts_tpu.ops.ctc_pallas import (
    ctc_loss_with_priors_pallas,
    ctc_neg_log_likelihood_pallas,
)


def _problem(b=3, t=24, c=10, u=5, blank=9, seed=0):
    rng = np.random.default_rng(seed)
    logits = rng.standard_normal((b, t, c)).astype(np.float32)
    log_probs = torch.log_softmax(torch.from_numpy(logits), dim=-1).numpy()
    labels = rng.integers(0, c - 1, size=(b, u)).astype(np.int32)
    label_lengths = np.array([u, u - 1, u - 3], dtype=np.int32)
    input_lengths = np.array([t, t - 5, t - 9], dtype=np.int32)
    for i in range(b):
        labels[i, label_lengths[i]:] = 0
    return log_probs, input_lengths, labels, label_lengths, blank


def test_pallas_ctc_loss_matches_scan():
    log_probs, il, labels, ll, blank = _problem()
    ours = ctc_neg_log_likelihood_pallas(
        jnp.asarray(log_probs), jnp.asarray(il), jnp.asarray(labels),
        jnp.asarray(ll), blank,
    )
    ref = ctc_loss_with_priors(
        jnp.asarray(log_probs), jnp.asarray(il), jnp.asarray(labels),
        jnp.asarray(ll), blank_id=blank, reduction="none",
    )
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-4)


def test_pallas_ctc_grad_matches_torch_through_logits():
    # torch's ctc_loss emits the fused pre-log_softmax gradient; chain ours
    # through log_softmax so both conventions coincide at the logits.
    rng = np.random.default_rng(3)
    b, t, c, u, blank = 3, 24, 10, 5, 9
    logits = rng.standard_normal((b, t, c)).astype(np.float32)
    labels = rng.integers(0, c - 1, (b, u)).astype(np.int32)
    ll = np.array([u, u - 1, u - 3], np.int32)
    il = np.array([t, t - 5, t - 9], np.int32)
    for i in range(b):
        labels[i, ll[i]:] = 0

    def loss_fn(z):
        lp = jax.nn.log_softmax(z, axis=-1)
        return ctc_loss_with_priors_pallas(
            lp, jnp.asarray(il), jnp.asarray(labels), jnp.asarray(ll),
            blank_id=blank, reduction="sum",
        )

    ours_grad = jax.grad(loss_fn)(jnp.asarray(logits))

    z_t = torch.from_numpy(logits).requires_grad_(True)
    loss = F.ctc_loss(
        torch.log_softmax(z_t, -1).permute(1, 0, 2),
        torch.from_numpy(labels.astype(np.int64)),
        torch.from_numpy(il.astype(np.int64)),
        torch.from_numpy(ll.astype(np.int64)),
        blank=blank, reduction="sum",
    )
    loss.backward()
    np.testing.assert_allclose(
        np.asarray(ours_grad), z_t.grad.numpy(), atol=2e-4
    )

    # and the pallas grad equals the scan version's autodiff grad exactly
    def loss_scan(z):
        lp = jax.nn.log_softmax(z, axis=-1)
        return ctc_loss_with_priors(
            lp, jnp.asarray(il), jnp.asarray(labels), jnp.asarray(ll),
            blank_id=blank, reduction="sum",
        )

    scan_grad = jax.grad(loss_scan)(jnp.asarray(logits))
    np.testing.assert_allclose(
        np.asarray(ours_grad), np.asarray(scan_grad), atol=1e-4
    )


def test_pallas_ctc_with_priors():
    log_probs, il, labels, ll, blank = _problem(seed=5)
    priors = jnp.asarray(
        np.linspace(-3, -1, log_probs.shape[-1]).astype(np.float32)
    )
    a = ctc_loss_with_priors_pallas(
        jnp.asarray(log_probs), jnp.asarray(il), jnp.asarray(labels),
        jnp.asarray(ll), blank_id=blank, log_priors=priors, prior_scale=0.3,
    )
    b = ctc_loss_with_priors(
        jnp.asarray(log_probs), jnp.asarray(il), jnp.asarray(labels),
        jnp.asarray(ll), blank_id=blank, log_priors=priors, prior_scale=0.3,
    )
    np.testing.assert_allclose(float(a), float(b), rtol=1e-4)
