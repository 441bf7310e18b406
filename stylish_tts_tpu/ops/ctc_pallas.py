"""CTC forward/backward as fused Pallas TPU kernels.

The pure-JAX CTC (ops/ctc.py) runs the trellis as a lax.scan: T
sequential steps of tiny (B, S) work — dispatch-bound on TPU.  Here the
whole recursion is ONE kernel: the TPU grid iterates t = 0..T-1
sequentially, the alpha row lives in a VMEM scratch that persists
across grid steps, and each step streams its emissions block in and
its alpha row out.  The backward pass is the mirrored beta recursion;
the gradient d loss / d log_probs = -gamma (occupation posteriors)
lands as one MXU matmul with the extended-label one-hot.

Numerical semantics are identical to ops/ctc.py (same trellis, same
freeze-past-length masking); golden-tested against it and torch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ctc import NEG, _extended_labels, _transition_masks

def _interpret() -> bool:
    # Pallas TPU kernels run in interpreter mode off-TPU (CPU tests)
    return jax.default_backend() != "tpu"


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _alpha_kernel(emit_ref, skip_ref, valid_ref, active_ref,
                  alpha_out_ref, alpha_scratch):
    """Grid dim 0 = time.  alpha_scratch (B, S) persists across steps."""
    t = pl.program_id(0)
    emit = emit_ref[0]  # (B, S)
    skip_ok = skip_ref[:]  # (B, S) float 0/1
    valid = valid_ref[:]  # (B, S) float 0/1
    active = active_ref[0]  # (B, 1) float 0/1 for this t

    @pl.when(t == 0)
    def _():
        # init: only states 0 and 1 start; emit already contains the
        # initial emission scores, init mask comes in via valid trick:
        # handled by caller passing emit row 0 pre-masked.
        alpha_scratch[:] = emit

    @pl.when(t > 0)
    def _():
        alpha = alpha_scratch[:]
        stay = alpha
        step1 = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, alpha.shape, 1) >= 1,
            pltpu.roll(alpha, shift=1, axis=1),
            NEG,
        )
        step2_raw = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, alpha.shape, 1) >= 2,
            pltpu.roll(alpha, shift=2, axis=1),
            NEG,
        )
        step2 = jnp.where(skip_ok > 0, step2_raw, NEG)
        m = jnp.maximum(jnp.maximum(stay, step1), step2)
        lse = m + jnp.log(
            jnp.exp(stay - m) + jnp.exp(step1 - m) + jnp.exp(step2 - m)
            + 1e-30
        )
        new = lse + emit
        new = jnp.where(valid > 0, new, NEG)
        alpha_scratch[:] = jnp.where(active > 0, new, alpha)

    alpha_out_ref[0] = alpha_scratch[:]


def _beta_kernel(emit_ref, skip_next_ref, valid_ref, active_ref,
                 final_mask_ref, beta_out_ref, beta_scratch):
    """Reverse-time beta recursion.

    Grid step i visits t = T-1-i (index maps reverse the blocks).
    beta[t] = LSE over transitions into s from s, s+1, s+2 of
    beta[t+1, s'] + emit[t+1, s'], with the skip mask evaluated at the
    *destination* state (skip_next pre-shifted by the caller).
    """
    i = pl.program_id(0)
    emit_next = emit_ref[0]  # (B, S): emissions at t+1 (pre-shifted blocks)
    skip_next = skip_next_ref[:]
    valid = valid_ref[:]
    active = active_ref[0]
    final_mask = final_mask_ref[:]

    @pl.when(i == 0)
    def _():
        # beta at t = T-1 (per-sequence final states handled by caller
        # via final_mask: 0 at allowed end states, NEG elsewhere)
        beta_scratch[:] = final_mask

    @pl.when(i > 0)
    def _():
        beta = beta_scratch[:]
        term = beta + emit_next  # score of being in s' at t+1
        stay = term
        # from s to s+1: shift left
        step1 = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, beta.shape, 1)
            < beta.shape[1] - 1,
            pltpu.roll(term, shift=beta.shape[1] - 1, axis=1),
            NEG,
        )
        step2_raw = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, beta.shape, 1)
            < beta.shape[1] - 2,
            pltpu.roll(term, shift=beta.shape[1] - 2, axis=1),
            NEG,
        )
        step2 = jnp.where(skip_next > 0, step2_raw, NEG)
        m = jnp.maximum(jnp.maximum(stay, step1), step2)
        lse = m + jnp.log(
            jnp.exp(stay - m) + jnp.exp(step1 - m) + jnp.exp(step2 - m)
            + 1e-30
        )
        new = jnp.where(valid > 0, lse, NEG)
        # past-length frames: beta stays at the final-state mask (they
        # were frozen in the forward), i.e. keep previous beta
        beta_scratch[:] = jnp.where(active > 0, new, final_mask)

    beta_out_ref[0] = beta_scratch[:]


def _pad_sizes(b: int, u_max: int):
    s = 2 * u_max + 1
    return s, _round_up(s, 128), _round_up(b, 8)


def _prepare(log_probs, input_lengths, labels, label_lengths, blank_id):
    b, t_max, _ = log_probs.shape
    u_max = labels.shape[1]
    s, s_pad, b_pad = _pad_sizes(b, u_max)

    ext = _extended_labels(labels, blank_id)  # (B, S)
    skip_ok = _transition_masks(ext, blank_id)
    state_idx = jnp.arange(s)[None, :]
    state_valid = state_idx < (2 * label_lengths[:, None] + 1)

    emits = jnp.take_along_axis(log_probs, ext[:, None, :], axis=2)
    emits = jnp.moveaxis(emits, 1, 0)  # (T, B, S)

    # t = 0 row pre-masked to the init states {0, 1}
    init_mask = (state_idx == 0) | (
        (state_idx == 1) & (label_lengths[:, None] > 0)
    )
    emits = emits.at[0].set(jnp.where(init_mask, emits[0], NEG))

    active = (
        jnp.arange(t_max)[:, None] < input_lengths[None, :]
    ).astype(jnp.float32)  # (T, B)
    # beta recursion at t is valid only if t+1 is inside the sequence
    active_beta = (
        jnp.arange(t_max)[:, None] + 1 < input_lengths[None, :]
    ).astype(jnp.float32)

    # final-state mask for beta init: 0 at 2U and 2U-1, NEG elsewhere
    last_blank = 2 * label_lengths
    last_label = jnp.maximum(2 * label_lengths - 1, 0)
    final_mask = jnp.where(
        (state_idx == last_blank[:, None]) | (state_idx == last_label[:, None]),
        0.0,
        NEG,
    )

    def pad(x, value, b_axis, s_axis=None):
        pads = [(0, 0)] * x.ndim
        pads[b_axis] = (0, b_pad - b)
        if s_axis is not None:
            pads[s_axis] = (0, s_pad - s)
        return jnp.pad(x, pads, constant_values=value)

    emits_p = pad(emits.astype(jnp.float32), NEG, 1, 2)
    skip_p = pad(skip_ok.astype(jnp.float32), 0.0, 0, 1)
    valid_p = pad(state_valid.astype(jnp.float32), 0.0, 0, 1)

    def expand(a):
        a = pad(a, 0.0, 1)[:, :, None]
        return jnp.broadcast_to(a, (t_max, b_pad, s_pad))

    active_p = expand(active)
    active_beta_p = expand(active_beta)
    final_p = pad(final_mask.astype(jnp.float32), NEG, 0, 1)
    return (emits_p, skip_p, valid_p, active_p, active_beta_p, final_p, ext)


def ctc_alphas_betas_pallas(
    log_probs, input_lengths, labels, label_lengths, blank_id
):
    """Returns (alphas (T,B,S), betas (T,B,S), ll (B,)) via Pallas kernels."""
    b, t_max, _ = log_probs.shape
    s, s_pad, b_pad = _pad_sizes(b, labels.shape[1])
    (emits, skip_ok, valid, active, active_beta, final_mask, ext) = _prepare(
        log_probs, input_lengths, labels, label_lengths, blank_id
    )

    grid = (t_max,)
    alpha = pl.pallas_call(
        _alpha_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, b_pad, s_pad), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_pad, s_pad), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_pad, s_pad), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_pad, s_pad), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, b_pad, s_pad), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_max, b_pad, s_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((b_pad, s_pad), jnp.float32)],
        interpret=_interpret(),
    )(emits, skip_ok, valid, active)

    # beta: reverse time; emissions block for step i is t+1 = T-1-i+... :
    # at grid index i (t = T-1-i), we need emit[t+1]; supply via index map
    # (T-1-i+1) clamped — for i = 0 the value is unused (init branch).
    def emit_next_map(i):
        return (jnp.maximum(t_max - 1 - i + 1, 0), 0, 0)

    # skip mask evaluated at destination s' = s+2 -> shift left by 2
    skip_next = jnp.concatenate(
        [skip_ok[:, 2:], jnp.zeros((b_pad, 2), jnp.float32)], axis=1
    )
    beta = pl.pallas_call(
        _beta_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, b_pad, s_pad), emit_next_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_pad, s_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_pad, s_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_pad, s_pad), lambda i: (t_max - 1 - i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_pad, s_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, b_pad, s_pad), lambda i: (t_max - 1 - i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((t_max, b_pad, s_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((b_pad, s_pad), jnp.float32)],
        interpret=_interpret(),
    )(emits, skip_next, valid, active_beta, final_mask)

    alphas = alpha[:, :b, :s]
    betas = beta[:, :b, :s]

    # log-likelihood from the final alpha row at each sequence's end
    last_idx = jnp.clip(input_lengths - 1, 0, t_max - 1)
    alpha_last = alphas[last_idx, jnp.arange(b)]  # (B, S)
    last_blank = 2 * label_lengths
    last_label = jnp.maximum(2 * label_lengths - 1, 0)
    fb = jnp.take_along_axis(alpha_last, last_blank[:, None], axis=1)[:, 0]
    fl = jnp.take_along_axis(alpha_last, last_label[:, None], axis=1)[:, 0]
    m = jnp.maximum(fb, fl)
    ll = m + jnp.log(jnp.exp(fb - m) + jnp.exp(fl - m) + 1e-30)
    return alphas, betas, ll, ext


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def ctc_neg_log_likelihood_pallas(
    log_probs, input_lengths, labels, label_lengths, blank_id: int
):
    """Per-sequence CTC negative log likelihood (B,), Pallas-accelerated."""
    _, _, ll, _ = ctc_alphas_betas_pallas(
        log_probs, input_lengths, labels, label_lengths, blank_id
    )
    return -ll


def _ctc_fwd(log_probs, input_lengths, labels, label_lengths, blank_id):
    alphas, betas, ll, ext = ctc_alphas_betas_pallas(
        log_probs, input_lengths, labels, label_lengths, blank_id
    )
    res = (alphas, betas, ll, ext, log_probs.shape, input_lengths)
    return -ll, res


def _ctc_bwd(blank_id, res, g):
    alphas, betas, ll, ext, shape, input_lengths = res
    b, t_max, c = shape
    # occupation posteriors gamma[t, b, s] = exp(alpha + beta - ll)
    gamma = jnp.exp(alphas + betas - ll[None, :, None])
    # mask past-length frames
    t_idx = jnp.arange(t_max)[:, None, None]
    gamma = jnp.where(t_idx < input_lengths[None, :, None], gamma, 0.0)
    # scatter to classes via one-hot matmul: (T,B,S) x (B,S,C) -> (T,B,C)
    onehot = jax.nn.one_hot(ext, c, dtype=gamma.dtype)  # (B, S, C)
    grad_ll = jnp.einsum(
        "tbs,bsc->btc", gamma, onehot, preferred_element_type=jnp.float32
    )
    # d(-ll)/d log_probs = -gamma_c ; chain with upstream g (B,)
    grad = -grad_ll * g[:, None, None]
    return (grad, None, None, None)


ctc_neg_log_likelihood_pallas.defvjp(_ctc_fwd, _ctc_bwd)


def ctc_loss_with_priors_pallas(
    log_probs, input_lengths, labels, label_lengths, blank_id,
    log_priors=None, prior_scale: float = 0.0, reduction: str = "mean",
):
    """Drop-in Pallas-fused replacement for ops.ctc.ctc_loss_with_priors."""
    log_probs = log_probs.astype(jnp.float32)
    if log_priors is not None and prior_scale > 0.0:
        log_probs = log_probs - prior_scale * log_priors[None, None, :]
    loss = ctc_neg_log_likelihood_pallas(
        log_probs, input_lengths, labels, label_lengths, blank_id
    )
    if reduction == "mean":
        return jnp.mean(loss / jnp.maximum(label_lengths, 1))
    if reduction == "sum":
        return jnp.sum(loss)
    return loss
