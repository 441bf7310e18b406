"""Batched CTC: loss with label priors + Viterbi forced alignment.

The TPU-native replacement for k2 (reference: train/losses.py:478-653
runs k2.ctc_loss / intersect_dense / shortest_path pinned to the CPU,
crossing the device boundary every step; here the whole trellis is a
lax.scan over time on device, batched).

Label-prior CTC ("Less Peaky CTC", reference losses.py:559-560):
scaled log-priors are subtracted from the posteriors *without*
renormalizing, so a hand-rolled forward recursion is required (a
softmax-normalizing CTC like optax's would cancel the shift).

The trellis uses the standard extended-label state space
z = [blank, l1, blank, l2, ..., lU, blank] (S = 2U+1 states):
  alpha[t, s] = emit[t, z_s] + LSE(alpha[t-1, s], alpha[t-1, s-1],
                                   [alpha[t-1, s-2] if allowed])
Forced alignment runs the same trellis in max-plus with backpointers.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

NEG = -1e30


def _extended_labels(labels: jnp.ndarray, blank_id: int) -> jnp.ndarray:
    """(B, U) -> (B, 2U+1) extended label sequence with interleaved blanks."""
    b, u = labels.shape
    ext = jnp.full((b, 2 * u + 1), blank_id, dtype=labels.dtype)
    return ext.at[:, 1::2].set(labels)


def _transition_masks(ext: jnp.ndarray, blank_id: int):
    """Skip-transition allowed where z_s != blank and z_s != z_{s-2}."""
    s = ext.shape[1]
    skip_ok = jnp.zeros(ext.shape, dtype=bool)
    skip_ok = skip_ok.at[:, 2:].set(
        (ext[:, 2:] != blank_id) & (ext[:, 2:] != ext[:, :-2])
    )
    return skip_ok


def _emit_scores(log_probs: jnp.ndarray, ext: jnp.ndarray) -> jnp.ndarray:
    """log_probs (B, T, C), ext (B, S) -> (T, B, S) per-state emissions."""
    gathered = jnp.take_along_axis(
        log_probs, ext[:, None, :], axis=2
    )  # (B, T, S)
    return jnp.moveaxis(gathered, 1, 0)


def ctc_loss_with_priors(
    log_probs: jnp.ndarray,  # (B, T, C) log-softmax posteriors
    input_lengths: jnp.ndarray,  # (B,)
    labels: jnp.ndarray,  # (B, U) padded token ids
    label_lengths: jnp.ndarray,  # (B,)
    blank_id: int,
    log_priors: jnp.ndarray | None = None,  # (C,)
    prior_scale: float = 0.0,
    reduction: str = "mean",
) -> jnp.ndarray:
    """Negative log-likelihood CTC loss, optionally prior-shifted."""
    log_probs = log_probs.astype(jnp.float32)
    if log_priors is not None and prior_scale > 0.0:
        log_probs = log_probs - prior_scale * log_priors[None, None, :]

    b, t_max, _ = log_probs.shape
    u_max = labels.shape[1]
    s_max = 2 * u_max + 1
    ext = _extended_labels(labels, blank_id)
    skip_ok = _transition_masks(ext, blank_id)
    emits = _emit_scores(log_probs, ext)  # (T, B, S)

    # state validity: s < 2*label_len + 1
    state_idx = jnp.arange(s_max)[None, :]
    state_valid = state_idx < (2 * label_lengths[:, None] + 1)

    alpha0 = jnp.full((b, s_max), NEG)
    alpha0 = alpha0.at[:, 0].set(emits[0, :, 0])
    alpha0 = alpha0.at[:, 1].set(
        jnp.where(label_lengths > 0, emits[0, :, 1], NEG)
    )

    def shift(a, n):
        return jnp.concatenate([jnp.full((b, n), NEG), a[:, :-n]], axis=1)

    def step(alpha, inputs):
        emit_t, t = inputs
        stay = alpha
        step1 = shift(alpha, 1)
        step2 = jnp.where(skip_ok, shift(alpha, 2), NEG)
        stacked = jnp.stack([stay, step1, step2], axis=0)
        m = jnp.max(stacked, axis=0)
        new = m + jnp.log(
            jnp.sum(jnp.exp(stacked - m[None]), axis=0) + 1e-30
        )
        new = new + emit_t
        new = jnp.where(state_valid, new, NEG)
        # frames beyond each sequence's length keep alpha frozen
        active = (t < input_lengths)[:, None]
        return jnp.where(active, new, alpha), None

    ts = jnp.arange(1, t_max)
    alpha, _ = jax.lax.scan(step, alpha0, (emits[1:], ts))

    # final states: 2U (last blank) and 2U-1 (last label)
    last_blank = 2 * label_lengths
    last_label = jnp.maximum(2 * label_lengths - 1, 0)
    fin = jnp.stack(
        [
            jnp.take_along_axis(alpha, last_blank[:, None], axis=1)[:, 0],
            jnp.take_along_axis(alpha, last_label[:, None], axis=1)[:, 0],
        ],
        axis=0,
    )
    m = jnp.max(fin, axis=0)
    ll = m + jnp.log(jnp.sum(jnp.exp(fin - m[None]), axis=0) + 1e-30)
    loss = -ll
    if reduction == "mean":
        # torch/k2 "mean": divide by target length, then batch-average
        return jnp.mean(loss / jnp.maximum(label_lengths, 1))
    if reduction == "sum":
        return jnp.sum(loss)
    return loss


class ForcedAlignResult(NamedTuple):
    frame_tokens: jnp.ndarray  # (B, T) token index per frame (-1 past length)
    durations: jnp.ndarray  # (B, U) frames per token
    scores: jnp.ndarray  # (B,) mean per-frame log-prob of the best path
    onsets: jnp.ndarray  # (B, T) bool: first frame of each token's label state


def ctc_forced_align(
    log_probs: jnp.ndarray,  # (B, T, C)
    input_lengths: jnp.ndarray,  # (B,)
    labels: jnp.ndarray,  # (B, U)
    label_lengths: jnp.ndarray,  # (B,)
    blank_id: int,
) -> ForcedAlignResult:
    """Viterbi best path through the CTC trellis with backtrace.

    Replaces k2 intersect_dense + shortest_path
    (reference: losses.py:579-615) and torchaudio forced_align
    (align_text.py:315-404).  The `durations` attribution matches the
    reference's `--method torch` loop (align_text.py:330-349: blank
    frames stay with the *preceding* token, leading silence clips to
    the first token).  The reference's DEFAULT `--method k2` path
    (train/cli.py:130-133 -> align_text.py:251 k2_align) instead
    re-attributes leading/trailing silence to the prefix/suffix pad
    tokens — that post-processing lives in
    `dataprep/align.py::k2_pad_attribution`, built from the `onsets`
    mask returned here (k2's aux_labels mark each token once, at the
    frame its label state is first entered — exactly this mask).
    """
    log_probs = log_probs.astype(jnp.float32)
    b, t_max, _ = log_probs.shape
    u_max = labels.shape[1]
    s_max = 2 * u_max + 1
    ext = _extended_labels(labels, blank_id)
    skip_ok = _transition_masks(ext, blank_id)
    emits = _emit_scores(log_probs, ext)  # (T, B, S)

    state_idx = jnp.arange(s_max)[None, :]
    state_valid = state_idx < (2 * label_lengths[:, None] + 1)

    alpha0 = jnp.full((b, s_max), NEG)
    alpha0 = alpha0.at[:, 0].set(emits[0, :, 0])
    alpha0 = alpha0.at[:, 1].set(
        jnp.where(label_lengths > 0, emits[0, :, 1], NEG)
    )

    def shift(a, n):
        return jnp.concatenate([jnp.full((b, n), NEG), a[:, :-n]], axis=1)

    def step(alpha, inputs):
        emit_t, t = inputs
        stay = alpha
        step1 = shift(alpha, 1)
        step2 = jnp.where(skip_ok, shift(alpha, 2), NEG)
        stacked = jnp.stack([stay, step1, step2], axis=0)  # (3, B, S)
        choice = jnp.argmax(stacked, axis=0).astype(jnp.int8)
        best = jnp.max(stacked, axis=0) + emit_t
        best = jnp.where(state_valid, best, NEG)
        active = (t < input_lengths)[:, None]
        new = jnp.where(active, best, alpha)
        choice = jnp.where(active, choice, jnp.int8(0))
        return new, choice

    ts = jnp.arange(1, t_max)
    alpha, choices = jax.lax.scan(step, alpha0, (emits[1:], ts))
    # choices: (T-1, B, S)

    # best final state
    last_blank = 2 * label_lengths
    last_label = jnp.maximum(2 * label_lengths - 1, 0)
    fb = jnp.take_along_axis(alpha, last_blank[:, None], axis=1)[:, 0]
    fl = jnp.take_along_axis(alpha, last_label[:, None], axis=1)[:, 0]
    end_state = jnp.where(fb >= fl, last_blank, last_label)
    best_ll = jnp.maximum(fb, fl)

    # backtrace: walk t = T-1 .. 1, state(t-1) = state(t) - choice[t-1, state(t)].
    # choices were frozen to 0 (stay) past each sequence's length, so the
    # walk is a no-op in the padded tail.
    def back(state, choice_t):
        c = jnp.take_along_axis(choice_t, state[:, None], axis=1)[:, 0]
        return state - c.astype(state.dtype), state

    state_t0, states_rev = jax.lax.scan(back, end_state, choices, reverse=True)
    # states_rev[i] = state at time i+1; state_t0 = state at t=0
    states = jnp.concatenate([state_t0[None], states_rev], axis=0)  # (T, B)
    states = jnp.moveaxis(states, 0, 1)  # (B, T)

    # token attribution (reference align_text.py:330-349): label state
    # 2u+1 -> token u; blank state 2u -> the PRECEDING token u-1 (leading
    # blank clips to token 0); trailing blank 2U -> last token.
    tokens = jnp.where(states % 2 == 1, states // 2, states // 2 - 1)
    tokens = jnp.clip(tokens, 0, jnp.maximum(label_lengths - 1, 0)[:, None])
    frame_valid = jnp.arange(t_max)[None, :] < input_lengths[:, None]
    frame_tokens = jnp.where(frame_valid, tokens, -1)

    onehot = (
        frame_tokens[:, :, None] == jnp.arange(u_max)[None, None, :]
    ).astype(jnp.int32)
    durations = jnp.sum(onehot, axis=1)

    # token onsets: first frame of each (odd) label state — the exact
    # semantics of k2's per-frame aux_labels (one non-epsilon emission
    # per token, on the arc entering its state)
    label_state = states % 2 == 1
    changed = jnp.concatenate(
        [jnp.ones((b, 1), bool), states[:, 1:] != states[:, :-1]], axis=1
    )
    onsets = label_state & changed & frame_valid

    scores = best_ll / jnp.maximum(input_lengths, 1)
    return ForcedAlignResult(frame_tokens, durations, scores, onsets)


def accumulate_label_priors(
    log_probs: jnp.ndarray, input_lengths: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-batch prior statistics: (logsumexp over valid frames (C,), count).

    Cross-device reduction is a psum of the count and a logsumexp-tree of
    the log-sums (reference gathers via accelerate, losses.py:617-651).
    """
    b, t, c = log_probs.shape
    valid = (jnp.arange(t)[None, :] < input_lengths[:, None])[..., None]
    masked = jnp.where(valid, log_probs, NEG)
    flat = masked.reshape(b * t, c)
    m = jnp.max(flat, axis=0)
    lse = m + jnp.log(jnp.sum(jnp.exp(flat - m[None]), axis=0) + 1e-30)
    count = jnp.sum(input_lengths)
    return lse, count


def update_log_priors(
    log_priors_sum: jnp.ndarray, num_samples: jnp.ndarray, floor: float = -12.0
) -> jnp.ndarray:
    """End-of-epoch prior update with the reference's -12 floor
    (losses.py:646-651)."""
    new = log_priors_sum - jnp.log(num_samples + 1e-9)
    return jnp.maximum(new, floor)
