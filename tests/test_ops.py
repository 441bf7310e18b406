"""Golden tests for CTC (vs torch.nn.functional.ctc_loss) and duration ops."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from stylish_tts_tpu.ops.ctc import (
    accumulate_label_priors,
    ctc_forced_align,
    ctc_loss_with_priors,
    update_log_priors,
)
from stylish_tts_tpu.ops.duration import DurationProcessor


def _random_ctc_problem(b=3, t=40, c=12, u=8, blank=11, seed=0):
    rng = np.random.default_rng(seed)
    logits = rng.standard_normal((b, t, c)).astype(np.float32)
    log_probs = torch.log_softmax(torch.from_numpy(logits), dim=-1).numpy()
    labels = rng.integers(0, c - 1, size=(b, u)).astype(np.int32)
    label_lengths = np.array([u, u - 2, u - 5], dtype=np.int32)
    input_lengths = np.array([t, t - 7, t - 15], dtype=np.int32)
    # zero out label padding
    for i in range(b):
        labels[i, label_lengths[i]:] = 0
    return log_probs, input_lengths, labels, label_lengths, blank


def test_ctc_loss_matches_torch():
    log_probs, input_lengths, labels, label_lengths, blank = _random_ctc_problem()
    ours = ctc_loss_with_priors(
        jnp.asarray(log_probs),
        jnp.asarray(input_lengths),
        jnp.asarray(labels),
        jnp.asarray(label_lengths),
        blank_id=blank,
        reduction="none",
    )
    ref = F.ctc_loss(
        torch.from_numpy(log_probs).permute(1, 0, 2),  # (T, B, C)
        torch.from_numpy(labels.astype(np.int64)),
        torch.from_numpy(input_lengths.astype(np.int64)),
        torch.from_numpy(label_lengths.astype(np.int64)),
        blank=blank,
        reduction="none",
    ).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-4)


def test_ctc_loss_gradient_flows():
    import jax

    log_probs, input_lengths, labels, label_lengths, blank = _random_ctc_problem()

    def loss_fn(lp):
        return ctc_loss_with_priors(
            lp,
            jnp.asarray(input_lengths),
            jnp.asarray(labels),
            jnp.asarray(label_lengths),
            blank_id=blank,
        )

    g = jax.grad(loss_fn)(jnp.asarray(log_probs))
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0


def test_ctc_priors_shift_changes_loss():
    log_probs, input_lengths, labels, label_lengths, blank = _random_ctc_problem()
    priors = jnp.asarray(np.linspace(-3, -1, log_probs.shape[-1]).astype(np.float32))
    base = ctc_loss_with_priors(
        jnp.asarray(log_probs), jnp.asarray(input_lengths),
        jnp.asarray(labels), jnp.asarray(label_lengths), blank_id=blank,
    )
    shifted = ctc_loss_with_priors(
        jnp.asarray(log_probs), jnp.asarray(input_lengths),
        jnp.asarray(labels), jnp.asarray(label_lengths), blank_id=blank,
        log_priors=priors, prior_scale=0.3,
    )
    assert abs(float(base) - float(shifted)) > 1e-3


def test_forced_align_recovers_planted_alignment():
    # Build sharply peaked log-probs following a known monotonic alignment.
    b, c, blank = 1, 10, 9
    true_durs = np.array([4, 6, 3, 7])  # 4 tokens, 20 frames
    labels = np.array([[2, 5, 2, 7]], dtype=np.int32)
    t = int(true_durs.sum())
    logits = np.full((b, t, c), -8.0, dtype=np.float32)
    pos = 0
    for tok, d in zip(labels[0], true_durs):
        logits[0, pos : pos + d, tok] = 8.0
        pos += d
    log_probs = torch.log_softmax(torch.from_numpy(logits), -1).numpy()
    res = ctc_forced_align(
        jnp.asarray(log_probs),
        jnp.asarray([t], dtype=jnp.int32),
        jnp.asarray(labels),
        jnp.asarray([4], dtype=jnp.int32),
        blank_id=blank,
    )
    durs = np.asarray(res.durations)[0]
    np.testing.assert_array_equal(durs, true_durs)
    assert durs.sum() == t
    assert float(res.scores[0]) > -1.0  # confident path


def test_forced_align_durations_sum_to_length_padded():
    log_probs, input_lengths, labels, label_lengths, blank = _random_ctc_problem()
    res = ctc_forced_align(
        jnp.asarray(log_probs),
        jnp.asarray(input_lengths),
        jnp.asarray(labels),
        jnp.asarray(label_lengths),
        blank_id=blank,
    )
    sums = np.asarray(res.durations).sum(axis=1)
    np.testing.assert_array_equal(sums, input_lengths)


def test_prior_accumulation_and_update():
    log_probs, input_lengths, *_ = _random_ctc_problem()
    lse, count = accumulate_label_priors(
        jnp.asarray(log_probs), jnp.asarray(input_lengths)
    )
    assert lse.shape == (log_probs.shape[-1],)
    priors = update_log_priors(lse, count)
    p = np.asarray(priors)
    assert np.all(p >= -12.0) and np.all(p <= 0.1)
    # priors of normalized posteriors should be a rough distribution
    assert abs(np.exp(p).sum() - 1.0) < 0.2


def test_duration_processor_tables_match_reference_values():
    dp = DurationProcessor()
    np.testing.assert_array_equal(
        np.asarray(dp.class_to_dur_table),
        [1, 2, 3, 4, 5, 6, 7, 9, 12, 15, 18, 22, 27, 32, 38, 46],
    )
    table = np.asarray(dp.dur_to_class_table)
    assert table.shape == (51,)
    # spot values from the reference table (utils.py:661-722)
    assert table[1] == 0 and table[2] == 1 and table[8] == 7
    assert table[17] == 10 and table[25] == 12 and table[50] == 15
    # round trip: class -> dur -> class is identity
    cls = np.arange(16)
    durs = np.asarray(dp.class_to_dur_hard(jnp.asarray(cls)))
    back = np.asarray(dp.dur_to_class(jnp.asarray(durs)))
    np.testing.assert_array_equal(back, cls)


def test_duration_to_alignment_properties():
    dp = DurationProcessor()
    durs = jnp.asarray([[3.0, 5.0, 2.0, 0.0]])
    total = 10
    align = np.asarray(dp.duration_to_alignment(durs, total))
    assert align.shape == (1, 4, 10)
    # each frame's token distribution sums to 1 (softmax over tokens)
    np.testing.assert_allclose(align.sum(axis=1), 1.0, atol=2e-4)
    # mass for early frames concentrates on early tokens
    assert align[0, 0, 0] > align[0, 2, 0]
    assert align[0, 1, 4] > align[0, 0, 4]


def test_forced_align_attribution_matches_reference_loop():
    """Blank attribution parity with the reference's active torch_align
    loop (align_text.py:330-349): blanks stay with the CURRENT token;
    leading blanks go to the first token."""
    import jax

    rng = np.random.default_rng(3)
    B, T, U, C = 4, 24, 4, 7
    blank = C - 1
    logits = rng.standard_normal((B, T, C)).astype(np.float32) * 2.0
    log_probs = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    labels = np.stack([rng.permutation(C - 1)[:U] for _ in range(B)])
    in_len = np.array([24, 20, 17, 24])
    lab_len = np.array([4, 4, 3, 2])

    res = ctc_forced_align(
        log_probs, jnp.asarray(in_len), jnp.asarray(labels),
        jnp.asarray(lab_len), blank_id=blank,
    )

    def np_viterbi(lp, T_i, labs, U_i):
        # independent trellis: extended labels [b l0 b l1 ... b]
        ext = [blank]
        for u in range(U_i):
            ext += [int(labs[u]), blank]
        S = len(ext)
        NEG = -1e30
        alpha = np.full(S, NEG)
        alpha[0] = lp[0, ext[0]]
        if S > 1:
            alpha[1] = lp[0, ext[1]]
        back = np.zeros((T_i, S), np.int64)
        for t in range(1, T_i):
            new = np.full(S, NEG)
            for s in range(S):
                cands = [alpha[s]]
                if s >= 1:
                    cands.append(alpha[s - 1])
                else:
                    cands.append(NEG)
                if (s >= 2 and ext[s] != blank and ext[s] != ext[s - 2]):
                    cands.append(alpha[s - 2])
                else:
                    cands.append(NEG)
                k = int(np.argmax(cands))
                back[t, s] = k
                new[s] = cands[k] + lp[t, ext[s]]
            alpha = new
        s = S - 1 if alpha[S - 1] >= alpha[S - 2] else S - 2
        path = [s]
        for t in range(T_i - 1, 0, -1):
            s = s - back[t, s]
            path.append(s)
        path.reverse()
        frame_labels = [ext[s] for s in path]
        # the reference attribution loop (align_text.py:330-349)
        durs = np.zeros(U_i, np.int64)
        text_index = 0
        last_text = None  # reference assumes the path starts on a token;
        was_blank = False  # treat a leading blank run as token 0
        for lab in frame_labels:
            if lab == blank:
                was_blank = True
            else:
                if last_text is not None and (lab != last_text or was_blank):
                    text_index += 1
                last_text = lab
                was_blank = False
            durs[min(text_index, U_i - 1)] += 1
        return durs

    for b in range(B):
        want = np_viterbi(
            np.asarray(log_probs[b]), int(in_len[b]), labels[b], int(lab_len[b])
        )
        got = np.asarray(res.durations[b][: lab_len[b]])
        assert got.sum() == in_len[b]
        np.testing.assert_array_equal(got, want)


def test_k2_pad_attribution_matches_reference_heuristic():
    """The reference-default `--method k2` attribution (align_text.py:
    407-475): leading silence -> prefix pad, each inner token owns its
    frames plus the silence after it, the last token's extent comes from
    the posterior argmax, the rest -> suffix pad."""
    from stylish_tts_tpu.dataprep.align import k2_pad_attribution

    b, c, blank = 1, 10, 9
    # frames: 0-3 silence | 4-6 tok2 | 7-9 silence | 10-12 tok5 | 13-19 sil
    t = 20
    logits = np.full((b, t, c), -8.0, dtype=np.float32)
    logits[0, :, blank] = 8.0
    logits[0, 4:7, :] = -8.0
    logits[0, 4:7, 2] = 8.0
    logits[0, 10:13, :] = -8.0
    logits[0, 10:13, 5] = 8.0
    log_probs = torch.log_softmax(torch.from_numpy(logits), -1).numpy()
    inner = np.array([[2, 5]], dtype=np.int32)
    res = ctc_forced_align(
        jnp.asarray(log_probs), jnp.asarray([t], np.int32),
        jnp.asarray(inner), jnp.asarray([2], np.int32), blank_id=blank,
    )
    onsets = np.asarray(res.onsets)[0]
    assert onsets.sum() == 2
    arg_blank = np.asarray(log_probs).argmax(-1)[0] == blank
    durs = k2_pad_attribution(onsets, arg_blank, t)
    # [prefix=4, tok2 = 3 frames + 3 trailing silence = 6,
    #  tok5 = argmax-silence onset 3 frames after its start, suffix=7]
    np.testing.assert_array_equal(durs, [4.0, 6.0, 3.0, 7.0])
    assert durs.sum() == t

    # single-inner-token shape: [prefix, tok, suffix]
    res1 = ctc_forced_align(
        jnp.asarray(log_probs), jnp.asarray([t], np.int32),
        jnp.asarray([[2, 0]], np.int32), jnp.asarray([1], np.int32),
        blank_id=blank,
    )
    durs1 = k2_pad_attribution(
        np.asarray(res1.onsets)[0], arg_blank, t
    )
    assert durs1.shape == (3,) and durs1.sum() == t

    # no-onset fallback (untrained model): single catch-all duration
    empty = np.zeros(t, bool)
    assert k2_pad_attribution(empty, arg_blank, t).tolist() == [float(t)]
