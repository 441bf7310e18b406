"""WavLM encoder in JAX — the frozen SLM perceptual-loss network.

The reference wraps HF's torch `microsoft/wavlm-base-plus` and L1-matches
the stacked hidden states of target vs predicted audio at 16 kHz
(reference: train/losses.py:376-394).  Here the WavLM-base encoder is
reimplemented in flax so the loss runs *inside* the jit'd train step on
TPU: conv feature extractor, feature projection, conv positional
embedding, and 12 transformer layers with WavLM's gated relative
position bias (bucketed T5-style bias on layer 0, shared downstream,
per-layer sigmoid gating).

`convert_torch_wavlm` maps a `transformers.WavLMModel` state dict onto
the flax params; parity is golden-tested against a randomly initialized
HF model in tests (no weight download required).
"""

from __future__ import annotations

import math
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

CONV_DIMS = (512, 512, 512, 512, 512, 512, 512)
CONV_KERNELS = (10, 3, 3, 3, 3, 2, 2)
CONV_STRIDES = (5, 2, 2, 2, 2, 2, 2)
HIDDEN = 768
LAYERS = 12
HEADS = 12
FFN = 3072
NUM_BUCKETS = 320
MAX_DISTANCE = 800
POS_CONV_KERNEL = 128
POS_CONV_GROUPS = 16


def _relative_position_buckets(q_len: int, k_len: int) -> np.ndarray:
    """T5-style log-bucketed relative positions (torch parity)."""
    num_buckets = NUM_BUCKETS // 2
    ctx = np.arange(q_len)[:, None]
    mem = np.arange(k_len)[None, :]
    rel = mem - ctx
    buckets = (rel > 0).astype(np.int64) * num_buckets
    rel = np.abs(rel)
    max_exact = num_buckets // 2
    is_small = rel < max_exact
    large = np.log(np.maximum(rel, 1).astype(np.float64) / max_exact)
    large = large / math.log(MAX_DISTANCE / max_exact)
    large = (max_exact + large * (num_buckets - max_exact)).astype(np.int64)
    large = np.minimum(large, num_buckets - 1)
    buckets += np.where(is_small, rel, large)
    # int32 so jnp.asarray under a jit trace is a no-op constant (an
    # int64->int32 convert op would turn the table into a tracer)
    return buckets.astype(np.int32)


class WavLMEncoderLayer(nn.Module):
    has_bias_embed: bool

    @nn.compact
    def __call__(self, x, position_bias):
        """x: (B, T, H); position_bias: (heads, T, T) or None (layer 0
        computes it)."""
        b, t, _ = x.shape
        head_dim = HIDDEN // HEADS

        if self.has_bias_embed:
            buckets = jnp.asarray(_relative_position_buckets(t, t))
            embed = self.param(
                "rel_attn_embed",
                nn.initializers.normal(0.02),
                (NUM_BUCKETS, HEADS),
            )
            position_bias = jnp.transpose(embed[buckets], (2, 0, 1))

        # gated relative position bias
        gated = x.reshape(b, t, HEADS, head_dim).transpose(0, 2, 1, 3)
        proj = nn.Dense(8, name="gru_rel_pos_linear")(gated)
        proj = proj.reshape(b, HEADS, t, 2, 4).sum(-1)
        gate = jax.nn.sigmoid(proj)
        gate_a, gate_b = gate[..., 0], gate[..., 1]
        const = self.param(
            "gru_rel_pos_const", nn.initializers.ones, (1, HEADS, 1, 1)
        )
        gate_out = gate_a * (gate_b * const[0, :, :, 0][None] - 1.0) + 2.0
        gated_bias = gate_out[..., None] * position_bias[None]  # (B,H,T,T)

        # attention
        q = nn.Dense(HIDDEN, name="q_proj")(x)
        k = nn.Dense(HIDDEN, name="k_proj")(x)
        v = nn.Dense(HIDDEN, name="v_proj")(x)

        def heads(z):
            return z.reshape(b, t, HEADS, head_dim).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        scores = jnp.einsum(
            "bhtd,bhsd->bhts", q, k, preferred_element_type=jnp.float32
        ) / math.sqrt(head_dim)
        scores = scores + gated_bias
        attn = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhts,bhsd->bhtd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, t, HIDDEN)
        out = nn.Dense(HIDDEN, name="out_proj")(out)

        x = nn.LayerNorm(name="layer_norm")(x + out)
        h = nn.Dense(FFN, name="intermediate_dense")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(HIDDEN, name="output_dense")(h)
        x = nn.LayerNorm(name="final_layer_norm")(x + h)
        return x, position_bias


class WavLMEncoder(nn.Module):
    """16 kHz audio (B, S) -> list of 13 hidden states (B, T, 768)."""

    @nn.compact
    def __call__(self, audio: jnp.ndarray) -> List[jnp.ndarray]:
        x = audio[:, :, None]  # (B, S, 1)
        # conv feature extractor
        for i, (dim, kernel, stride) in enumerate(
            zip(CONV_DIMS, CONV_KERNELS, CONV_STRIDES)
        ):
            x = nn.Conv(
                dim, (kernel,), strides=(stride,), padding="VALID",
                use_bias=False, name=f"conv_{i}",
            )(x)
            if i == 0:
                x = nn.GroupNorm(num_groups=dim, name="conv_group_norm")(x)
            x = nn.gelu(x, approximate=False)

        # feature projection
        x = nn.LayerNorm(name="fp_layer_norm")(x)
        x = nn.Dense(HIDDEN, name="fp_projection")(x)

        # conv positional embedding (k=128, groups=16, same pad, drop last)
        pos = nn.Conv(
            HIDDEN, (POS_CONV_KERNEL,), padding=[(64, 64)],
            feature_group_count=POS_CONV_GROUPS, name="pos_conv",
        )(x)
        pos = nn.gelu(pos[:, :-1, :], approximate=False)
        x = x + pos
        x = nn.LayerNorm(name="encoder_layer_norm")(x)

        hidden_states = [x]
        position_bias = None
        for i in range(LAYERS):
            x, position_bias = WavLMEncoderLayer(
                has_bias_embed=(i == 0), name=f"layer_{i}"
            )(x, position_bias)
            hidden_states.append(x)
        return hidden_states


def convert_torch_wavlm(state_dict) -> Dict:
    """Map a transformers WavLMModel state dict onto WavLMEncoder params."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    p: Dict = {}

    for i in range(len(CONV_DIMS)):
        w = sd[f"feature_extractor.conv_layers.{i}.conv.weight"]
        p[f"conv_{i}"] = {"kernel": np.transpose(w, (2, 1, 0))}
    p["conv_group_norm"] = {
        "scale": sd["feature_extractor.conv_layers.0.layer_norm.weight"],
        "bias": sd["feature_extractor.conv_layers.0.layer_norm.bias"],
    }
    p["fp_layer_norm"] = {
        "scale": sd["feature_projection.layer_norm.weight"],
        "bias": sd["feature_projection.layer_norm.bias"],
    }
    p["fp_projection"] = {
        "kernel": sd["feature_projection.projection.weight"].T,
        "bias": sd["feature_projection.projection.bias"],
    }
    # weight-normed positional conv: weight = g * v / ||v||
    g = sd["encoder.pos_conv_embed.conv.parametrizations.weight.original0"]
    v = sd["encoder.pos_conv_embed.conv.parametrizations.weight.original1"]
    norm = np.sqrt((v**2).sum(axis=(0, 1), keepdims=True) + 1e-12)
    w = g * v / norm  # torch conv1d (out, in/groups, k) with dim0,1 norm
    p["pos_conv"] = {
        "kernel": np.transpose(w, (2, 1, 0)),
        "bias": sd["encoder.pos_conv_embed.conv.bias"],
    }
    p["encoder_layer_norm"] = {
        "scale": sd["encoder.layer_norm.weight"],
        "bias": sd["encoder.layer_norm.bias"],
    }
    for i in range(LAYERS):
        pre = f"encoder.layers.{i}."
        layer = {
            "gru_rel_pos_linear": {
                "kernel": sd[pre + "attention.gru_rel_pos_linear.weight"].T,
                "bias": sd[pre + "attention.gru_rel_pos_linear.bias"],
            },
            "gru_rel_pos_const": sd[
                pre + "attention.gru_rel_pos_const"
            ].reshape(1, HEADS, 1, 1),
            "q_proj": {
                "kernel": sd[pre + "attention.q_proj.weight"].T,
                "bias": sd[pre + "attention.q_proj.bias"],
            },
            "k_proj": {
                "kernel": sd[pre + "attention.k_proj.weight"].T,
                "bias": sd[pre + "attention.k_proj.bias"],
            },
            "v_proj": {
                "kernel": sd[pre + "attention.v_proj.weight"].T,
                "bias": sd[pre + "attention.v_proj.bias"],
            },
            "out_proj": {
                "kernel": sd[pre + "attention.out_proj.weight"].T,
                "bias": sd[pre + "attention.out_proj.bias"],
            },
            "layer_norm": {
                "scale": sd[pre + "layer_norm.weight"],
                "bias": sd[pre + "layer_norm.bias"],
            },
            "intermediate_dense": {
                "kernel": sd[pre + "feed_forward.intermediate_dense.weight"].T,
                "bias": sd[pre + "feed_forward.intermediate_dense.bias"],
            },
            "output_dense": {
                "kernel": sd[pre + "feed_forward.output_dense.weight"].T,
                "bias": sd[pre + "feed_forward.output_dense.bias"],
            },
            "final_layer_norm": {
                "scale": sd[pre + "final_layer_norm.weight"],
                "bias": sd[pre + "final_layer_norm.bias"],
            },
        }
        if i == 0:
            layer["rel_attn_embed"] = sd["encoder.rel_attn_embed.weight"] \
                if "encoder.rel_attn_embed.weight" in sd \
                else sd["encoder.layers.0.attention.rel_attn_embed.weight"]
        p[f"layer_{i}"] = layer
    return {"params": p}


# --------------------------------------------------------------------------
# 24 kHz -> 16 kHz polyphase resampler (torchaudio Resample parity-class)
# --------------------------------------------------------------------------


def _resample_kernel(orig: int, new: int, lowpass_width: int = 6) -> np.ndarray:
    """Windowed-sinc polyphase kernel (torchaudio sinc_interp_hann)."""
    g = np.gcd(orig, new)
    orig, new = orig // g, new // g
    base = min(orig, new)
    cutoff = 0.99 * 0.5 * base
    width = int(np.ceil(lowpass_width * orig / base))
    # kernel for each output phase
    idx = np.arange(-width, width + orig, dtype=np.float64)[None, :] / orig
    t = np.arange(0, -new, -1, dtype=np.float64)[:, None] / new + idx
    t = t * cutoff * 2
    t = np.clip(t, -lowpass_width, lowpass_width)
    window = np.cos(t * np.pi / lowpass_width / 2) ** 2
    kernel = np.where(t == 0, 1.0, np.sin(t * np.pi) / (t * np.pi + 1e-20))
    kernel = kernel * window * (cutoff * 2 / orig)
    return kernel.astype(np.float32)  # (new, taps)


def resample_24k_to_16k(audio: jnp.ndarray) -> jnp.ndarray:
    """(B, S) 24 kHz -> (B, ceil(S*2/3)) 16 kHz, in-graph."""
    orig, new = 3, 2
    kernel = jnp.asarray(_resample_kernel(24000, 16000))
    width = (kernel.shape[1] - orig) // 2
    x = jnp.pad(audio, ((0, 0), (width, width + orig)))[:, None, :]
    out = jax.lax.conv_general_dilated(
        x,
        kernel[:, None, :],
        window_strides=(orig,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=jax.lax.Precision.HIGHEST,
    )  # (B, new, frames)
    b = audio.shape[0]
    out = jnp.transpose(out, (0, 2, 1)).reshape(b, -1)
    target = int(np.ceil(audio.shape[1] * new / orig))
    return out[:, :target]


def wavlm_loss(params, target_audio: jnp.ndarray, pred_audio: jnp.ndarray):
    """Frozen WavLM L1 hidden-state loss (reference losses.py:382-394).

    ``params`` is an explicit argument so the training step receives
    the 95M WavLM weights as runtime buffers: closing over them embeds
    ~380 MB of fp32 constants in the serialized HLO, which the axon
    remote-compile tunnel rejects (HTTP 413).  In the trainer they ride
    ``TrainState.frozen["wavlm"]``."""
    model = WavLMEncoder()
    frozen = jax.tree.map(
        lambda x: jax.lax.stop_gradient(jnp.asarray(x)), params
    )
    target16 = resample_24k_to_16k(target_audio)
    pred16 = resample_24k_to_16k(pred_audio)
    t_states = model.apply(frozen, jax.lax.stop_gradient(target16))
    p_states = model.apply(frozen, pred16)
    loss = 0.0
    for ts, ps in zip(t_states, p_states):
        loss = loss + jnp.mean(jnp.abs(jax.lax.stop_gradient(ts) - ps))
    return loss / len(t_states)


def wavlm_embed(params, audio24k: jnp.ndarray) -> jnp.ndarray:
    """24 kHz audio (B, S) -> stacked hidden states (B, 13, T, 768).

    The GT side of the slm loss is a pure function of the dataset, so
    it can be precomputed once per segment (`stylish-train slm-cache`)
    instead of re-running the 95M-param encoder on the target audio
    every step — and a perceptual run can consume GT embeddings
    computed with the real pretrained weights elsewhere the moment the
    weights appear (VERDICT r2 item 5)."""
    model = WavLMEncoder()
    frozen = jax.tree.map(
        lambda x: jax.lax.stop_gradient(jnp.asarray(x)), params
    )
    states = model.apply(frozen, resample_24k_to_16k(audio24k))
    return jnp.stack(states, axis=1)


def wavlm_loss_cached(
    params, gt_states: jnp.ndarray, pred_audio: jnp.ndarray
):
    """slm loss against precomputed GT hidden states (B, 13, T, 768).

    Numerically identical to `wavlm_loss` when gt_states =
    `wavlm_embed(params, target_audio)` (same mean-of-means layer
    reduction), at half the WavLM compute per step."""
    model = WavLMEncoder()
    frozen = jax.tree.map(
        lambda x: jax.lax.stop_gradient(jnp.asarray(x)), params
    )
    p_states = model.apply(frozen, resample_24k_to_16k(pred_audio))
    gt = jax.lax.stop_gradient(gt_states.astype(jnp.float32))
    loss = 0.0
    n = len(p_states)
    for i, ps in enumerate(p_states):
        t = min(gt.shape[2], ps.shape[1])
        loss = loss + jnp.mean(jnp.abs(gt[:, i, :t] - ps[:, :t]))
    return loss / n


def make_wavlm_loss(params, sample_rate: int = 24000):
    """Bind params eagerly (test/eager convenience; inside jit prefer
    ``wavlm_loss`` with params as an argument — see its docstring)."""
    params = jax.tree.map(jnp.asarray, params)

    def loss_fn(target_audio: jnp.ndarray, pred_audio: jnp.ndarray):
        return wavlm_loss(params, target_audio, pred_audio)

    return loss_fn
