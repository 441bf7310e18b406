"""2-D mesh sharding: data axis + optional model (tensor) axis.

The reference's ceiling is data parallelism (SURVEY.md §2.8).  Here a
("data", "model") mesh shards the widest kernels megatron-style by
pattern-matching parameter tree paths:

  * pointwise expansions  (pwconv1, ConvFFN conv1, FFN intermediate):
    output-feature sharded  -> P(..., "model")
  * pointwise contractions (pwconv2, ConvFFN conv2, attention out):
    input-feature sharded   -> P("model", ...)
  * attention q/k/v: output (head) sharded

Adam moments mirror their parameter's spec (tree paths match), so the
whole TrainState shards with one tree_map_with_path.  The step
functions are untouched — XLA inserts the all-reduces implied by the
shardings (they ride ICI).
"""

from __future__ import annotations

import re
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"
DCN_AXIS = "dcn"

# (path regex, feature axis to shard): -1 = output features, -2 = input.
# Rules come in megatron column/row pairs wherever an elementwise
# nonlinearity separates an expansion from a contraction, so the pair
# needs ONE all-reduce (on the contraction output) and no resharding
# in between.  Unpairable kernels (depthwise convs, norm-separated
# stacks like the text-encoder prenet) stay replicated — GroupNorm /
# LayerNorm over the full feature axis would force an all-gather per
# layer, costing more ICI than the FLOPs saved.
_RULES = [
    # ConvNeXt pointwise pair (generator trunks, duration predictor)
    (r"pwconv1/kernel$", -1),
    (r"pwconv2/kernel$", -2),
    # conv-FFN pair (text encoder, prosody encoder)
    (r"ffn_\d+/conv1/Conv_0/kernel$", -1),
    (r"ffn_\d+/conv2/Conv_0/kernel$", -2),
    # attention head/out pairs
    (r"attn_\d+/(q|k|v)/kernel$", -1),
    (r"attn_\d+/out/kernel$", -2),
    (r"attn/(to_q|to_kv)/kernel$", -1),
    (r"attn/to_out/kernel$", -2),
    (r"cross_attention/(q|k|v)/kernel$", -1),
    (r"cross_attention/out/kernel$", -2),
    # conformer feed-forward pairs
    (r"(ff1|ff2)/Dense_0/kernel$", -1),
    (r"(ff1|ff2)/Dense_1/kernel$", -2),
    # AdaIN decoder / generator residual conv pairs (leaky/snake between)
    (r"(encode|decode_\d+)/conv1/Conv_0/kernel$", -1),
    (r"(encode|decode_\d+)/conv2/Conv_0/kernel$", -2),
    (r"conv1_\d+/Conv_0/kernel$", -1),
    (r"conv2_\d+/Conv_0/kernel$", -2),
    # pitch/energy twin AdaIN heads
    (r"(f0|n)_\d+/conv1/Conv_0/kernel$", -1),
    (r"(f0|n)_\d+/conv2/Conv_0/kernel$", -2),
    # style-encoder ResBlk pair (leaky between; the depthwise 'down'
    # shards along the same column-sharded features)
    (r"res_\d+/conv1/kernel$", -1),
    (r"res_\d+/down/kernel$", -1),
    (r"res_\d+/conv2/kernel$", -2),
    # style-encoder head: post conv column, output Dense row (global
    # average pool between is feature-elementwise)
    (r"core/post/kernel$", -1),
    (r"core/out/kernel$", -2),
    # aligner FFN stack: alternate column/row (ReLU between is
    # elementwise); the final head contracts the row-sharded ffn_4
    (r"ffn_(0|2|4)/kernel$", -1),
    (r"ffn_(1|3)/kernel$", -2),
    (r"text_aligner.*/out/kernel$", -2),
    # discriminators (24% of acoustic forward FLOPs for the 3 MRDs
    # alone — scripts/audit_sharding.py): alternate column/row down the
    # conv stacks (leaky_relu between is elementwise). Per-layer 1-ch
    # score heads reading a column-sharded activation contract it
    # (row-sharded); heads on replicated activations stay replicated.
    (r"^mrd\d/params/conv_(0|2|4)/kernel$", -1),
    (r"^mrd\d/params/conv_(1|3)/kernel$", -2),
    (r"^mrd\d/params/out_(0|2|4)/kernel$", -2),
    (r"^(pitch_disc|dur_disc)/params/conv_(0|2|4)/Conv_0/kernel$", -1),
    (r"^(pitch_disc|dur_disc)/params/conv_(1|3)/Conv_0/kernel$", -2),
    (r"^(pitch_disc|dur_disc)/params/out_(0|2|4)/Conv_0/kernel$", -2),
    # waveform disc trunk: GroupNorm(1) after each conv reduces over
    # the sharded feature axis, but only its (B, T, 1) stats cross
    # ranks — far cheaper than the conv FLOPs saved
    (r"^disc/params/conv(0|2)/conv/Conv_0/kernel$", -1),
    (r"^disc/params/conv(1|3)/conv/Conv_0/kernel$", -2),
    (r"^disc/params/last0/kernel$", -1),
    (r"^disc/params/last1/kernel$", -2),
]


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "name"):
            parts.append(str(p.name))
        else:
            parts.append(str(p))
    return "/".join(parts)


def spec_for_leaf(path, leaf) -> P:
    """PartitionSpec for one TrainState leaf (replicated by default)."""
    if not hasattr(leaf, "ndim") or leaf.ndim < 2:
        return P()
    s = _path_str(path)
    for pattern, axis in _RULES:
        if re.search(pattern, s):
            ndim = leaf.ndim
            ax = axis % ndim
            if leaf.shape[ax] % 2 != 0:
                return P()  # not divisible enough to bother
            spec = [None] * ndim
            spec[ax] = MODEL_AXIS
            return P(*spec)
    return P()


def make_2d_mesh(data: int, model: int, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    assert len(devices) >= data * model
    arr = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def state_shardings(state, mesh: Mesh):
    """NamedSharding tree for a TrainState under the 2-D mesh."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, spec_for_leaf(path, leaf)),
        state,
    )


def jit_2d_parallel_step(step_fn, state, mesh: Mesh):
    """jit a (state, batch) -> (state, metrics) step over a
    ("data", "model") mesh; batch sharded on data, params per rules."""
    st_shard = state_shardings(state, mesh)
    batch_shard = NamedSharding(mesh, P(DATA_AXIS))
    repl = NamedSharding(mesh, P())
    return jax.jit(
        step_fn,
        in_shardings=(st_shard, batch_shard),
        out_shardings=(st_shard, repl),
    )


def make_hybrid_mesh(slices: int, data: int, model: int, devices=None) -> Mesh:
    """("dcn", "data", "model") mesh for multi-slice TPU pods.

    The leading axis crosses slice boundaries: it carries pure data
    parallelism, so the only collective that rides DCN (the slow
    inter-slice fabric) is the once-per-step gradient all-reduce.
    "data" and "model" stay within a slice, so the per-layer
    tensor-parallel all-reduces implied by the megatron rules ride ICI.
    On real multi-slice hardware ``mesh_utils.create_hybrid_device_mesh``
    orders devices so axis 0 maps to slice boundaries; single-slice or
    virtual device lists fall back to a plain reshape (the axis
    semantics are identical, only the physical placement differs).
    """
    if devices is None:
        devices = jax.devices()
    n = slices * data * model
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    multi_slice = (
        len({getattr(d, "slice_index", 0) or 0 for d in devices[:n]}) > 1
    )
    try:
        from jax.experimental import mesh_utils

        arr = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(1, data, model),
            dcn_mesh_shape=(slices, 1, 1),
            devices=devices[:n],
        )
    except Exception:
        if multi_slice:
            # A plain reshape on real multi-slice hardware can place the
            # per-layer tensor-parallel axis across DCN — a severe,
            # silent step-time regression. Surface it loudly.
            import logging

            logging.getLogger(__name__).warning(
                "create_hybrid_device_mesh failed on a multi-slice device "
                "set; falling back to a plain reshape. The 'model' axis "
                "may span DCN — expect degraded step time.",
                exc_info=True,
            )
        arr = np.asarray(devices[:n]).reshape(slices, data, model)
    return Mesh(arr, (DCN_AXIS, DATA_AXIS, MODEL_AXIS))


def jit_hybrid_parallel_step(step_fn, state, mesh: Mesh):
    """jit a step over a ("dcn", "data", "model") mesh: batch sharded
    jointly over both data axes, params per the model rules."""
    st_shard = state_shardings(state, mesh)
    batch_shard = NamedSharding(mesh, P((DCN_AXIS, DATA_AXIS)))
    repl = NamedSharding(mesh, P())
    return jax.jit(
        step_fn,
        in_shardings=(st_shard, batch_shard),
        out_shardings=(st_shard, repl),
    )
