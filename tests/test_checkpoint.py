"""Checkpoint save/restore round trip + manifest semantics."""

import os.path as osp

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stylish_tts_tpu.config import Config, ModelConfig
from stylish_tts_tpu.trainer.checkpoint import (
    Manifest,
    checkpoint_dir_name,
    find_latest_checkpoint,
    load_checkpoint,
    save_checkpoint,
)
from stylish_tts_tpu.trainer.normalization import NormalizationStats
from stylish_tts_tpu.trainer.state import create_train_state


def _tiny_state():
    params = {
        "m1": {"dense": {"kernel": jnp.ones((4, 4)), "bias": jnp.zeros(4)}},
        "m2": {"conv": {"kernel": jnp.full((3, 2, 2), 0.5)}},
    }
    return create_train_state(params, n_classes=10, seed=3)


def test_checkpoint_roundtrip(tmp_path):
    state = _tiny_state()
    state = state.replace(step=jnp.asarray(42, jnp.int32))
    manifest = Manifest(
        current_epoch=3, current_step=7, current_total_step=42,
        stage="acoustic", best_loss=1.25,
    )
    cfg = Config()
    mc = ModelConfig()
    norm = NormalizationStats(mel_log_mean=-3.3, mel_log_std=2.2)
    path = save_checkpoint(str(tmp_path), state, manifest, cfg, mc, norm)
    assert osp.basename(path) == checkpoint_dir_name(3, 42)
    assert find_latest_checkpoint(str(tmp_path)) == path

    restored, m2, n2 = load_checkpoint(path, _tiny_state())
    assert int(restored.step) == 42
    assert m2.stage == "acoustic" and m2.best_loss == 1.25
    assert n2.mel_log_mean == -3.3
    np.testing.assert_array_equal(
        np.asarray(restored.params["m1"]["dense"]["kernel"]),
        np.ones((4, 4)),
    )
    # rng state survives
    np.testing.assert_array_equal(
        np.asarray(restored.rng), np.asarray(state.rng)
    )


def test_restore_with_live_frozen_tree(tmp_path):
    """Restoring into an abstract state that carries frozen aux weights
    (e.g. the slm WavLM attached by the trainer) must work even though
    save_checkpoint strips frozen from the stored pytree."""
    state = _tiny_state()
    cfg, mc, norm = Config(), ModelConfig(), NormalizationStats()
    path = save_checkpoint(
        str(tmp_path), state, Manifest(), cfg, mc, norm
    )
    abstract = _tiny_state().replace(
        frozen={"wavlm": {"w": jnp.ones((8, 8))}}
    )
    restored, _, _ = load_checkpoint(path, abstract)
    assert restored.frozen == {}
    np.testing.assert_array_equal(
        np.asarray(restored.params["m2"]["conv"]["kernel"]),
        np.full((3, 2, 2), 0.5),
    )


def test_restore_legacy_checkpoint_without_frozen_node(tmp_path):
    """Checkpoints written before TrainState grew `frozen` restore via
    the field-by-field fallback (ADVICE r2: resume is the documented
    donation-OOM recovery path and must not break on pytree structure)."""
    import orbax.checkpoint as ocp

    state = _tiny_state()
    legacy = {
        f: getattr(state, f)
        for f in (
            "params", "opt_state", "disc_ema", "log_priors",
            "log_priors_sum", "prior_count", "rng", "step",
        )
    }
    path = tmp_path / checkpoint_dir_name(1, 0)
    path.mkdir()
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(osp.abspath(str(path / "state")), legacy, force=True)
    ckpt.wait_until_finished()
    Manifest().to_json()
    (path / "manifest.json").write_text(Manifest().to_json())
    NormalizationStats().save(str(path / "normalization.json"))

    restored, _, _ = load_checkpoint(str(path), _tiny_state())
    assert restored.frozen == {}
    np.testing.assert_array_equal(
        np.asarray(restored.params["m1"]["dense"]["kernel"]),
        np.ones((4, 4)),
    )


def test_checkpoint_pruning(tmp_path):
    state = _tiny_state()
    cfg, mc, norm = Config(), ModelConfig(), NormalizationStats()
    for step in range(6):
        manifest = Manifest(current_epoch=1, current_total_step=step)
        save_checkpoint(
            str(tmp_path), state, manifest, cfg, mc, norm, max_keep=3
        )
    import os

    kept = [d for d in os.listdir(tmp_path) if d.startswith("checkpoint_")]
    assert len(kept) == 3
    assert checkpoint_dir_name(1, 5) in kept
