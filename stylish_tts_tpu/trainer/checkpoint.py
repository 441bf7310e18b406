"""Checkpoint / resume.

Parity with the reference's accelerate save_state directories
(reference: train/train.py:453-469, train_context.py:110-113):
directory naming ``checkpoint_{epoch:05d}_step_{step:09d}``, carrying
all model params, optimizer moments, disc-loss EMAs, CTC priors, RNG,
manifest counters, configs and normalization stats.  Resume semantics:
same stage -> fast-forward the sampler (skip_first_batches equivalent);
different stage -> fresh stage counters (train.py:244-260).

Storage is orbax (async-capable, TPU-friendly) for the TrainState
pytree + JSON sidecars for manifest/config/normalization.
"""

from __future__ import annotations

import json
import os
import os.path as osp
import shutil
from dataclasses import asdict, dataclass, field, fields
from typing import Optional

import jax
import orbax.checkpoint as ocp

from ..config import Config, ModelConfig
from .normalization import NormalizationStats
from .state import TrainState


@dataclass
class Manifest:
    """Training progress counters (reference train_context.py:27-44)."""

    current_epoch: int = 1
    current_step: int = 1
    current_total_step: int = 0
    steps_per_epoch: int = 0
    stage: str = "alignment"
    best_loss: float = float("inf")
    training_log: list = field(default_factory=list)

    def to_json(self) -> str:
        return json.dumps(asdict(self), indent=2)

    @classmethod
    def from_json(cls, text: str) -> "Manifest":
        return cls(**json.loads(text))


def checkpoint_dir_name(epoch: int, step: int) -> str:
    return f"checkpoint_{epoch:05d}_step_{step:09d}"


def save_checkpoint(
    out_dir: str,
    state: TrainState,
    manifest: Manifest,
    config: Config,
    model_config: ModelConfig,
    normalization: NormalizationStats,
    max_keep: int = 4,
) -> str:
    path = osp.join(
        out_dir, checkpoint_dir_name(manifest.current_epoch, manifest.current_total_step)
    )
    os.makedirs(path, exist_ok=True)
    ckpt = ocp.StandardCheckpointer()
    # frozen aux weights (slm WavLM) are NOT ours to checkpoint — they're
    # loadable from their own source and would add ~380 MB per save; the
    # trainer re-attaches them at stage start (loop.run_stage)
    state = state.replace(frozen={})
    ckpt.save(osp.abspath(osp.join(path, "state")), state, force=True)
    ckpt.wait_until_finished()
    with open(osp.join(path, "manifest.json"), "w", encoding="utf-8") as f:
        f.write(manifest.to_json())
    with open(osp.join(path, "config.json"), "w", encoding="utf-8") as f:
        f.write(config.model_dump_json(indent=2))
    with open(osp.join(path, "model_config.json"), "w", encoding="utf-8") as f:
        f.write(model_config.model_dump_json(indent=2))
    normalization.save(osp.join(path, "normalization.json"))

    # prune old checkpoints (keep the newest max_keep)
    siblings = sorted(
        d for d in os.listdir(out_dir) if d.startswith("checkpoint_")
    )
    for old in siblings[:-max_keep]:
        shutil.rmtree(osp.join(out_dir, old), ignore_errors=True)
    return path


def load_checkpoint(
    path: str, abstract_state: TrainState
) -> tuple[TrainState, Manifest, NormalizationStats]:
    ckpt = ocp.StandardCheckpointer()
    # frozen aux weights are stripped at save time (see save_checkpoint),
    # so the restore target must not carry the caller's live frozen tree;
    # the trainer re-attaches it after restore.
    target = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
        if hasattr(x, "shape")
        else x,
        abstract_state.replace(frozen={}),
    )
    state_path = osp.abspath(osp.join(path, "state"))
    try:
        state = ckpt.restore(state_path, target)
    except Exception as exc:
        # Checkpoints written before TrainState grew the `frozen` field
        # have no such node at all; restore field-by-field into a plain
        # dict and rebuild the dataclass (resume is the documented
        # recovery path — never fail it on a pytree-structure detail).
        # Only that structure mismatch is retried: anything else (corrupt
        # dir, shape/config mismatch) re-raises the ORIGINAL error rather
        # than burying it under a second, unrelated one.
        msg = str(exc)
        if not ("structure" in msg or "frozen" in msg or "tree" in msg):
            raise
        legacy_target = {
            f.name: getattr(target, f.name)
            for f in fields(target)
            if f.name != "frozen"
        }
        try:
            restored = ckpt.restore(state_path, legacy_target)
        except Exception:
            raise exc
        state = TrainState(frozen={}, **restored)
    with open(osp.join(path, "manifest.json"), "r", encoding="utf-8") as f:
        manifest = Manifest.from_json(f.read())
    norm = NormalizationStats.load(osp.join(path, "normalization.json"))
    return state, manifest, norm


def find_latest_checkpoint(out_dir: str) -> Optional[str]:
    if not osp.isdir(out_dir):
        return None
    cands = sorted(
        d for d in os.listdir(out_dir) if d.startswith("checkpoint_")
    )
    return osp.join(out_dir, cands[-1]) if cands else None
