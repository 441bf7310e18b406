"""Trainer orchestration: alignment stage end-to-end + checkpoint resume."""

import os
import os.path as osp

import numpy as np
import pytest
import yaml

pytestmark = pytest.mark.slow
from fixtures import make_micro_dataset


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    root = tmp_path_factory.mktemp("trainer_e2e")
    make_micro_dataset(
        str(root / "data"), n_train=6, n_val=2, with_caches=True,
        uniform_duration=True,
    )
    return root


def _configs(root):
    from stylish_tts_tpu.config import Config, ModelConfig

    cfg = Config.model_validate({
        "training": {"log_interval": 2, "save_interval": 1000,
                     "val_interval": 1000, "device": "cpu",
                     "mixed_precision": "no", "data_workers": 0},
        "training_plan": {
            "alignment": {"epochs": 1, "probe_batch_max": 4, "lr": 1e-4},
        },
        "dataset": {"path": str(root / "data")},
        "validation": {"sample_count": 1},
    })
    mc = ModelConfig()
    mc.inter_dim = 32
    mc.style_dim = 16
    mc.text_encoder.hidden_dim = 32
    mc.text_encoder.filter_channels = 64
    mc.text_encoder.heads = 2
    mc.text_encoder.layers = 1
    return cfg, mc


def test_alignment_stage_and_resume(workdir):
    import jax
    from jax.sharding import Mesh

    from stylish_tts_tpu.trainer.checkpoint import find_latest_checkpoint
    from stylish_tts_tpu.trainer.loop import Trainer

    cfg, mc = _configs(workdir)
    out = str(workdir / "out")
    # single-device mesh: keep batch divisibility trivial on CPU tests
    mesh = Mesh(np.asarray(jax.devices()[:1]), ("data",))
    trainer = Trainer(cfg, mc, out, mesh=mesh)
    state = trainer.train("alignment")

    # artifacts: train.log, checkpoint, aligner safetensors, norm stats
    stage_dir = osp.join(out, "alignment")
    assert osp.isfile(osp.join(stage_dir, "train.log"))
    assert osp.isfile(osp.join(out, "normalization.json"))
    assert osp.isfile(str(workdir / "data" / "alignment_model.safetensors"))
    ckpt = find_latest_checkpoint(stage_dir)
    assert ckpt is not None
    assert int(state.step) > 0

    # resume from the checkpoint: state restores, counters carry
    trainer2 = Trainer(cfg, mc, out, mesh=mesh)
    state2 = trainer2.train("alignment", checkpoint=ckpt)
    assert int(state2.step) >= int(state.step)
    a = jax.tree.leaves(state.params["text_aligner"])[0]
    b = jax.tree.leaves(state2.params["text_aligner"])[0]
    assert np.asarray(a).shape == np.asarray(b).shape


def test_metrics_sync_only_on_log_interval(workdir, monkeypatch):
    """The hot loop must not host-sync metrics off the log interval.

    Round-4 wall split measured 6,435 s of per-step float() sync over
    1,134 steps through the device tunnel; the fix keeps metrics as
    device arrays in the window and drains them through the single
    conversion point _metrics_to_host exactly at log_interval
    boundaries, letting dispatch run ahead of the device."""
    import jax
    from jax.sharding import Mesh

    from stylish_tts_tpu.trainer import loop as loop_mod

    cfg, mc = _configs(workdir)
    calls = []
    real = loop_mod._metrics_to_host

    def spy(window):
        for m in window:
            for v in m.values():
                # still device-side: nothing converted it early
                assert isinstance(v, jax.Array), type(v)
        calls.append(len(window))
        return real(window)

    monkeypatch.setattr(loop_mod, "_metrics_to_host", spy)
    # the micro dataset packs into 1 batch/epoch; 4 epochs x log_interval=2
    # -> exactly 2 window drains of 2 device metric dicts each
    cfg.training_plan.get_stage("alignment").epochs = 4
    mesh = Mesh(np.asarray(jax.devices()[:1]), ("data",))
    trainer = loop_mod.Trainer(cfg, mc, str(workdir / "out_sync"), mesh=mesh)
    trainer.train("alignment")
    assert calls, "metrics window never drained through _metrics_to_host"
    # each drain happens at a log_interval boundary with exactly the
    # interval's worth of device metric dicts — never per-step
    assert all(n == cfg.training.log_interval for n in calls), calls


def test_classify_step_failure():
    """Transient compile-transport failures retry; OOM shrinks; rest raise."""
    from stylish_tts_tpu.trainer.loop import classify_step_failure

    assert classify_step_failure(
        "INTERNAL: http://127.0.0.1:8113/remote_compile: read body: "
        "response body closed before all bytes were read"
    ) == "transient"
    assert classify_step_failure("UNAVAILABLE: connection reset") == "transient"
    assert classify_step_failure(
        "RESOURCE_EXHAUSTED: Out of memory allocating 1234 bytes"
    ) == "oom"
    # OOM wins even if the message also mentions the compile service
    assert classify_step_failure(
        "remote_compile: RESOURCE_EXHAUSTED during compilation"
    ) == "oom"
    assert classify_step_failure("INVALID_ARGUMENT: shape mismatch") == "fatal"


def test_slm_cache_gated_on_stage(workdir):
    """The large slm-embedding cache loads only for acoustic runs with
    slm weight > 0 (review: alignment/textual/duration runs and
    slm-weight-0 runs must not pay host RAM + per-batch transfer)."""
    import numpy as np
    from stylish_tts_tpu.trainer.loop import Trainer

    cfg, mc = _configs(workdir)
    # drop a fake slm cache where dataset.slm_path points
    slm_path = str(workdir / "data" / cfg.dataset.slm_path)
    from stylish_tts_tpu.data.caches import save_cache

    with open(workdir / "data" / cfg.dataset.train_data,
              encoding="utf-8") as f:
        names = [line.split("|")[0] for line in f if line.strip()]
    save_cache(slm_path, {
        n: np.zeros((13, 4, 768), np.float16) for n in names
    })

    trainer = Trainer(cfg, mc, str(workdir / "out_slm"))
    assert trainer.build_dataset(cfg.dataset.train_data).slm == {}
    assert trainer.build_dataset(
        cfg.dataset.train_data, with_slm=True
    ).slm != {}
