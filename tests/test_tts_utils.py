"""Loudness, voicepack static pack, native loader, prefetch loader."""

import os.path as osp

import numpy as np
import pytest

from fixtures import make_micro_dataset


def test_integrated_loudness_gain_invariance():
    from stylish_tts_tpu.tts.loudness import (
        integrated_loudness,
        normalize_loudness,
    )

    sr = 24000
    rng = np.random.default_rng(0)
    t = np.arange(sr * 2) / sr
    audio = (0.1 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    l1 = integrated_loudness(audio, sr)
    l2 = integrated_loudness(audio * 2, sr)
    # doubling amplitude = +6.02 dB
    assert abs((l2 - l1) - 6.02) < 0.1
    normed = normalize_loudness(audio, sr, target_lufs=-25.0)
    assert abs(integrated_loudness(normed, sr) + 25.0) < 0.5


def test_static_voicepack_build_and_lookup():
    from stylish_tts_tpu.tts.voicepack import (
        build_static_pack,
        lookup_static_style,
    )

    rng = np.random.default_rng(0)
    n = 50
    styles = {
        "speech": rng.standard_normal((n, 8)).astype(np.float32),
        "pe": rng.standard_normal((n, 8)).astype(np.float32),
        "duration": rng.standard_normal((n, 8)).astype(np.float32),
        "lengths": rng.integers(5, 60, n).astype(np.int32),
    }
    pack = build_static_pack(styles)
    assert pack["speech"].shape == (512, 8)
    assert np.isfinite(pack["speech"]).all()
    s, p, d = lookup_static_style(pack, 30)
    assert s.shape == (8,)
    # out-of-range token count clamps to last row
    s2, _, _ = lookup_static_style(pack, 100000)
    np.testing.assert_array_equal(s2, pack["speech"][511])


def test_native_loader_parity(tmp_path):
    native = pytest.importorskip("stylish_tts_tpu.native")
    if not native.available():
        pytest.skip("no native toolchain")
    from stylish_tts_tpu.data.wav import read_wav

    make_micro_dataset(str(tmp_path), n_train=3, with_caches=False)
    paths = [str(tmp_path / "wav-dir" / f"tr{i}.wav") for i in range(3)]
    target = 60000
    batch = native.load_wav_batch(paths, 24000, target)
    for i, p in enumerate(paths):
        ref = read_wav(p, 24000)
        pad = (target - ref.shape[0]) // 2
        np.testing.assert_allclose(
            batch[i, pad : pad + ref.shape[0]], ref, atol=1e-6
        )


def test_prefetch_loader_yields_all(tmp_path):
    from stylish_tts_tpu.config import ModelConfig
    from stylish_tts_tpu.data import (
        BatchSizeTable,
        DynamicBatchSampler,
        FilePathDataset,
    )
    from stylish_tts_tpu.data.loader import PrefetchLoader
    from stylish_tts_tpu.text import TextCleaner

    make_micro_dataset(str(tmp_path))
    mc = ModelConfig()
    with open(tmp_path / "train-list.txt") as f:
        lines = f.readlines()
    ds = FilePathDataset(
        data_list=lines, root_path=str(tmp_path / "wav-dir"),
        text_cleaner=TextCleaner(mc.symbol), sample_rate=mc.sample_rate,
        coarse_hop_length=mc.hop_length,
        pitch_path=str(tmp_path / "pitch.safetensors"),
        alignment_path=str(tmp_path / "alignment.safetensors"),
    )
    bins, _ = ds.time_bins()
    table = BatchSizeTable(probe_batch_max=2)
    table.plan(list(bins.keys()))
    sampler = DynamicBatchSampler(bins, table, drop_last=False)
    loader = PrefetchLoader(ds, sampler, mc.hop_length)
    total = 0
    for time_bin, batch, paths in loader:
        assert batch.audio_gt.ndim == 2
        assert np.abs(batch.audio_gt).max() > 0
        total += len(paths)
    assert total == 6


def test_dynamic_voicepack_roundtrip(tmp_path):
    from stylish_tts_tpu.textproc.embed import get_embedder
    from stylish_tts_tpu.tts.voicepack import (
        build_dynamic_pack,
        load_voicepack,
        lookup_dynamic_style,
        save_dynamic_voicepack,
    )

    rng = np.random.default_rng(0)
    n = 20
    styles = {
        "speech": rng.standard_normal((n, 8)).astype(np.float32),
        "pe": rng.standard_normal((n, 8)).astype(np.float32),
        "duration": rng.standard_normal((n, 8)).astype(np.float32),
        "lengths": rng.integers(5, 60, n).astype(np.int32),
    }
    texts = [f"sentence number {i} about topic {i % 3}" for i in range(n)]
    embed = get_embedder()
    pack = build_dynamic_pack(styles, texts, embed)
    p = str(tmp_path / "dyn.safetensors")
    save_dynamic_voicepack(p, pack)
    loaded = load_voicepack(p)
    assert loaded["kind"] == "dynamic"
    q = embed(["sentence number 3 about topic 0"])[0]
    s, pe, d = lookup_dynamic_style(loaded, q, k=4)
    assert s.shape == (8,) and np.isfinite(s).all()
    # the query's own sentence should dominate the blend:
    # its style is the single nearest neighbor
    sims = (loaded["embedding"] / np.linalg.norm(loaded["embedding"], axis=1,
            keepdims=True)) @ (q / np.linalg.norm(q))
    assert sims.argmax() == 3
