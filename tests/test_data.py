"""Data pipeline tests on the runnable micro-dataset fixture."""

import os.path as osp

import numpy as np
import pytest

from stylish_tts_tpu.config import ModelConfig
from stylish_tts_tpu.data import (
    BatchSizeTable,
    DynamicBatchSampler,
    FilePathDataset,
    collate_batch,
    get_frame_count,
    get_time_bin,
)
from stylish_tts_tpu.data.wav import read_wav, wav_info, write_wav
from stylish_tts_tpu.ops.duration import DurationProcessor
from stylish_tts_tpu.text import TextCleaner

from fixtures import make_micro_dataset


@pytest.fixture(scope="module")
def dataset_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("micro_ds")
    return make_micro_dataset(str(root))


def test_wav_info_matches_read(dataset_root):
    path = osp.join(dataset_root, "wav-dir", "tr0.wav")
    info = wav_info(path)
    audio = read_wav(path, info.samplerate)
    assert info.frames == audio.shape[0]
    assert info.samplerate == 24000


def test_wav_resample_length():
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        path = osp.join(d, "x.wav")
        write_wav(path, np.zeros(48000, np.float32), 48000)
        audio = read_wav(path, 24000)
        assert audio.shape[0] == 24000


def test_time_bin_semantics():
    # frames = samples // hop; bin = (frames-20)//20; frame_count = bin*20+60
    assert get_time_bin(300 * 19, 300) == -1  # < 0.25*...: too short
    assert get_time_bin(300 * 20, 300) == 0
    assert get_frame_count(0) == 60
    assert get_time_bin(300 * 65, 300) == 2
    assert get_frame_count(2) == 100


def test_time_bin_quantize():
    """time_bin_quantize merges bins upward: the quantized bin's frame
    count always covers the natural bin's frames (padding stays valid)
    and N consecutive natural bins collapse onto one quantized bin."""
    for nat, q2 in [(0, 1), (1, 1), (2, 3), (3, 3), (4, 5)]:
        samples = 300 * (20 + 20 * nat)  # smallest audio in natural bin
        assert get_time_bin(samples, 300) == nat
        assert get_time_bin(samples, 300, quantize=2) == q2
        assert get_frame_count(q2) >= get_frame_count(nat)
    # quantize=3 groups {0,1,2}->2, {3,4,5}->5
    assert get_time_bin(300 * 20, 300, quantize=3) == 2
    assert get_time_bin(300 * 80, 300, quantize=3) == 5
    # too-short audio stays rejected
    assert get_time_bin(300 * 19, 300, quantize=4) == -1


def test_dataset_quantized_bins_and_cache_mismatch(tmp_path):
    """End to end through FilePathDataset + collate: a quantize=2
    dataset (caches generated at the same quantize) occupies fewer bins
    with consistent padded shapes; loading quantize=2 against
    quantize=1 caches raises the actionable mismatch error instead of
    silently misaligning center-padded frames."""
    mc = ModelConfig()
    tc = TextCleaner(mc.symbol)
    dp = DurationProcessor()

    def build(root, q):
        with open(osp.join(root, "train-list.txt")) as f:
            lines = f.readlines()
        return FilePathDataset(
            data_list=lines,
            root_path=osp.join(root, "wav-dir"),
            text_cleaner=tc,
            sample_rate=mc.sample_rate,
            coarse_hop_length=mc.hop_length,
            pitch_path=osp.join(root, "pitch.safetensors"),
            alignment_path=osp.join(root, "alignment.safetensors"),
            dur_to_class=dp.dur_to_class,
            time_bin_quantize=q,
        )

    q_root = make_micro_dataset(
        str(tmp_path / "q2"), time_bin_quantize=2
    )
    ds_q = build(q_root, 2)
    bins_q, _ = ds_q.time_bins()
    assert all(b % 2 == 1 for b in bins_q)  # group tops only
    nat_root = make_micro_dataset(str(tmp_path / "q1"))
    nat_bins, _ = build(nat_root, 1).time_bins()
    assert len(bins_q) <= len(nat_bins)
    for b, idxs in bins_q.items():
        items = [ds_q.load_segment(i) for i in idxs]
        batch, _ = collate_batch(items, hop_length=mc.hop_length)
        assert batch.audio_gt.shape[1] == get_frame_count(b) * mc.hop_length
        assert batch.pitch.shape[1] == get_frame_count(b)

    # mismatch: quantize=2 dataset over quantize=1 caches -> hard error
    ds_bad = build(nat_root, 2)
    bins_bad, _ = ds_bad.time_bins()
    some_bin = next(iter(bins_bad))
    items = [ds_bad.load_segment(i) for i in bins_bad[some_bin][:1]]
    if items[0]["pitch"].shape[0] == get_frame_count(some_bin):
        pytest.skip("fixture landed on a group-top bin; no mismatch")
    with pytest.raises(ValueError, match="time_bin_quantize"):
        collate_batch(items, hop_length=mc.hop_length)


@pytest.fixture(scope="module")
def dataset(dataset_root):
    mc = ModelConfig()
    tc = TextCleaner(mc.symbol)
    dp = DurationProcessor()
    with open(osp.join(dataset_root, "train-list.txt")) as f:
        lines = f.readlines()
    return FilePathDataset(
        data_list=lines,
        root_path=osp.join(dataset_root, "wav-dir"),
        text_cleaner=tc,
        sample_rate=mc.sample_rate,
        coarse_hop_length=mc.hop_length,
        pitch_path=osp.join(dataset_root, "pitch.safetensors"),
        alignment_path=osp.join(dataset_root, "alignment.safetensors"),
        dur_to_class=dp.dur_to_class,
    )


def test_dataset_bins_and_padding(dataset):
    bins, seconds = dataset.time_bins()
    assert len(dataset) == 6
    assert sum(len(v) for v in bins.values()) == 6
    for b, idxs in bins.items():
        for i in idxs:
            item = dataset.load_segment(i)
            frames = get_frame_count(b)
            assert item["audio"].shape[0] == frames * 300
            assert item["pitch"].shape[0] == frames
            assert item["durations"].sum() == frames


def test_duration_weights(dataset):
    w = dataset.duration_weights
    assert w.shape == (16,)
    assert np.isfinite(w).all()
    # classes present in data get positive weight
    assert w.max() > 0


def test_sampler_and_collate(dataset):
    bins, _ = dataset.time_bins()
    table = BatchSizeTable(probe_batch_max=2)
    table.plan(list(bins.keys()))
    sampler = DynamicBatchSampler(bins, table, drop_last=False, seed=1)
    n_yielded = 0
    for time_bin, idxs in sampler:
        items = [dataset.load_segment(i) for i in idxs]
        batch, paths = collate_batch(items, hop_length=300)
        assert batch.audio_gt.shape[0] == len(idxs)
        assert batch.audio_gt.shape[1] == get_frame_count(time_bin) * 300
        assert batch.text.shape[1] % 32 == 0
        assert len(paths) == len(idxs)
        n_yielded += len(idxs)
    assert n_yielded == 6


def test_batch_size_table_persist(tmp_path):
    p = str(tmp_path / "acoustic_batch_sizes.json")
    t = BatchSizeTable(path=p, probe_batch_max=16)
    t.plan([0, 2, 9, 20])
    assert t.get(9) == 16
    assert t.get(20) < t.get(2)
    t2 = BatchSizeTable(path=p)
    assert t2.sizes == t.sizes
    t2.shrink(9)
    assert t2.get(9) < 16
