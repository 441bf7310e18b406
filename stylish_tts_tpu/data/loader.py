"""Prefetching host-side data loader.

Replaces the reference's torch DataLoader worker processes
(reference: batch_manager.py:165-185, config data_workers): a
background thread pipelines [sample -> load (native C++ batch loader
when available) -> collate -> host-to-device transfer] ahead of the
training step, keeping the TPU fed.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator

from .collate import collate_batch
from .dataset import FilePathDataset

_SENTINEL = object()


class PrefetchLoader:
    def __init__(
        self,
        dataset: FilePathDataset,
        sampler,
        hop_length: int,
        *,
        require_pitch: bool = True,
        device_put=None,
        depth: int = 2,
        use_native: bool = True,
    ):
        self.dataset = dataset
        self.sampler = sampler
        self.hop_length = hop_length
        self.require_pitch = require_pitch
        self.device_put = device_put
        self.depth = depth
        self.use_native = use_native
        if use_native:
            try:
                from .. import native

                self._native = native if native.available() else None
            except Exception:
                self._native = None
        else:
            self._native = None

    def _load_items(self, idxs):
        use_native = self._native is not None and all(
            self.dataset.segments[i].time_bin != -1 for i in idxs
        )
        items = [
            self.dataset.load_segment(i, load_audio=not use_native)
            for i in idxs
        ]
        if use_native:
            # audio via the threaded C++ batch loader (metadata/caches
            # came from load_segment above)
            import os.path as osp

            from .dataset import get_frame_count

            paths = [
                osp.join(
                    self.dataset.root_path,
                    self.dataset.segments[i].wav_path,
                )
                for i in idxs
            ]
            frames = get_frame_count(self.dataset.segments[idxs[0]].time_bin)
            target_len = frames * self.dataset.coarse_hop_length
            audio = self._native.load_wav_batch(
                paths, self.dataset.sample_rate, target_len
            )
            for k, item in enumerate(items):
                item["audio"] = audio[k]
        return items

    def __iter__(self) -> Iterator:
        q: queue.Queue = queue.Queue(maxsize=self.depth)
        stop = threading.Event()

        def worker():
            try:
                for time_bin, idxs in self.sampler:
                    if stop.is_set():
                        break
                    items = self._load_items(idxs)
                    batch, paths = collate_batch(
                        items, hop_length=self.hop_length,
                        require_pitch=self.require_pitch,
                    )
                    if self.device_put is not None:
                        batch = self.device_put(batch)
                    q.put((time_bin, batch, paths))
            except Exception as exc:  # surface errors on the consumer side
                q.put(exc)
            finally:
                q.put(_SENTINEL)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is _SENTINEL:
                    break
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()
