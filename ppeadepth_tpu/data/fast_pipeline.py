"""Fast TPU-native input pipeline: native C++ decode on the host,
everything else (jitter, flip, pyramid, intrinsics) on device.

Host per batch:  decode+resize the B x |frames| JPEGs with the threaded
                 C++ core -> u8 [B, H, W, 3] per frame + normalised K.
Device (jit):    `prepare_batch` -> the standard training batch dict
                 (data/augment.py), fused into the step by XLA.

This replaces the reference's CPU-heavy per-item pipeline (LANCZOS
pyramid + PIL jitter in 12 worker processes, mono_dataset.py:89-190) with
a decode-only host stage — the host stops being the bottleneck and the
augmented pyramid never round-trips through host memory.
"""

from __future__ import annotations

import concurrent.futures as cf
from typing import Dict, List, Sequence

import numpy as np

from . import native_loader as NL
from .mono_dataset import MonoDataset


class FastDecodePipeline:
    """Wraps any MonoDataset subclass that exposes get_image_path()
    (KITTI-style layouts) and decodes whole batches natively.

    Yields (frames: {f: u8 [B, H, W, 3]}, K_full: [B, 4, 4] normalised).
    Missing neighbor frames decode to zeros (the blank-frame protocol is
    preserved end-to-end: zeros -> zero pose -> cost-volume skip).
    """

    def __init__(
        self,
        dataset: MonoDataset,
        batch_size: int,
        frame_idxs: Sequence[int] = (0, -1, 1),
        shuffle: bool = True,
        n_threads: int = 16,
        drop_last: bool = True,
        seed: int = 0,
        cache_dir: str = "",
    ):
        assert NL.available(), "native loader unavailable"
        self.ds = dataset
        self.batch_size = batch_size
        self.frame_idxs = list(frame_idxs)
        self.shuffle = shuffle
        self.n_threads = n_threads
        self.drop_last = drop_last
        self.seed = seed
        self.epoch = 0
        # persistent decode pool: round-4 e2e showed multi-second stall
        # windows at every epoch restart from tearing down / re-warming
        # the executor per __iter__; keep one pool for the loader's life
        # and preload the next epoch's first batches across the boundary
        self._pool = cf.ThreadPoolExecutor(2)
        self._preload = {}  # epoch -> (chunk_iter, [futures])
        # decoded-raw cache (--decode_cache): decode each image once,
        # serve repeats from a memory-mapped u8 array (data/decode_cache)
        self.cache = None
        if cache_dir:
            from .decode_cache import DecodeCache

            all_paths = []
            for idx in range(len(dataset)):
                folder, fi, side = dataset.index_to_folder_and_frame_idx(idx)
                for f in self.frame_idxs:
                    all_paths.append(
                        dataset.get_image_path(folder, fi + f, side))
            self.cache = DecodeCache(cache_dir, all_paths,
                                     dataset.height, dataset.width)

    def __len__(self):
        n = len(self.ds)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def _paths_and_K(self, indices: List[int]):
        paths = {f: [] for f in self.frame_idxs}
        Ks = []
        for idx in indices:
            folder, frame_index, side = (
                self.ds.index_to_folder_and_frame_idx(idx)
            )
            for f in self.frame_idxs:
                paths[f].append(
                    self.ds.get_image_path(folder, frame_index + f, side)
                )
            Ks.append(self.ds.load_intrinsics(folder, frame_index))
        return paths, np.stack(Ks)

    def _epoch_chunks(self, epoch: int):
        n = len(self.ds)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.RandomState(self.seed * 9973 + epoch)
            rng.shuffle(order)
        if self.drop_last:
            order = order[: (n // self.batch_size) * self.batch_size]
        return [
            order[i: i + self.batch_size]
            for i in range(0, len(order), self.batch_size)
        ]

    def _make(self, indices):
        H, W = self.ds.height, self.ds.width
        paths, K = self._paths_and_K(list(indices))
        if self.cache is not None:
            frames = {
                f: self.cache.get_batch(p, self.n_threads)
                for f, p in paths.items()
            }
        else:
            frames = {
                f: NL.decode_resize_batch(p, W, H, self.n_threads)
                for f, p in paths.items()
            }
        return frames, K

    def __iter__(self):
        pool = self._pool
        if self.epoch in self._preload:
            # first batches were submitted while the PREVIOUS epoch's
            # last step was still on the device — no restart stall
            it, pending = self._preload.pop(self.epoch)
        else:
            it = iter(self._epoch_chunks(self.epoch))
            pending = []
            for _ in range(2):
                try:
                    pending.append(pool.submit(self._make, next(it)))
                except StopIteration:
                    break
        while pending:
            fut = pending.pop(0)
            try:
                pending.append(pool.submit(self._make, next(it)))
            except StopIteration:
                if not pending:
                    # warm the next epoch across the restart boundary
                    nxt = self.epoch + 1
                    nit = iter(self._epoch_chunks(nxt))
                    npend = []
                    for _ in range(2):
                        try:
                            npend.append(
                                pool.submit(self._make, next(nit)))
                        except StopIteration:
                            break
                    self._preload = {nxt: (nit, npend)}
            yield fut.result()


def prepare_batch(frames_u8: Dict, K_full, rng, height: int, width: int,
                  num_scales: int = 4, color_scales=None):
    """Device-side: u8 frames -> the standard augmented batch dict.
    jit-compatible; fold into the train step for zero host work.
    color_scales=1 skips the unused multi-scale image pyramids (the
    training step reads only scale-0 colors; see augment_batch)."""
    import jax.numpy as jnp

    from .augment import augment_batch

    frames = {
        f: v.astype(jnp.float32) / 255.0 for f, v in frames_u8.items()
    }
    return augment_batch(frames, K_full, rng, height, width, num_scales,
                         color_scales)
