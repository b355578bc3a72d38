"""3D Warehouse Chairs dataset (reference ``var_sep/data/chairs.py``).

Reads ``rendered_chairs/<obj>/renders/{i}.png`` sequences (64x64 crops
produced by the preprocessing CLI), RandomState(42)-shuffles the object
list, splits 85/15 train/test, and serves ``seq_len`` consecutive views
with wraparound modulo 62 (``chairs.py:45-60``).  Items are
(cond, target) float32 in (T, H, W, 3), values in [0, 1]."""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np


class Chairs:
    max_length = 62

    def __init__(self, train: bool, data_root: str, nt_cond: int,
                 seq_len: int = 15, image_size: int = 64,
                 cache_frames=False):
        assert seq_len <= self.max_length
        assert image_size == 64
        self.train = train
        self.nt_cond = nt_cond
        self.seq_len = seq_len
        self.image_size = image_size
        # Decoded-PNG cache: consecutive dataset indices cycle over OBJECTS
        # (index % n_objects picks the chair), so each render is re-decoded
        # ~seq_len times over a full pass — the dominant cost of the
        # disentanglement eval.  Opt-in and unbounded: cache only splits
        # that fit (the 15% test split is ~160 MB of uint8 frames).  Pass a
        # dict to share one cache between datasets over the same files.
        if isinstance(cache_frames, dict):
            self._frame_cache: Optional[dict] = cache_frames
        else:
            self._frame_cache = {} if cache_frames else None
        self.data_root = os.path.join(data_root, "rendered_chairs")
        sequences = sorted(os.listdir(self.data_root))
        if "all_chair_names.mat" in sequences:
            sequences.remove("all_chair_names.mat")
        rng = np.random.RandomState(42)
        rng.shuffle(sequences)
        self.sequences = sequences
        split = int(len(sequences) * 0.85)
        self.start_idx, self.stop_idx = (0, split) if train else (split, len(sequences))

    def __len__(self) -> int:
        return self.max_length * (self.stop_idx - self.start_idx)

    def get_sequence(self, index: int, chosen_idx: Optional[int] = None,
                     chosen_id_st: Optional[int] = None) -> np.ndarray:
        from PIL import Image

        index, idx = divmod(index, self.stop_idx - self.start_idx)
        if chosen_idx is not None:
            idx = chosen_idx
        obj_dir = self.sequences[self.start_idx + idx]
        index, id_st = divmod(index, self.max_length)
        if chosen_id_st is not None:
            id_st = chosen_id_st
        assert index == 0

        def decode(i):
            fname = os.path.join(self.data_root, obj_dir, "renders",
                                 f"{i}.png")
            # contiguous copy: the [..., :3] view would otherwise pin the
            # full RGBA buffer in the cache and stack from strided memory.
            return np.ascontiguousarray(np.asarray(Image.open(fname))[..., :3])

        frames = []
        for i in range(id_st, id_st + self.seq_len):
            i %= self.max_length
            if self._frame_cache is not None:
                frame = self._frame_cache.get((obj_dir, i))
                if frame is None:
                    frame = self._frame_cache[(obj_dir, i)] = decode(i)
            else:
                frame = decode(i)
            frames.append(frame)
        return np.asarray(frames)

    def __getitem__(self, index: int) -> Tuple[np.ndarray, np.ndarray]:
        seq = self.get_sequence(index).astype(np.float32) / 255.0  # (T,H,W,3)
        return seq[: self.nt_cond], seq[self.nt_cond:]


def _is_generated_name(name: str) -> bool:
    stem, ext = os.path.splitext(name)
    return ext == ".png" and stem.isdigit()


def preprocess_chairs(data_dir: str, image_size: int = 64) -> None:
    """Crop (100,100,500,500) and LANCZOS-resize every render in place as
    ``{i}.png`` (reference ``preprocessing/chairs/gen_chairs.py:23-33``).

    Unlike the reference, a second run is harmless: previously generated
    numeric ``{i}.png`` outputs are excluded from the inputs (the reference
    re-crops its own 64x64 outputs into black frames)."""
    from PIL import Image

    root = os.path.join(data_dir, "rendered_chairs")
    folders = [f for f in os.listdir(root) if f != "all_chair_names.mat"]
    for folder in folders:
        renders = os.path.join(root, folder, "renders")
        sources = [f for f in sorted(os.listdir(renders))
                   if not _is_generated_name(f)]
        for i, image_file in enumerate(sources):
            img = Image.open(os.path.join(renders, image_file))
            img = img.crop((100, 100, 500, 500)).resize(
                (image_size, image_size), resample=Image.LANCZOS)
            img.save(os.path.join(renders, f"{i}.png"))
