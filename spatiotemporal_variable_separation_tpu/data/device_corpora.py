"""Device-resident training pipelines for the file-backed datasets.

Every corpus in this project fits comfortably in HBM once normalized
(TaxiBJ ~1.4 GB, SST ~0.8 GB, Chairs uint8 ~0.15-1 GB), so instead of
assembling batches on the host and shipping ~190 MB per step through the
host link, the corpus is uploaded ONCE and batches are gathered inside the
fused datagen+train step (train/step.py:make_fused_datagen_step) — the
same design as DeviceWaveEq/DeviceMovingMNIST.

All gathers use the flat large-row formulation (one jnp.take whose rows
are whole frames — see data/wave_device.py for why: a vmapped
dynamic_slice lowers to a degenerate TPU gather at ~3% of HBM bandwidth).

Sampling is uniform with replacement over the same (item) space the host
datasets enumerate — the established device-datagen semantics (mnist/wave
precedent, distributionally equivalent to the reference's shuffled
DataLoader epochs).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp


class _DeviceGenBase:
    """Common device-batch plumbing (mirrors DeviceWaveEq's surface)."""

    def __init__(self, data: np.ndarray, nt_cond: int, seq_len: int):
        self.data = data
        self.nt_cond = nt_cond
        self.seq_len = seq_len
        self._device_data = None
        self._jitted = None  # built lazily: subclass attrs may not exist yet

    def _corpus(self) -> jnp.ndarray:
        if self._device_data is None:
            self._device_data = jnp.asarray(self.data)
        return self._device_data

    def generate_device_batch(self, rng: jax.Array, batch: int
                              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        if self._jitted is None:
            self._jitted = jax.jit(self.make_sample_fn(),
                                   static_argnames=("batch",))
        w = self._jitted(self._corpus(), rng, batch)
        return w[:, : self.nt_cond], w[:, self.nt_cond:]


class DeviceItems(_DeviceGenBase):
    """Uniform sampler over precomputed (N, T, ...) items — TaxiBJ, whose
    closeness sequences are already materialized by ``STMatrix`` (see
    ``data/taxibj.py``; reference ``var_sep/data/taxibj.py:244-247``)."""

    def __init__(self, items: np.ndarray, nt_cond: int):
        super().__init__(np.asarray(items, np.float32), nt_cond,
                         items.shape[1])
        self.n_items = items.shape[0]

    def __len__(self) -> int:
        return self.n_items

    def make_sample_fn(self):
        n_items = self.data.shape[0]

        def sample(data, rng, batch):
            idx = jax.random.randint(rng, (batch,), 0, n_items)
            return jnp.take(data, idx, axis=0)

        return sample


class DeviceZoneWindows(_DeviceGenBase):
    """Uniform (zone, window) sampler over equal-length zone series — SST.

    Mirrors the host index math exactly (``data/sst.py.__getitem__``;
    reference ``var_sep/data/sst.py:81-89``): window start =
    ``k + 2`` frames into the split for k ~ U[0, len_), covering the same
    frame set the host train split enumerates."""

    def __init__(self, sst_host):
        zones = sst_host.zones
        # host zone arrays are (T, H, W); items add the channel axis
        stacked = np.stack([sst_host.data[z] for z in zones])[..., None]
        super().__init__(stacked, sst_host.lb, sst_host.lb + sst_host.pred_h)
        self.len_ = sst_host.len_
        self.first = sst_host.first
        self.n_zones = len(zones)

    def __len__(self) -> int:
        return self.n_zones * self.len_

    def make_sample_fn(self):
        n_zones, len_, first = self.n_zones, self.len_, self.first
        lb, seq_len = self.nt_cond, self.seq_len

        def sample(data, rng, batch):
            kz, kw = jax.random.split(rng)
            T = data.shape[1]
            flat = data.reshape((n_zones * T,) + data.shape[2:])
            zone = jax.random.randint(kz, (batch,), 0, n_zones)
            k = jax.random.randint(kw, (batch,), 0, len_)
            start = k + first + 2  # idx_id - lb + 1 with idx_id = k+lb+1+first
            fidx = (zone * T + start)[:, None] + jnp.arange(seq_len)[None, :]
            return jnp.take(flat, fidx, axis=0)

        return sample


class DeviceChairs(_DeviceGenBase):
    """Uniform (object, start-view) sampler with mod-62 wraparound —
    Chairs (reference ``var_sep/data/chairs.py:45-60``).  The corpus stays
    uint8 in HBM (~3 MB/object); normalization to [0,1] happens in the
    gathered batch."""

    n_views = 62

    def __init__(self, chairs_host):
        import os

        from PIL import Image

        objs = chairs_host.sequences[chairs_host.start_idx:chairs_host.stop_idx]
        frames = None
        for i, obj in enumerate(objs):
            for v in range(self.n_views):
                img = np.asarray(Image.open(os.path.join(
                    chairs_host.data_root, obj, "renders",
                    f"{v}.png")))[..., :3]
                if frames is None:
                    frames = np.empty((len(objs), self.n_views) + img.shape,
                                      np.uint8)
                frames[i, v] = img
        super().__init__(frames, chairs_host.nt_cond, chairs_host.seq_len)
        self.n_objects = len(objs)

    def __len__(self) -> int:
        return self.n_objects * self.n_views

    def make_sample_fn(self):
        n_obj, n_views = self.n_objects, self.n_views
        seq_len = self.seq_len

        def sample(data, rng, batch):
            ko, ks = jax.random.split(rng)
            flat = data.reshape((n_obj * n_views,) + data.shape[2:])
            obj = jax.random.randint(ko, (batch,), 0, n_obj)
            st = jax.random.randint(ks, (batch,), 0, n_views)
            views = jnp.mod(st[:, None] + jnp.arange(seq_len)[None, :], n_views)
            fidx = obj[:, None] * n_views + views
            return jnp.take(flat, fidx, axis=0).astype(jnp.float32) / 255.0

        return sample
