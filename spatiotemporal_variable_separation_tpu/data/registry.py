"""Dataset dispatch (reference ``var_sep/main.py:70-102``) and training
iterators."""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np

from spatiotemporal_variable_separation_tpu.core.config import ExperimentConfig
from spatiotemporal_variable_separation_tpu.data.loader import Batcher


def make_train_dataset(cfg: ExperimentConfig, synthetic_fallback: bool = False):
    seq_len = cfg.nt_cond + cfg.nt_pred
    if cfg.data == "mnist":
        from spatiotemporal_variable_separation_tpu.data.moving_mnist import MovingMNIST

        return MovingMNIST.make_dataset(cfg.data_dir, 64, cfg.nt_cond, seq_len,
                                        4, True, cfg.n_object, train=True,
                                        seed=cfg.seed,
                                        synthetic_fallback=synthetic_fallback)
    if cfg.data == "chairs":
        from spatiotemporal_variable_separation_tpu.data.chairs import Chairs

        return Chairs(True, cfg.data_dir, cfg.nt_cond, seq_len)
    if cfg.data == "taxibj":
        from spatiotemporal_variable_separation_tpu.data.taxibj import TaxiBJ

        return TaxiBJ.make_datasets(cfg.data_dir, len_closeness=seq_len,
                                    nt_cond=cfg.nt_cond)[0]
    if cfg.data == "sst":
        from spatiotemporal_variable_separation_tpu.data.sst import SST

        ds = SST(cfg.data_dir, cfg.nt_cond, cfg.nt_pred, True, zones=cfg.zones)
        if ds.zone_size != cfg.image_size:
            raise ValueError(
                f"corpus grids are {ds.zone_size}x{ds.zone_size} but the "
                f"config expects {cfg.image_size} — pass --zone_size "
                f"{ds.zone_size}")
        return ds
    if cfg.data == "wave":
        from spatiotemporal_variable_separation_tpu.data.wave_eq import WaveEq

        return WaveEq(cfg.data_dir, cfg.nt_cond, seq_len, True, cfg.downsample)
    if cfg.data == "wave_partial":
        from spatiotemporal_variable_separation_tpu.data.wave_eq import WaveEqPartial

        return WaveEqPartial(cfg.data_dir, cfg.nt_cond, seq_len, True,
                             cfg.downsample, cfg.n_wave_points)
    raise ValueError(f"unknown dataset {cfg.data!r}")


def make_device_generator(cfg: ExperimentConfig, mesh=None,
                          synthetic_fallback: bool = False):
    """On-device batch generator for datasets that support it, else None.

    With a mesh, generated batches come out already sharded over the data
    axis (no host round-trip, no resharding)."""
    supported = ("mnist", "wave", "wave_partial", "taxibj", "sst", "chairs")
    if not cfg.device_datagen or cfg.data not in supported:
        return None
    if cfg.data in ("taxibj", "sst", "chairs"):
        # file-backed corpora small enough to live in HBM: load + normalize
        # on the host once, then gather batches inside the fused step.
        from spatiotemporal_variable_separation_tpu.data.device_corpora import (
            DeviceChairs,
            DeviceItems,
            DeviceZoneWindows,
        )

        try:
            host = make_train_dataset(cfg)
        except (FileNotFoundError, OSError):
            return None
        if cfg.data == "taxibj":
            return DeviceItems(host.data, cfg.nt_cond)
        if cfg.data == "sst":
            return DeviceZoneWindows(host)
        return DeviceChairs(host)
    if cfg.data == "mnist":
        from spatiotemporal_variable_separation_tpu.data.mnist_device import (
            DeviceMovingMNIST,
        )

        try:
            gen = DeviceMovingMNIST.from_data_dir(
                cfg.data_dir, cfg.nt_cond, cfg.nt_cond + cfg.nt_pred,
                cfg.n_object, synthetic_fallback=synthetic_fallback)
        except FileNotFoundError:
            return None
    else:
        from spatiotemporal_variable_separation_tpu.data.wave_device import (
            DeviceWaveEq,
        )

        try:
            host = make_train_dataset(cfg)
        except (FileNotFoundError, OSError):
            return None
        if cfg.data == "wave":
            gen = DeviceWaveEq.from_host_dataset(host)
        else:
            # partial observations: pre-apply the fixed pixel subsampling.
            import numpy as _np

            sub = host.data[:, :, host.rand_w, host.rand_h, :]
            gen = DeviceWaveEq(_np.ascontiguousarray(sub), host.nt_cond,
                               host.seq_len)
    # note: with the fused datagen+train step (train/step.py) the generator's
    # sampling runs inside the sharded step itself, so no resharding of
    # standalone generation is needed here.
    del mesh
    return gen


def steps_per_epoch(cfg: ExperimentConfig, dataset) -> int:
    if cfg.steps_per_epoch is not None:
        return cfg.steps_per_epoch
    return max(1, len(dataset) // cfg.batch_size)


def epoch_iterator(cfg: ExperimentConfig, dataset, epoch: int) -> Iterator:
    """Yield (cond, target) numpy batches for one epoch (exactly
    ``steps_per_epoch(cfg, dataset)`` of them, so an explicit
    --steps_per_epoch override, the LR schedule, and resume accounting all
    agree).

    Datasets with a vectorized ``generate_batch`` (Moving MNIST) use it with
    a background prefetch thread; map-style datasets go through the
    shuffled Batcher."""
    from spatiotemporal_variable_separation_tpu.data.loader import background_iter

    n_steps = steps_per_epoch(cfg, dataset)
    if hasattr(dataset, "generate_batch"):
        nt_cond = cfg.nt_cond
        if hasattr(dataset, "rng"):
            # Re-seed the stream per (seed, epoch): generate_batch datasets
            # are otherwise stateful across epochs, so a mid-epoch resume's
            # skip-replay (train/loop.py) would train on different
            # (distributionally identical) batches than the interrupted
            # process did.  With a per-epoch seed the replay is exact on
            # this path too, matching the map-style Batcher below.
            dataset.rng = np.random.RandomState(
                (cfg.seed * 1_000_003 + epoch) % 2**32)

        def gen():
            for _ in range(n_steps):
                batch = dataset.generate_batch(cfg.batch_size)
                yield batch[:, :nt_cond], batch[:, nt_cond:]

        if cfg.num_workers <= 0:
            yield from gen()
        else:
            yield from background_iter(gen(), max(2, cfg.num_workers))
    else:
        # max_batches bounds the producer itself (no orphaned background
        # thread blocked on a bounded queue when an epoch is truncated).
        batcher = Batcher(dataset, cfg.batch_size, shuffle=True,
                          seed=cfg.seed + epoch, drop_last=True,
                          num_workers=cfg.num_workers, max_batches=n_steps)
        if len(batcher) < n_steps:
            raise ValueError(
                f"dataset provides only {len(batcher)} full batches per epoch "
                f"(size {len(dataset)}, batch {cfg.batch_size}) but "
                f"steps_per_epoch={n_steps}; reduce --batch_size or "
                f"--steps_per_epoch")
        yield from batcher
