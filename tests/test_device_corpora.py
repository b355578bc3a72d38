"""Device-resident TaxiBJ/SST/Chairs generators: window index math is
validated by encoding (source, time) into frame values and asserting every
sampled window is a contiguous, in-range view of the right source."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spatiotemporal_variable_separation_tpu.data.device_corpora import (
    DeviceChairs,
    DeviceItems,
    DeviceZoneWindows,
)


def test_device_items_returns_exact_rows():
    items = (np.arange(20)[:, None, None, None, None]
             + np.zeros((20, 8, 4, 4, 2))).astype(np.float32)
    gen = DeviceItems(items, nt_cond=4)
    assert len(gen) == 20
    cond, target = gen.generate_device_batch(jax.random.PRNGKey(0), 16)
    assert cond.shape == (16, 4, 4, 4, 2) and target.shape == (16, 4, 4, 4, 2)
    # every sampled item is bitwise one of the corpus rows
    got = np.asarray(jnp.concatenate([cond, target], axis=1))
    ids = got[:, 0, 0, 0, 0]
    np.testing.assert_array_equal(got, items[ids.astype(int)])


class _FakeSST:
    def __init__(self, n_zones=3, T=120, lb=4, pred_h=6, train=True):
        self.zones = list(range(1, n_zones + 1))
        # value encodes zone*1000 + time; host zone arrays are (T, H, W)
        self.data = {z: (z * 1000.0 + np.arange(T))[:, None, None]
                     * np.ones((T, 8, 8), np.float32) for z in self.zones}
        self.lb, self.pred_h = lb, pred_h
        self.first = 0 if train else int(0.8 * T)
        len_ = (int(0.8 * T) if train else T - int(0.8 * T))
        self.len_ = len_ - pred_h - lb - 1


@pytest.mark.parametrize("train", [True, False])
def test_device_zone_windows_match_host_index_math(train):
    host = _FakeSST(train=train)
    gen = DeviceZoneWindows(host)
    assert len(gen) == 3 * host.len_
    cond, target = gen.generate_device_batch(jax.random.PRNGKey(1), 64)
    w = np.asarray(jnp.concatenate([cond, target], axis=1))[:, :, 0, 0, 0]
    zone = np.round(w[:, 0] / 1000).astype(int)
    t0 = w[:, 0] - zone * 1000
    # contiguous time, constant zone
    np.testing.assert_array_equal(w, (zone[:, None] * 1000 + t0[:, None]
                                      + np.arange(w.shape[1])[None]))
    # starts cover exactly the host-reachable window range:
    # idx_id = k + lb + 1 + first, start = idx_id - lb + 1
    lo = host.first + 2
    hi = host.first + 2 + host.len_ - 1
    assert t0.min() >= lo and t0.max() <= hi
    # ends stay inside the split the host would read
    assert (t0 + w.shape[1] - 1).max() <= host.first + host.len_ + 1 + host.lb + host.pred_h


def test_device_chairs_wraparound(tmp_path):
    from spatiotemporal_variable_separation_tpu.data import synthetic_corpora as sc
    from spatiotemporal_variable_separation_tpu.data.chairs import Chairs

    sc.make_chairs(str(tmp_path), n_objects=5)
    host = Chairs(True, str(tmp_path), nt_cond=3, seq_len=15)
    gen = DeviceChairs(host)
    assert gen.n_objects == host.stop_idx - host.start_idx
    assert len(gen) == gen.n_objects * 62
    cond, target = gen.generate_device_batch(jax.random.PRNGKey(2), 8)
    assert cond.shape == (8, 3, 64, 64, 3) and target.shape == (8, 12, 64, 64, 3)
    video = np.asarray(jnp.concatenate([cond, target], axis=1))
    assert 0.0 <= video.min() and video.max() <= 1.0
    # each sampled window must be a consecutive mod-62 view run of one
    # object: check against the host's own (object, view) frames
    corpus = gen.data.astype(np.float32) / 255.0  # (n_obj, 62, H, W, 3)
    for b in range(8):
        # locate frame 0 in the corpus (symmetric views can alias a single
        # frame, so accept ANY (obj, start) whose full window matches)
        hits = np.argwhere((np.abs(corpus - video[b, 0]).reshape(
            gen.n_objects, 62, -1).max(-1)) < 1e-6)
        assert len(hits) >= 1
        assert any(
            np.allclose(video[b], corpus[obj, (st + np.arange(15)) % 62],
                        atol=1e-6)
            for obj, st in hits), f"batch row {b} is not a mod-62 view run"


def test_registry_builds_device_generators(tmp_path):
    from spatiotemporal_variable_separation_tpu.core.config import ExperimentConfig
    from spatiotemporal_variable_separation_tpu.data import synthetic_corpora as sc
    from spatiotemporal_variable_separation_tpu.data.registry import (
        make_device_generator,
    )

    sc.make_taxibj(str(tmp_path), days_per_year=12)
    cfg = ExperimentConfig(data="taxibj", architecture="vgg", nt_cond=4,
                           nt_pred=4, offset=4, precision="f32",
                           data_dir=str(tmp_path))
    gen = make_device_generator(cfg)
    assert gen is not None and len(gen) > 0
    cond, target = gen.generate_device_batch(jax.random.PRNGKey(0), 4)
    assert cond.shape == (4, 4, 32, 32, 2)
