"""WaveEq simulator and dataset tests (golden-checked against an
independent RK4 implementation)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spatiotemporal_variable_separation_tpu.data.wave_eq import (
    WaveEq,
    WaveEqPartial,
    circle_mask,
    generate_dataset,
    generate_pixels,
    laplacian,
    simulate_wave,
)


def _np_lap5(w):
    out = np.zeros_like(w)
    c2, c1, c0 = -1 / 12, 4 / 3, -5 / 2
    out[:, 2:-2] += (c2 * w[:, 4:] + c1 * w[:, 3:-1] + c0 * w[:, 2:-2]
                     + c1 * w[:, 1:-3] + c2 * w[:, :-4])
    out[2:-2, :] += (c2 * w[4:, :] + c1 * w[3:-1, :] + c0 * w[2:-2, :]
                     + c1 * w[1:-3, :] + c2 * w[:-4, :])
    return out


def test_laplacian_matches_independent_stencil():
    w = np.random.default_rng(0).random((64, 64)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(laplacian(jnp.asarray(w), 5)),
                               _np_lap5(w), atol=1e-5)


def test_laplacian_order3_boundaries_zero():
    w = jnp.asarray(np.random.default_rng(0).random((16, 16)), jnp.float32)
    lap = np.asarray(laplacian(w, 3))
    # corners receive no contribution from either axis stencil
    assert lap[0, 0] == 0 and lap[-1, -1] == 0


def test_circle_mask_matches_reference_semantics():
    m = np.asarray(circle_mask(64, (32, 32), 5))
    jj, ii = np.meshgrid(range(64), range(64))
    ref = (((jj - 32) ** 2 + (ii - 32) ** 2) < 25).astype(np.float32)
    np.testing.assert_array_equal(m, ref)


def _np_sim(c, f0, seq_len, tableau, dt=1e-3):
    jj, ii = np.meshgrid(range(64), range(64))
    mask = (((jj - 32) ** 2 + (ii - 32) ** 2) < 25).astype(np.float64)

    def f(t, y):
        w, wd = y
        return wd, c * c * _np_lap5(w) + f0 * np.exp(-20 * t) * mask

    w = np.zeros((64, 64))
    wd = np.zeros((64, 64))
    frames = [w.copy()]
    for s in range(seq_len - 1):
        t = s * dt
        k1 = f(t, (w, wd))
        if tableau == "classic":
            k2 = f(t + dt / 2, (w + dt / 2 * k1[0], wd + dt / 2 * k1[1]))
            k3 = f(t + dt / 2, (w + dt / 2 * k2[0], wd + dt / 2 * k2[1]))
            k4 = f(t + dt, (w + dt * k3[0], wd + dt * k3[1]))
            w = w + dt / 6 * (k1[0] + 2 * k2[0] + 2 * k3[0] + k4[0])
            wd = wd + dt / 6 * (k1[1] + 2 * k2[1] + 2 * k3[1] + k4[1])
        else:  # 3/8-rule (torchdiffeq 'rk4')
            k2 = f(t + dt / 3, (w + dt / 3 * k1[0], wd + dt / 3 * k1[1]))
            k3 = f(t + 2 * dt / 3, (w + dt * (k2[0] - k1[0] / 3),
                                    wd + dt * (k2[1] - k1[1] / 3)))
            k4 = f(t + dt, (w + dt * (k1[0] - k2[0] + k3[0]),
                            wd + dt * (k1[1] - k2[1] + k3[1])))
            w = w + dt / 8 * (k1[0] + 3 * k2[0] + 3 * k3[0] + k4[0])
            wd = wd + dt / 8 * (k1[1] + 3 * k2[1] + 3 * k3[1] + k4[1])
        frames.append(w.copy())
    return np.asarray(frames)


@pytest.mark.parametrize("tableau", ["38", "classic"])
def test_simulator_matches_independent_rk4(tableau):
    ref = _np_sim(350.0, 10.0, 15, tableau)
    ours = np.asarray(simulate_wave(jnp.float32(350.0), jnp.float32(10.0),
                                    seq_len=15, tableau=tableau))
    assert np.abs(ref - ours).max() < 1e-8


def test_tableaus_differ():
    # sanity: the two tableaus produce different datasets (bitwise parity
    # with the reference requires the 3/8 default).
    a = np.asarray(simulate_wave(jnp.float32(350.0), jnp.float32(10.0),
                                 seq_len=15, tableau="38"))
    b = np.asarray(simulate_wave(jnp.float32(350.0), jnp.float32(10.0),
                                 seq_len=15, tableau="classic"))
    assert np.abs(a - b).max() > 0


def test_generate_and_load_dataset(tmp_path):
    generate_dataset(str(tmp_path), size=5, seq_len=24, batch=5)
    generate_pixels(str(tmp_path), number=10)
    train = WaveEq(str(tmp_path), nt_cond=3, seq_len=8, train=True, downsample=2)
    test = WaveEq(str(tmp_path), nt_cond=3, seq_len=8, train=False, downsample=2)
    # 5 files -> 4 train / 1 test by index (80% split).
    assert train.data.shape[0] == 4 and test.data.shape[0] == 1
    assert train.nt == 12  # 24 downsampled by 2
    assert len(train) == 4 * (12 - 8 + 1)
    cond, target = train[0]
    assert cond.shape == (3, 64, 64, 1) and target.shape == (5, 64, 64, 1)
    # per-sequence min-max normalization
    assert train.data.min() >= 0.0 and train.data.max() <= 1.0

    part = WaveEqPartial(str(tmp_path), nt_cond=3, seq_len=8, train=True,
                         downsample=2, n_pixels=10)
    c, t = part[3]
    assert c.shape == (3, 10, 1) and t.shape == (5, 10, 1)


def test_generate_pt_format_reference_interchange(tmp_path):
    """fmt='pt' writes the reference generator's exact torch-pickle layout
    (``gen_wave.py:138``): same numbers as npz (same seed), loadable by
    torch and by this framework's WaveEq loader alike."""
    torch = pytest.importorskip("torch")
    npz_dir = tmp_path / "npz"
    pt_dir = tmp_path / "pt"
    generate_dataset(str(npz_dir), size=3, seq_len=12, batch=3)
    generate_dataset(str(pt_dir), size=3, seq_len=12, batch=3, fmt="pt")
    names = sorted(os.listdir(pt_dir / "data"))
    assert names == [f"homogenous_wave{i}.pt" for i in range(3)]
    for i in range(3):
        ref = np.load(str(npz_dir / "data" / f"homogenous_wave{i}.npz"))
        d = torch.load(str(pt_dir / "data" / f"homogenous_wave{i}.pt"),
                       map_location="cpu", weights_only=True)
        assert isinstance(d["c"], float) and d["c"] == float(ref["c"])
        np.testing.assert_array_equal(d["simul"].numpy(), ref["simul"])
    # our loader reads the torch layout directly (.pt interchange)
    train = WaveEq(str(pt_dir), nt_cond=2, seq_len=5, train=True, downsample=2)
    assert train.data.shape[0] == 2
    with pytest.raises(ValueError, match="fmt"):
        generate_dataset(str(tmp_path / "bad"), size=1, seq_len=4, fmt="h5")


def test_pixel_seed_parity(tmp_path):
    # gen_pixels.py:48-49 with seed 42 must reproduce the reference draws.
    generate_pixels(str(tmp_path), number=100, seed=42)
    pix = np.load(tmp_path / "pixels" / "pixels.npz")
    ref = np.random.RandomState(42)
    np.testing.assert_array_equal(pix["rand_w"], ref.randint(64, size=100))
    np.testing.assert_array_equal(pix["rand_h"], ref.randint(64, size=100))
