"""WaveEq: device-side jitted RK4 simulator + datasets.

The reference generates this dataset with per-row Python loops inside a
``torchdiffeq`` RK4 callback, rebuilding the source mask on every derivative
evaluation (``var_sep/preprocessing/wave/gen_wave.py:37-138``) — fully
host-side and O(minutes).  Here the 2-D wave equation

    w'' = c^2 * Lap(w) + source(t) * mask

is integrated as a first-order system with a fixed-step 4th-order
Runge-Kutta inside ``lax.scan``, the 5th (or 3rd) order finite-difference
Laplacian is a pair of shifted-slice sums, and the whole batch of sequences
is ``vmap``-ped over (c, f0), so the dataset generates on-TPU in
milliseconds.

RK tableau: the reference integrates through torchdiffeq 0.0.1's
``method='rk4'``, which is the **3/8-rule** variant (stages at t+h/3 and
t+2h/3, weights h/8·(k1+3k2+3k3+k4)), not the classic h/6 rule — the
default here matches it (``tableau="38"``); ``tableau="classic"`` selects
standard RK4 (both are 4th order; only bitwise dataset parity differs).

Physics parity with the reference:
* decaying source ``f0 * exp(-invT0 * t)``, invT0=20, circular r=5 mask at
  (32, 32) (``gen_wave.py:27-34``),
* boundaries: the FD stencil only fills interior rows/columns, boundary
  second-derivatives stay zero (``gen_wave.py:71-83``),
* c ~ U[300, 400], f0 ~ U[1, 30], dt=0.001, zero initial condition
  (``gen_wave.py:121-135``).

Datasets: per-sequence min-max normalization, time downsampling, sliding
windows (``var_sep/data/wave_eq.py:29-72``); ``WaveEqPartial`` subsamples
fixed random pixels (``wave_eq.py:75-90``).  The reference's ``__len__``
uses the frame *height* instead of the sequence length
(``wave_eq.py:62-65``) — a bug we do not reproduce; our length is
``n_sequences * (nt - seq_len + 1)`` consistent with the index math.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp


def circle_mask(size: int = 64, center=(32, 32), r: int = 5) -> jnp.ndarray:
    """Boolean disk mask; reference ``gen_wave.py:31-34`` semantics
    (strict ``< r^2``)."""
    ii = jnp.arange(size)[:, None]
    jj = jnp.arange(size)[None, :]
    return (((jj - center[0]) ** 2 + (ii - center[1]) ** 2) < r * r).astype(jnp.float32)


def laplacian(w: jnp.ndarray, order: int = 5) -> jnp.ndarray:
    """FD Laplacian with zero boundary contributions.

    ``order=5``: 5-point 4th-order stencil on [2, n-2); ``order=3``:
    3-point stencil on [1, n-1) — matching the reference's loop bounds
    (``gen_wave.py:69-83``)."""
    out = jnp.zeros_like(w)
    if order == 3:
        d_yy = w[:, 2:] - 2.0 * w[:, 1:-1] + w[:, :-2]
        d_xx = w[2:, :] - 2.0 * w[1:-1, :] + w[:-2, :]
        out = out.at[:, 1:-1].add(d_yy)
        out = out.at[1:-1, :].add(d_xx)
        return out
    if order == 5:
        c2, c1, c0 = -1.0 / 12.0, 4.0 / 3.0, -5.0 / 2.0
        d_yy = (c2 * w[:, 4:] + c1 * w[:, 3:-1] + c0 * w[:, 2:-2]
                + c1 * w[:, 1:-3] + c2 * w[:, :-4])
        d_xx = (c2 * w[4:, :] + c1 * w[3:-1, :] + c0 * w[2:-2, :]
                + c1 * w[1:-3, :] + c2 * w[:-4, :])
        out = out.at[:, 2:-2].add(d_yy)
        out = out.at[2:-2, :].add(d_xx)
        return out
    raise ValueError(f"unsupported stencil order {order}")


@partial(jax.jit, static_argnames=("seq_len", "frame_size", "order",
                                   "circular", "tableau"))
def simulate_wave(c: jnp.ndarray, f0: jnp.ndarray, seq_len: int = 300,
                  frame_size: int = 64, dt: float = 0.001, invT0: float = 20.0,
                  order: int = 5, circular: bool = True,
                  tableau: str = "38") -> jnp.ndarray:
    """Integrate one wave sequence; returns (seq_len, H, W) of w.

    ``c``/``f0`` may be batched (same leading shape); the integrator is
    vmapped over them.  ``tableau``: "38" (torchdiffeq-rk4 parity, default)
    or "classic"."""
    mask = circle_mask(frame_size, r=5 if circular else 1)

    def one(c_s, f0_s):
        def f(t, w, wd):
            acc = (c_s ** 2) * laplacian(w, order) + f0_s * jnp.exp(-invT0 * t) * mask
            return wd, acc

        def step_classic(state, t):
            w, wd = state
            k1 = f(t, w, wd)
            k2 = f(t + dt / 2, w + dt / 2 * k1[0], wd + dt / 2 * k1[1])
            k3 = f(t + dt / 2, w + dt / 2 * k2[0], wd + dt / 2 * k2[1])
            k4 = f(t + dt, w + dt * k3[0], wd + dt * k3[1])
            w_n = w + dt / 6 * (k1[0] + 2 * k2[0] + 2 * k3[0] + k4[0])
            wd_n = wd + dt / 6 * (k1[1] + 2 * k2[1] + 2 * k3[1] + k4[1])
            return (w_n, wd_n), w_n

        def step_38(state, t):
            # 3/8-rule RK4, the torchdiffeq 'rk4' step function.
            w, wd = state
            third = dt / 3.0
            k1 = f(t, w, wd)
            k2 = f(t + third, w + third * k1[0], wd + third * k1[1])
            k3 = f(t + 2 * third,
                   w + dt * (k2[0] - k1[0] / 3.0),
                   wd + dt * (k2[1] - k1[1] / 3.0))
            k4 = f(t + dt,
                   w + dt * (k1[0] - k2[0] + k3[0]),
                   wd + dt * (k1[1] - k2[1] + k3[1]))
            w_n = w + dt / 8 * (k1[0] + 3 * k2[0] + 3 * k3[0] + k4[0])
            wd_n = wd + dt / 8 * (k1[1] + 3 * k2[1] + 3 * k3[1] + k4[1])
            return (w_n, wd_n), w_n

        step = step_38 if tableau == "38" else step_classic
        init = (jnp.zeros((frame_size, frame_size)), jnp.zeros((frame_size, frame_size)))
        ts = jnp.arange(seq_len - 1, dtype=jnp.float32) * dt
        _, frames = jax.lax.scan(step, init, ts)
        return jnp.concatenate([init[0][None], frames], axis=0)

    c = jnp.asarray(c, jnp.float32)
    f0 = jnp.asarray(f0, jnp.float32)
    if c.ndim == 0:
        return one(c, f0)
    return jax.vmap(one)(c, f0)


def generate_dataset(data_dir: str, size: int = 300, seq_len: int = 300,
                     frame_size: int = 64, dt: float = 0.001, seed: int = 42,
                     batch: int = 32, fmt: str = "npz") -> None:
    """Generate the WaveEq dataset on device.

    Writes ``data/homogenous_wave{i}.npz`` files with fields ``simul``
    (float32 (seq_len, H, W)) and ``c``.  The RNG draw order per sequence
    (f0 then c) matches ``gen_wave.py:121-130``.

    ``fmt="pt"`` writes torch pickles in the reference generator's exact
    layout instead (``{'simul': FloatTensor, 'c': float}``,
    ``gen_wave.py:138``), so this device-side generator is a drop-in
    replacement for the reference's hours-long host loop: its ``WaveEq``
    loaders consume the output directly."""
    if fmt not in ("npz", "pt"):
        raise ValueError(f"fmt must be 'npz' or 'pt', got {fmt!r}")
    if fmt == "pt":
        import torch
    out_dir = os.path.join(data_dir, "data")
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.RandomState(seed)
    f0s = np.empty(size, np.float32)
    cs = np.empty(size, np.float32)
    for i in range(size):
        f0s[i] = rng.uniform(1, 30)
        cs[i] = rng.uniform(300, 400)
    for start in range(0, size, batch):
        stop = min(start + batch, size)
        # pad a ragged final batch to the full width so the jitted
        # integrator never retraces (compiles cost minutes on the tunneled
        # TPU); padded sequences are discarded.
        c_b = cs[start:start + batch] if stop - start == batch else np.resize(
            cs[start:stop], batch)
        f_b = f0s[start:start + batch] if stop - start == batch else np.resize(
            f0s[start:stop], batch)
        sims = simulate_wave(jnp.asarray(c_b), jnp.asarray(f_b),
                             seq_len=seq_len, frame_size=frame_size, dt=dt)
        sims = np.asarray(sims, np.float32)
        for j, i in enumerate(range(start, stop)):
            if fmt == "pt":
                torch.save({"simul": torch.from_numpy(sims[j].copy()),
                            "c": float(cs[i])},
                           os.path.join(out_dir, f"homogenous_wave{i}.pt"))
            else:
                np.savez(os.path.join(out_dir, f"homogenous_wave{i}.npz"),
                         simul=sims[j], c=cs[i])


def _load_simul(path: str) -> np.ndarray:
    if path.endswith(".npz"):
        return np.load(path)["simul"].astype(np.float32)
    # torch .pt interchange with the reference's generator output.
    import torch

    d = torch.load(path, map_location="cpu", weights_only=False)
    return np.asarray(d["simul"], dtype=np.float32)


class WaveEq:
    """Sliding-window dataset over simulated wave sequences.

    Items are ``(cond, target)`` with internal (T, H, W, 1) layout.
    Train/test split: first 80% of sequence files by index
    (``data/wave_eq.py:41-46``)."""

    def __init__(self, data_dir: str, nt_cond: int, seq_len: int, train: bool,
                 downsample: int = 2):
        self.nt_cond = nt_cond
        self.seq_len = seq_len
        base = os.path.join(data_dir, "data")
        import re

        def seq_id(name):
            return int(re.findall(r"\d+", name)[0])

        files = sorted(os.listdir(base), key=seq_id)
        max_seq = int(0.8 * len(files))
        files = [f for f in files if (seq_id(f) < max_seq) == train]
        data = []
        for f in files:
            simul = _load_simul(os.path.join(base, f))
            mx, mn = simul.max(), simul.min()
            simul = (simul - mn) / (mx - mn)
            data.append(simul[::downsample])
        self.data = np.stack(data)[..., None]  # (N, nt, H, W, 1)
        self.nt = self.data.shape[1]
        self.windows = self.nt - self.seq_len + 1
        if self.windows <= 0:
            raise ValueError(
                f"seq_len={seq_len} exceeds the {self.nt} frames available "
                f"after downsampling by {downsample}; generate longer "
                f"sequences (cli.gen_wave --seq_len >= {seq_len * downsample})")

    def __len__(self) -> int:
        return self.data.shape[0] * self.windows

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        i, j = divmod(idx, self.windows)
        window = self.data[i, j:j + self.seq_len]
        return window[: self.nt_cond], window[self.nt_cond: self.seq_len]


class WaveEqPartial(WaveEq):
    """Fixed-random-pixel observation variant (WaveEq-100).

    Frames become (n_pixels, 1); pixel coordinates come from
    ``pixels/pixels.npz`` (fields rand_w/rand_h, ``gen_pixels.py:48-52``)."""

    def __init__(self, data_dir: str, nt_cond: int, seq_len: int, train: bool,
                 downsample: int = 2, n_pixels: int = 100):
        super().__init__(data_dir, nt_cond, seq_len, train, downsample)
        pix = np.load(os.path.join(data_dir, "pixels", "pixels.npz"))
        self.rand_w = pix["rand_w"][:n_pixels]
        self.rand_h = pix["rand_h"][:n_pixels]

    def __getitem__(self, idx: int):
        cond, target = super().__getitem__(idx)
        return (cond[:, self.rand_w, self.rand_h, :],
                target[:, self.rand_w, self.rand_h, :])


def generate_pixels(data_dir: str, number: int = 100, frame_size: int = 64,
                    seed: int = 42) -> None:
    """Draw the fixed observation pixels (``gen_pixels.py``; same seed ->
    same coordinates as the reference)."""
    out = os.path.join(data_dir, "pixels")
    os.makedirs(out, exist_ok=True)
    rng = np.random.RandomState(seed)
    rand_w = rng.randint(frame_size, size=number)
    rand_h = rng.randint(frame_size, size=number)
    np.savez_compressed(os.path.join(out, "pixels.npz"), rand_w=rand_w, rand_h=rand_h)
