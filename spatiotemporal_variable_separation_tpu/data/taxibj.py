"""TaxiBJ traffic-flow dataset (reference ``var_sep/data/taxibj.py``,
itself vendored from MIM).

Pipeline parity:
* load the four yearly HDF5 files ``BJ{13..16}_M32x32_T30_InOut.h5``
  (fields ``data`` (N, 2, 32, 32), ``date`` byte strings ``YYYYMMDDSS``),
* drop days that do not have all 48 half-hour slots (``taxibj.py:184-207``),
* clamp negatives to 0, min-max fit **on the raw frame array minus the last
  ``len_test`` frames** (``taxibj.py:234-239``),
* build "closeness" sequences: for each timestamp t whose ``len_closeness``
  predecessors all exist at 30-minute spacing, the sequence is
  ``[frame(t-1), frame(t-2), ..., frame(t-L)]`` — *most recent first*, i.e.
  reference sequences run backward in time (``taxibj.py:74-100``); kept
  as-is for metric parity,
* last ``48*7*4`` sequences are the test set (``taxibj.py:253-254``).

Timestamps are handled with integer day-ordinal*48+slot arithmetic instead
of pandas.  Items are (cond, target) float32 (T, 32, 32, 2) channels-last.
"""

from __future__ import annotations

import glob
import os
from typing import List, Tuple

import numpy as np

#: bump when remove_incomplete_days / MinMaxNormalization /
#: _build_closeness semantics change — the on-disk cache fingerprints the
#: SOURCE files only, so without a code version a pipeline change would
#: silently keep serving tensors built by the old code.
CACHE_VERSION = 1


def _parse_stamps(timestamps) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized parse of ``YYYYMMDDSS`` stamps.

    Returns (date_int ``YYYYMMDD``, slot ``1..48``, absolute half-hour slot
    ``toordinal(date) * 48 + slot - 1``) as int64 arrays.  One numpy pass —
    the original per-stamp ``datetime.date(...).toordinal()`` loop dominated
    dataset construction on a loaded single-core host."""
    full = np.asarray(timestamps, dtype="S10").astype("U10").astype(np.int64)
    date = full // 100
    slot = full % 100
    year, month, day = date // 10000, date // 100 % 100, date % 100
    d64 = ((year - 1970).astype("M8[Y]").astype("M8[M]")
           + (month - 1).astype("m8[M]")).astype("M8[D]") \
        + (day - 1).astype("m8[D]")
    # datetime.date(1970, 1, 1).toordinal() == 719163
    ordinal = d64.astype(np.int64) + 719163
    return date, slot, ordinal * 48 + (slot - 1)


def remove_incomplete_days(data: np.ndarray, timestamps: List[bytes],
                           T: int = 48) -> Tuple[np.ndarray, List[bytes]]:
    """Keep only days covering slots 1..T (reference ``taxibj.py:184-207``
    scan semantics: a day is complete iff slot 1 is followed T-1 entries
    later by slot T)."""
    date, slot, _ = _parse_stamps(timestamps)
    slot_l = slot.tolist()
    days = []
    i = 0
    n = len(timestamps)
    while i < n:
        if slot_l[i] != 1:
            i += 1
        elif i + T - 1 < n and slot_l[i + T - 1] == T:
            days.append(date[i])
            i += T
        else:
            i += 1
    idx = np.flatnonzero(np.isin(date, np.asarray(days, np.int64)))
    return data[idx], [timestamps[i] for i in idx]


class MinMaxNormalization:
    """[0, 1] min-max scaler (reference ``taxibj.py:139-165``; the [-1, 1]
    step is commented out there too)."""

    def fit(self, x):
        self._min = x.min()
        self._max = x.max()

    def transform(self, x):
        return 1.0 * (x - self._min) / (self._max - self._min)

    def fit_transform(self, x):
        self.fit(x)
        return self.transform(x)

    def inverse_transform(self, x):
        return 1.0 * x * (self._max - self._min) + self._min


def _build_closeness(data: np.ndarray, timestamps: List[bytes],
                     len_closeness: int) -> np.ndarray:
    """Sequences [t-1, ..., t-L] for every t whose L predecessors exist.

    Vectorized: dependency lookups are one ``searchsorted`` over the sorted
    absolute-slot axis and the windows one fancy gather (the original
    23k-iteration transpose/stack loop took minutes of host time)."""
    _, _, slots = _parse_stamps(timestamps)
    order = np.argsort(slots, kind="stable")
    sorted_slots = slots[order]
    L = len_closeness
    # deps[k, j-1] = slots[L + k] - j  (most recent first, reference order)
    deps = slots[L:, None] - np.arange(1, L + 1, dtype=np.int64)[None, :]
    pos = np.searchsorted(sorted_slots, deps)
    pos = np.minimum(pos, len(slots) - 1)
    valid = (sorted_slots[pos] == deps).all(axis=1)
    win = order[pos[valid]]  # (N, L) frame indices
    frames = np.transpose(data, (0, 2, 3, 1))  # channels-last once
    return frames[win]  # (N, L, 32, 32, 2)


class TaxiBJ:
    def __init__(self, data: np.ndarray, nt_cond: int, mmn: MinMaxNormalization):
        self.data = data
        self.nt_cond = nt_cond
        self.mmn = mmn

    @classmethod
    def make_datasets(cls, data_dir: str, T: int = 48, nb_flow: int = 2,
                      len_closeness: int = None, len_test: int = 48 * 7 * 4,
                      nt_cond: int = 4) -> Tuple["TaxiBJ", "TaxiBJ"]:
        import h5py

        # Build-once cache: the windowed corpus is a pure function of the
        # yearly h5 files (fingerprinted below), and rebuilding it costs
        # several full passes over the corpus — minutes of wall-clock on a
        # slow/contended host for every training resume and eval.
        years = list(range(13, 17))
        src = [os.path.join(data_dir, f"BJ{y}_M32x32_T30_InOut.h5")
               for y in years]
        fingerprint = np.array(
            [(os.path.getsize(p), int(os.path.getmtime(p))) for p in src],
            np.int64)
        base = os.path.join(
            data_dir, f"closeness_L{len_closeness}_test{len_test}")
        cache, meta = base + ".npy", base + ".meta.npz"
        if os.path.isfile(cache) and os.path.isfile(meta):
            try:
                z = np.load(meta)
                if ("version" in z.files
                        and int(z["version"]) == CACHE_VERSION
                        and np.array_equal(z["fingerprint"], fingerprint)):
                    mmn = MinMaxNormalization()
                    mmn._min, mmn._max = float(z["min"]), float(z["max"])
                    # raw .npy so the gigabyte corpus is memory-mapped, not
                    # copied through python (the npz/zip path re-reads it at
                    # this host's pathological bulk-copy speed).
                    xc = np.load(cache, mmap_mode="r")
                    return (cls(xc[:-len_test], nt_cond, mmn),
                            cls(xc[-len_test:], nt_cond, mmn))
            except (OSError, KeyError, ValueError):
                pass  # unreadable/stale cache: rebuild below

        data_all, timestamps_all = [], []
        for year in range(13, 17):
            fname = os.path.join(data_dir, f"BJ{year}_M32x32_T30_InOut.h5")
            with h5py.File(fname, "r") as f:
                data = f["data"][()]
                timestamps = list(f["date"][()])
            data, timestamps = remove_incomplete_days(data, timestamps, T)
            data = data[:, :nb_flow]
            data[data < 0] = 0.0
            data_all.append(data)
            timestamps_all.append(timestamps)

        total_frames = sum(len(d) for d in data_all)
        if total_frames <= len_test:
            raise ValueError(
                f"TaxiBJ data has {total_frames} complete-day frames but "
                f"len_test={len_test}; the min-max fit slice would be empty "
                f"(reference assumes the full 4-year corpus)")
        data_train = np.vstack(data_all)[:-len_test]
        mmn = MinMaxNormalization()
        mmn.fit(data_train)

        # normalize in f64 then cast f32 *before* windowing: same values as
        # casting after (the cast is elementwise), half the gather traffic.
        xc = [
            _build_closeness(mmn.transform(d).astype(np.float32), ts,
                             len_closeness)
            for d, ts in zip(data_all, timestamps_all)
        ]
        xc = np.concatenate(xc, axis=0)
        # crashed builds (SIGKILL / disk-full) leave gigabyte .tmp files no
        # later run would ever touch: sweep dead pids' leftovers first.
        for leftover in glob.glob(base + ".tmp.*"):
            try:
                os.unlink(leftover)
            except OSError:
                pass
        tmp = None
        try:  # atomic publish; a read-only data_dir just skips the cache
            tmp = base + f".tmp.{os.getpid()}.npy"
            np.save(tmp, xc)
            os.replace(tmp, cache)
            tmp = base + f".tmp.{os.getpid()}.meta.npz"
            np.savez(tmp, min=np.float64(mmn._min),
                     max=np.float64(mmn._max), fingerprint=fingerprint,
                     version=np.int64(CACHE_VERSION))
            os.replace(tmp, meta)
        except OSError:
            if tmp is not None:
                try:
                    os.unlink(tmp)
                except OSError:
                    pass
        return (cls(xc[:-len_test], nt_cond, mmn), cls(xc[-len_test:], nt_cond, mmn))

    def __len__(self) -> int:
        return len(self.data)

    def __getitem__(self, index: int):
        seq = self.data[index]
        return seq[: self.nt_cond], seq[self.nt_cond:]
