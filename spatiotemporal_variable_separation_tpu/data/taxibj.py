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

import datetime
import os
from typing import List, Tuple

import numpy as np


def _abs_slot(ts: bytes) -> int:
    s = ts.decode() if isinstance(ts, (bytes, np.bytes_)) else str(ts)
    day = datetime.date(int(s[:4]), int(s[4:6]), int(s[6:8])).toordinal()
    slot = int(s[8:])  # 1..48
    return day * 48 + (slot - 1)


def remove_incomplete_days(data: np.ndarray, timestamps: List[bytes],
                           T: int = 48) -> Tuple[np.ndarray, List[bytes]]:
    """Keep only days covering slots 1..T (reference ``taxibj.py:184-207``
    scan semantics: a day is complete iff slot 1 is followed T-1 entries
    later by slot T)."""
    def slot(ts):
        s = ts.decode() if isinstance(ts, (bytes, np.bytes_)) else str(ts)
        return int(s[8:])

    days = set()
    i = 0
    while i < len(timestamps):
        if slot(timestamps[i]) != 1:
            i += 1
        elif i + T - 1 < len(timestamps) and slot(timestamps[i + T - 1]) == T:
            days.add(timestamps[i][:8])
            i += T
        else:
            i += 1
    idx = [i for i, t in enumerate(timestamps) if t[:8] in days]
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
    """Sequences [t-1, ..., t-L] for every t whose L predecessors exist."""
    slots = np.array([_abs_slot(t) for t in timestamps], np.int64)
    index = {s: i for i, s in enumerate(slots)}
    xc = []
    for i in range(len_closeness, len(slots)):
        base = slots[i]
        deps = [base - j for j in range(1, len_closeness + 1)]
        if all(d in index for d in deps):
            frames = [np.transpose(data[index[d]], (1, 2, 0)) for d in deps]
            xc.append(np.stack(frames, axis=0))
    return np.stack(xc, axis=0)  # (N, L, 32, 32, 2)


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

        xc = [
            _build_closeness(mmn.transform(d), ts, len_closeness)
            for d, ts in zip(data_all, timestamps_all)
        ]
        xc = np.concatenate(xc, axis=0).astype(np.float32)
        return (cls(xc[:-len_test], nt_cond, mmn), cls(xc[-len_test:], nt_cond, mmn))

    def __len__(self) -> int:
        return len(self.data)

    def __getitem__(self, index: int):
        seq = self.data[index]
        return seq[: self.nt_cond], seq[self.nt_cond:]
