"""`datasets.MNIST` shim: reads raw idx files (the torchvision on-disk
layout, `<root>/MNIST/raw/train-images-idx3-ubyte[.gz]`) and yields
`(np.uint8 image, int label)` pairs.

The reference consumes it as
`[np.array(img, dtype=np.uint8) for i, (img, label) in enumerate(digits)]`
(`var_sep/data/moving_mnist.py:330-331`); `np.array` on an ndarray is a
no-op copy, so yielding arrays instead of PIL images is transparent.
"""

import gzip
import os
import struct

import numpy as np

_FILES = {
    (True, "images"): "train-images-idx3-ubyte",
    (True, "labels"): "train-labels-idx1-ubyte",
    (False, "images"): "t10k-images-idx3-ubyte",
    (False, "labels"): "t10k-labels-idx1-ubyte",
}


def _find(root, name):
    for sub in ("", "MNIST/raw", "raw"):
        for suffix in ("", ".gz"):
            p = os.path.join(root, sub, name + suffix)
            if os.path.exists(p):
                return p
    raise FileNotFoundError(
        f"{name}[.gz] not found under {root!r} (looked in ., MNIST/raw, raw)")


def _read_idx(path):
    op = gzip.open if path.endswith(".gz") else open
    with op(path, "rb") as f:
        raw = f.read()
    zero, dtype_code, ndim = struct.unpack(">HBB", raw[:4])
    assert zero == 0 and dtype_code == 0x08, f"unsupported idx header in {path}"
    shape = struct.unpack(">" + "I" * ndim, raw[4:4 + 4 * ndim])
    return np.frombuffer(raw, np.uint8, offset=4 + 4 * ndim).reshape(shape)


class MNIST:
    def __init__(self, root, train=True, download=False, transform=None):
        del download, transform  # no egress; files must already exist
        self.data = _read_idx(_find(root, _FILES[(train, "images")]))
        try:
            self.targets = _read_idx(_find(root, _FILES[(train, "labels")]))
        except FileNotFoundError:
            self.targets = np.zeros(len(self.data), np.uint8)

    def __len__(self):
        return len(self.data)

    def __getitem__(self, i):
        return self.data[i], int(self.targets[i])

    def __iter__(self):
        for i in range(len(self.data)):
            yield self[i]
