"""Minimal torchvision stand-in for running the REFERENCE implementation
(`/root/reference`, torch) on this host, where torchvision is not
installed.  Only what `var_sep/data/moving_mnist.py:39,330` touches is
provided: `torchvision.datasets.MNIST` iterated as `(image, label)` pairs.

Usage (prepend, never replace, PYTHONPATH — CLAUDE.md):

    PYTHONPATH=/root/repo/tools/ref_shims:/root/reference:$PYTHONPATH \
        python -m var_sep.main --data mnist --data_dir /root/data/mnist ...
"""

from . import datasets  # noqa: F401
