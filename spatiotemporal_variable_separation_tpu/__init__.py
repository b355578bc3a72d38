"""TPU-native JAX framework for PDE-driven spatiotemporal disentanglement.

A from-scratch rebuild (not a port) of the separation-of-variables
forecaster of *PDE-Driven Spatiotemporal Disentanglement* (ICLR 2021,
arXiv:2008.01352).  Sequences are encoded into a static spatial code S and a
dynamic temporal code T; T is evolved by a learned residual (Euler-step)
integrator fused into an on-chip ``lax.scan``; a decoder renders every frame
from (S, T_t) in one large batched pass so the MXU sees (time x batch)-sized
matmuls instead of a Python rollout loop.

Layout conventions
------------------
The reference implementation (``/root/reference/var_sep``) is NCHW/PyTorch.
This library is channels-last (NHWC), the native TPU layout:

* a frame is ``(H, W, C)``,
* a sequence is ``(T, H, W, C)``,
* a batch of sequences is ``(B, T, H, W, C)``.

Boundary conversion to the reference's archived NCHW/npz layouts happens
at the eval edge (:func:`eval.common.to_uint8_nchw_last`); loaders emit
channels-last directly.
"""

__version__ = "0.1.0"

from spatiotemporal_variable_separation_tpu.core.config import (  # noqa: F401
    ExperimentConfig,
)


def __getattr__(name):  # lazy: serving pulls in checkpoint/orbax
    if name == "Forecaster":
        from spatiotemporal_variable_separation_tpu.serve import Forecaster
        return Forecaster
    raise AttributeError(name)
