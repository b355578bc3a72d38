"""Model factory: architecture-name -> configured flax modules.

Mirror of the reference factory's selection matrix and invariants
(``var_sep/networks/factory.py:25-87``); configuration invariants are
enforced earlier by :meth:`ExperimentConfig.validate` instead of scattered
asserts.  Initialization type/gain are threaded into every layer through the
initializer registry rather than applied post-hoc (the functional equivalent
of ``init_net``, ``utils.py:75-109``)."""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp

from spatiotemporal_variable_separation_tpu.core.config import ExperimentConfig
from spatiotemporal_variable_separation_tpu.models.constant import ConstantS
from spatiotemporal_variable_separation_tpu.models.conv import (
    DCGAN64Decoder,
    DCGAN64Encoder,
    DecoderSST,
    DecoderSSTSkip,
    EncoderSST,
    VGG64Decoder,
    VGG64Encoder,
)
from spatiotemporal_variable_separation_tpu.models.integrator import ConvResnet, MLPResnet
from spatiotemporal_variable_separation_tpu.models.mlp_encdec import MLPDecoder, MLPEncoder
from spatiotemporal_variable_separation_tpu.models.resnet18 import ResNet18
from spatiotemporal_variable_separation_tpu.models.separable import SeparableNetwork

Dtype = Any


def compute_dtype(precision: str) -> Dtype:
    return jnp.float32 if precision == "f32" else jnp.bfloat16


def bn_io_dtype(cfg: ExperimentConfig) -> Dtype:
    """BatchNorm IO dtype. ``--bn_io f32`` (default) keeps BN inputs and
    outputs f32 under any compute policy (torch-AMP parity — norms are
    blacklisted from f16 there); ``--bn_io compute`` follows the compute
    dtype while batch/running statistics still accumulate in f32 (flax
    forces f32 reductions). A measured byte-traffic lever on the
    memory-bound conv train steps (BASELINE.md)."""
    if cfg.bn_io == "compute":
        return compute_dtype(cfg.precision)
    return jnp.float32


def integrator_dtype(precision: str) -> Dtype:
    """``mixed`` keeps the temporal integrator in f32 while conv stacks run
    bf16 on the MXU. MEASURED (round-2 A/B, 50-epoch MNIST/DCGAN run on
    v5e): mixed reproduces the full-bf16 BN-masked runaway (integrator gain
    1.9x/step, |S| 334, BN running var 1.3e10 — BASELINE.md) AND shows no
    throughput gain over f32 (28.3 vs 28.4 s/epoch; the step is
    memory-bound and BN's f32 round-trips dominate). The runaway is driven
    by the bf16 conv path's gradient quantization, not the integrator's
    arithmetic. Kept selectable for experimentation; use f32 for the
    MNIST recipe."""
    return jnp.float32 if precision in ("f32", "mixed") else jnp.bfloat16


def get_encoder(nn_type: str, frame_shape: Tuple[int, ...], output_size: int,
                hidden_size: int, n_layers: int, init_type: str, init_gain: float,
                dtype: Dtype = jnp.float32, name: Optional[str] = None,
                bn_dtype: Dtype = jnp.float32):
    dim = frame_shape[0] if len(frame_shape) == 3 else None
    kw = dict(init_type=init_type, init_gain=init_gain, dtype=dtype, name=name)
    if nn_type in ("dcgan", "vgg", "resnet", "encoderSST"):
        kw["bn_dtype"] = bn_dtype  # MLP encoders have no BatchNorm
    if nn_type == "dcgan":
        return DCGAN64Encoder(nh=output_size, nf=hidden_size, **kw)
    if nn_type == "vgg":
        return VGG64Encoder(nh=output_size, nf=hidden_size, vgg32=dim == 32, **kw)
    if nn_type == "resnet":
        return ResNet18(pose_dim=output_size, **kw)
    if nn_type == "encoderSST":
        return EncoderSST(out_c=output_size, **kw)
    if nn_type == "mlp":
        return MLPEncoder(nh=output_size, hidden_size=hidden_size, nlayers=n_layers, **kw)
    raise ValueError(f"unknown encoder architecture {nn_type!r}")


def get_decoder(nn_type: str, frame_shape: Tuple[int, ...], last_activation: Optional[str],
                hidden_size: int, n_layers: int, mixing: str, skipco: bool,
                init_type: str, init_gain: float, dtype: Dtype = jnp.float32,
                name: Optional[str] = None, bn_dtype: Dtype = jnp.float32):
    nc = frame_shape[-1]
    dim = frame_shape[0] if len(frame_shape) == 3 else None
    kw = dict(init_type=init_type, init_gain=init_gain, dtype=dtype, name=name)
    if nn_type in ("dcgan", "vgg", "decoderSST"):
        kw["bn_dtype"] = bn_dtype  # the MLP decoder has no BatchNorm
    if nn_type == "dcgan":
        return DCGAN64Decoder(nc=nc, nf=hidden_size, skip=skipco,
                              last_activation=last_activation, mixing=mixing, **kw)
    if nn_type == "vgg":
        return VGG64Decoder(nc=nc, nf=hidden_size, skip=skipco,
                            last_activation=last_activation, mixing=mixing,
                            vgg32=dim == 32, **kw)
    if nn_type == "mlp":
        return MLPDecoder(output_shape=tuple(frame_shape), hidden_size=hidden_size,
                          nlayers=n_layers, last_activation=last_activation,
                          mixing=mixing, **kw)
    if nn_type == "decoderSST":
        cls = DecoderSSTSkip if skipco else DecoderSST
        return cls(out_c=nc, last_activation=last_activation, **kw)
    raise ValueError(f"unknown decoder architecture {nn_type!r}")


def get_integrator(n_blocks: int, hidden_size: int, init_type: str, gain: float,
                   fully_conv: bool, dtype: Dtype = jnp.float32,
                   name: Optional[str] = None, bn_dtype: Dtype = jnp.float32):
    if fully_conv:
        return ConvResnet(n_blocks=n_blocks, nf=hidden_size, init_type=init_type,
                          init_gain=gain, dtype=dtype, bn_dtype=bn_dtype, name=name)
    return MLPResnet(n_blocks=n_blocks, hidden_size=hidden_size, init_type=init_type,
                     init_gain=gain, dtype=dtype, name=name)


def build_separable_network(cfg: ExperimentConfig) -> SeparableNetwork:
    """Assemble the full model from a validated config (reference
    ``main.py:116-140``)."""
    cfg = cfg.validate()
    dtype = compute_dtype(cfg.precision)
    bn_dt = bn_io_dtype(cfg)
    shape = cfg.frame_shape

    if cfg.no_s:
        es = ConstantS(code_size=cfg.code_size_t, dtype=dtype, name="Es")
    else:
        es = get_encoder(cfg.architecture, shape, cfg.code_size_s, cfg.enc_hidden_size,
                         cfg.enc_n_layers, cfg.init_encoder, cfg.gain_encoder,
                         dtype=dtype, name="Es", bn_dtype=bn_dt)
    et = get_encoder(cfg.architecture, shape, cfg.code_size_t, cfg.enc_hidden_size,
                     cfg.enc_n_layers, cfg.init_encoder, cfg.gain_encoder,
                     dtype=dtype, name="Et", bn_dtype=bn_dt)
    decoder = get_decoder(cfg.decoder_arch, shape, cfg.last_activation,
                          cfg.dec_hidden_size, cfg.dec_n_layers, cfg.mixing,
                          cfg.skipco, cfg.init_encoder, cfg.gain_encoder,
                          dtype=dtype, name="decoder", bn_dtype=bn_dt)
    integrator = get_integrator(cfg.n_blocks, cfg.res_hidden_size, cfg.init_resnet,
                                cfg.gain_resnet, cfg.fully_conv_integrator,
                                dtype=integrator_dtype(cfg.precision),
                                name="t_resnet", bn_dtype=bn_dt)
    return SeparableNetwork(Es=es, Et=et, t_resnet=integrator, decoder=decoder,
                            nt_cond=cfg.nt_cond, skipco=cfg.skipco,
                            decode_mode=cfg.decode_mode, remat=cfg.remat,
                            fused_loss=cfg.fused_loss)
