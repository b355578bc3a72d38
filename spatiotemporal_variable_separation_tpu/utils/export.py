"""Export a native checkpoint as a reference (torch) experiment dir.

The inverse of :mod:`.transplant`: a trained native experiment —
``params.json`` + Orbax checkpoint — becomes the reference's on-disk
layout (pickled ``ov_Es.pt``/``ov_Et.pt``/``t_resnet.pt``/``decoder.pt``
next to ``params.json``, ``var_sep/utils/helper.py:22-33``), loadable by
the reference's own ``load_model`` (``var_sep/test/utils.py:8-16``) and
scoreable by its eval scripts.  Together with ``cli.import_torch`` this
closes the migration loop in both directions:

    python -m spatiotemporal_variable_separation_tpu.cli.export_torch \
        --xp_dir /path/to/native/xp --ref_xp_dir /path/to/torch/xp

The four torch modules are constructed through the reference's OWN factory
(``var_sep/networks/factory.py``) exactly as its train entry point does
(``var_sep/main.py:116-140``) — the reference package must therefore be
importable (``--reference_path``); weights and BatchNorm statistics are
then written in with the inverse of the layout mappings documented in
``transplant``:

=============== ========================= ==========================
layer           flax kernel               torch weight
=============== ========================= ==========================
Dense           (in, out)                 W = K.T (rows un-permuted
                                          back to channel-major when
                                          following a conv flatten)
Conv            (kh, kw, in, out)         K.transpose(3, 2, 0, 1)
ConvTranspose   (kh, kw, in, out)         flip_hw(K).transpose(2, 3, 0, 1)
BatchNorm       scale/bias + mean/var     weight/bias + running stats
=============== ========================= ==========================

Matching is order-aligned with per-position kind/shape asserts, same as
the import direction (see ``transplant`` module docstring for why that
alignment is sound).  Round-trip identity (export -> import == identity)
and forward parity against the torch modules are tested in
``tests/test_export_torch.py``.

Caveats mirrored from the import direction: multi-channel MLP configs are
rejected (torch flattens channel-major, this framework channels-last —
the orders only coincide for C == 1), and the reference's dead
``ResNet18.bn_out`` parameters (never applied in its ``forward``,
``var_sep/networks/conv.py:526``) are left at their torch init since this
framework never allocated them.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import numpy as np

from .transplant import (
    REFERENCE_FILES,
    _ensure_reference_importable,
    _flax_units,
    _get,
    _torch_units,
)


def build_reference_modules(cfg, reference_root: Optional[str] = None
                            ) -> Dict[str, Any]:
    """Instantiate the reference's four torch modules for ``cfg``.

    Mirrors ``var_sep/main.py:116-140`` (shape/last-activation dispatch at
    ``main.py:70-102``) using the reference's own ``networks.factory`` so
    the pickled modules are genuine reference classes.
    """
    _ensure_reference_importable(reference_root)
    import var_sep.networks.factory as rfac
    from var_sep.networks.utils import ConstantS

    cfg = cfg.validate()  # applies the no_s implications (main.py:124-126)
    if len(cfg.frame_shape) == 3:
        h, w, c = cfg.frame_shape
        shape = [c, h, w]  # reference layout: (C, H, W)
    else:  # wave_partial: flat pixel list (main.py:96-102)
        shape = [1, cfg.frame_shape[0]]
    if cfg.no_s:
        es = ConstantS(return_value=1, code_size=cfg.code_size_s)
    else:
        es = rfac.get_encoder(cfg.architecture, shape, cfg.code_size_s,
                              cfg.enc_hidden_size, cfg.enc_n_layers,
                              cfg.nt_cond, cfg.init_encoder, cfg.gain_encoder)
    et = rfac.get_encoder(cfg.architecture, shape, cfg.code_size_t,
                          cfg.enc_hidden_size, cfg.enc_n_layers, cfg.nt_cond,
                          cfg.init_encoder, cfg.gain_encoder)
    decoder = rfac.get_decoder(cfg.decoder_arch, shape, cfg.code_size_t,
                               cfg.code_size_s, cfg.last_activation,
                               cfg.dec_hidden_size, cfg.dec_n_layers,
                               cfg.mixing, cfg.skipco, cfg.init_encoder,
                               cfg.gain_encoder)
    t_resnet = rfac.get_resnet(cfg.code_size_t, cfg.n_blocks,
                               cfg.res_hidden_size, cfg.init_resnet,
                               cfg.gain_resnet, cfg.fully_conv_integrator)
    return {"Es": es, "Et": et, "decoder": decoder, "t_resnet": t_resnet}


def _t(x: np.ndarray):
    import torch

    return torch.tensor(np.ascontiguousarray(x, np.float32))


def export_torch_module(torch_module, params: dict,
                        batch_stats: Optional[dict] = None,
                        name: str = "module") -> None:
    """Fill ``torch_module``'s weights (in place) from a flax param tree.

    Exact inverse of ``transplant.import_torch_module``; the same
    order-aligned zip with per-position kind and shape asserts.
    """
    t_units = _torch_units(torch_module)
    f_units = _flax_units(params) if params else []
    if len(t_units) != len(f_units):
        t_desc = ", ".join(f"{n}:{k}" for n, k, _ in t_units)
        f_desc = ", ".join(f"{'/'.join(p)}:{k}" for p, k in f_units)
        raise ValueError(
            f"{name}: torch module has {len(t_units)} parameterized layers "
            f"but the flax tree has {len(f_units)}.\n  torch: [{t_desc}]\n"
            f"  flax:  [{f_desc}]")
    last_channels: Optional[int] = None  # out-channels of the previous conv
    for (t_name, t_kind, m), (f_path, f_kind) in zip(t_units, f_units):
        loc = f"{name}: flax {'/'.join(f_path)} -> torch {t_name!r} ({t_kind})"
        expected = ("dense" if t_kind == "dense"
                    else ("bn" if t_kind == "bn" else "conv"))
        if f_kind != expected:
            raise ValueError(f"{loc}: layer-kind mismatch (flax side is {f_kind})")
        leaf = _get(params, f_path)

        def _checked(t_param, value, what):
            # torch accepts a mismatched-shape ``.data =`` silently, which
            # would surface only as a confusing forward-time error in the
            # reference's eval — mirror the import direction's per-leaf
            # shape checks instead.
            if tuple(t_param.shape) != np.shape(value):
                raise ValueError(
                    f"{loc}: {what} shape {np.shape(value)} does not match "
                    f"torch {tuple(t_param.shape)} — wrong architecture "
                    "config?")
            t_param.data = _t(value)

        if t_kind == "bn":
            _checked(m.weight, leaf["scale"], "BatchNorm scale")
            _checked(m.bias, leaf["bias"], "BatchNorm bias")
            if batch_stats is not None:
                stats_leaf = _get(batch_stats, f_path)
                _checked(m.running_mean, stats_leaf["mean"], "running mean")
                _checked(m.running_var, stats_leaf["var"], "running var")
            continue
        kernel = np.asarray(leaf["kernel"], np.float32)
        if t_kind == "dense":
            w = kernel.T  # (out, in), rows in channels-last flatten order
            # A dense following a conv consumes a flattened feature map:
            # this framework flattens (h, w, c), torch flattens (c, h, w)
            # (e.g. the DCGAN encoder's 4x4 ``to_code``,
            # ``var_sep/networks/conv.py:123``) — permute the input rows
            # back to channel-major.  At 1x1 spatial extent the orders
            # coincide and k == 1 below is a no-op.
            if (last_channels is not None
                    and m.in_features % last_channels == 0):
                k = m.in_features // last_channels
                hw = int(round(k ** 0.5))
                if k > 1 and hw * hw != k:
                    raise ValueError(
                        f"{loc}: cannot infer the {last_channels}-channel "
                        f"spatial shape of a {m.in_features}-wide flatten")
                w = (w.reshape(-1, hw, hw, last_channels)
                      .transpose(0, 3, 1, 2).reshape(w.shape))
            last_channels = None
        elif t_kind == "conv":
            w = kernel.transpose(3, 2, 0, 1)
            last_channels = m.out_channels
        else:  # convT
            w = kernel[::-1, ::-1].transpose(2, 3, 0, 1)
            last_channels = m.out_channels
        _checked(m.weight, w, "weight")
        _checked(m.bias, np.asarray(leaf["bias"], np.float32), "bias")


def _reorder_like(template, values):
    """Return ``values`` re-keyed in ``template``'s dict order.

    An Orbax-restored tree comes back with alphabetically sorted keys,
    while ``_flax_units``'s order-aligned matching needs the creation
    (= call) order that a freshly initialised state carries — same key
    sets, different insertion order."""
    if not isinstance(template, dict):
        return values
    return {k: _reorder_like(template[k], values[k]) for k in template}


def export_reference_checkpoint(xp_dir: str, out_ref_dir: str,
                                name: Optional[str] = None,
                                reference_root: Optional[str] = None,
                                log_fn=print) -> str:
    """Convert a native experiment dir into a reference-layout one.

    Loads this framework's ``params.json`` + checkpoint ``name`` (default:
    the newest), builds genuine reference torch modules, transplants every
    weight and BN statistic, and writes ``out_ref_dir`` with the
    reference's ``params.json`` + the four ``.pt`` pickles — directly
    usable by ``var_sep.test.*`` eval scripts.  Returns ``out_ref_dir``.
    """
    import torch

    from spatiotemporal_variable_separation_tpu.checkpoint import load_for_eval

    model, variables, cfg = load_for_eval(xp_dir, name=name)
    if "mlp" in (cfg.architecture, cfg.decoder_arch) and cfg.channels > 1:
        # Applies to the decoder side too: an MLP decoder's final dense
        # emits pixels in this framework's channels-last flatten order,
        # which the reference would reshape channel-major (C, H, W) — a
        # silently wrong export without an output-row permutation.
        raise ValueError(
            "cannot export an mlp encoder/decoder experiment on "
            f"{cfg.channels}-channel data: the torch channel-major flatten "
            "order differs from this framework's channels-last order "
            "(see module docstring)")
    modules = build_reference_modules(cfg, reference_root)
    # Restore creation order (see _reorder_like) from a fresh init.
    from spatiotemporal_variable_separation_tpu.train.state import create_train_state
    from spatiotemporal_variable_separation_tpu.train.step import make_optimizer

    fresh = create_train_state(model, cfg, make_optimizer(cfg, steps_per_epoch=1))
    params = _reorder_like(dict(fresh.params), dict(variables["params"]))
    batch_stats = _reorder_like(dict(fresh.batch_stats or {}),
                                dict(variables.get("batch_stats", {})))
    for key, _ in REFERENCE_FILES:
        if key not in params:  # ConstantS under --no_s: parameterless
            n_units = len(_torch_units(modules[key]))
            if n_units:
                raise ValueError(
                    f"{key}: reference module has {n_units} parameterized "
                    "layers but this checkpoint stores none")
            continue
        export_torch_module(modules[key], params[key], batch_stats.get(key),
                            name=key)
        modules[key].eval()
        log_fn(f"exported {key}: {len(_flax_units(params[key]))} layers")
    os.makedirs(out_ref_dir, exist_ok=True)
    cfg.save(os.path.join(out_ref_dir, "params.json"))
    for key, stem in REFERENCE_FILES:
        torch.save(modules[key], os.path.join(out_ref_dir, f"{stem}.pt"))
    log_fn(f"wrote reference experiment dir {out_ref_dir}")
    return out_ref_dir
