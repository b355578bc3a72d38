"""Import trained reference (torch) checkpoints into this framework.

The reference pickles its four whole torch modules per experiment —
``ov_Es.pt``, ``ov_Et.pt``, ``t_resnet.pt``, ``decoder.pt``
(``var_sep/utils/helper.py:22-33``) — next to a ``params.json`` of its
argparse flags (``var_sep/main.py:105-106``).  This module converts such an
experiment directory into a native checkpoint, so a user migrating from the
reference can evaluate and serve their already-trained models here without
retraining:

    python -m spatiotemporal_variable_separation_tpu.cli.import_torch \
        --ref_xp_dir /path/to/torch/xp --xp_dir /path/to/new/xp

Weight-layout conversions (inverse of the mappings verified in
``tests/test_numerical_parity.py``):

=============== ========================== =========================
layer           torch weight                flax kernel
=============== ========================== =========================
Linear          (out, in)                   W.T
Conv2d          (out, in, kh, kw)           W.transpose(2, 3, 1, 0)
ConvTranspose2d (in, out, kh, kw)           flip_hw(W.transpose(2, 3, 0, 1))
BatchNorm       weight/bias + running stats scale/bias + mean/var
=============== ========================== =========================

Matching is *order-aligned*: torch registers parameterized layers in
forward order for every reference architecture (they are built from
``nn.Sequential``), and flax's ``init`` returns params in creation
(= call) order, so the i-th parameterized torch layer corresponds to the
i-th flax leaf.  Kinds and shapes are asserted at every position, so a
structural mismatch fails loudly instead of silently transposing the
wrong tensor.  The round-trip tests in ``tests/test_import_torch.py``
validate every architecture family against the actual reference classes.

Known reference quirk handled here: ``ResNet18.bn_out`` is defined but
never applied in ``forward`` (``var_sep/networks/conv.py:526``); this
framework does not allocate the dead parameters, so torch modules named
``bn_out`` are skipped.

Caveat: MLP encoders flatten torch ``(B, T, C, H, W)`` channel-major and
this framework flattens ``(B, T, H, W, C)``; the flattenings coincide only
for single-channel data (WaveEq, the only MLP recipe) —
``import_reference_checkpoint`` rejects multi-channel MLP configs.
"""

from __future__ import annotations

import copy
import os
import sys
import types
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

REFERENCE_FILES = (("Es", "ov_Es"), ("Et", "ov_Et"),
                   ("t_resnet", "t_resnet"), ("decoder", "decoder"))

# torch modules that the reference defines but never uses in forward.
DEAD_TORCH_MODULES = ("bn_out",)


def _torch_units(module) -> List[Tuple[str, str, Any]]:
    """Parameterized leaf layers of a torch module in registration order."""
    import torch.nn as tnn

    units = []
    for name, m in module.named_modules():
        if name.split(".")[-1] in DEAD_TORCH_MODULES:
            continue
        if isinstance(m, tnn.Linear):
            units.append((name, "dense", m))
        elif isinstance(m, tnn.ConvTranspose2d):
            units.append((name, "convT", m))
        elif isinstance(m, tnn.Conv2d):
            units.append((name, "conv", m))
        elif isinstance(m, (tnn.BatchNorm1d, tnn.BatchNorm2d)):
            units.append((name, "bn", m))
    return units


def _is_leaf(d) -> bool:
    return (isinstance(d, dict) and bool(d)
            and all(not isinstance(v, dict) for v in d.values()))


def _flax_units(params: dict) -> List[Tuple[Tuple[str, ...], str]]:
    """(path, kind) of parameterized leaves in creation (= call) order."""
    units = []

    def walk(p, path):
        if _is_leaf(p):
            if "kernel" in p:
                kind = "dense" if np.ndim(p["kernel"]) == 2 else "conv"
            elif "scale" in p:
                kind = "bn"
            else:
                raise ValueError(
                    f"unrecognized flax leaf at {'/'.join(path)}: {sorted(p)}")
            units.append((path, kind))
            return
        keys = list(p)
        if "conv" in keys and "bn" in keys:
            # A ConvBlock parent: creation order is conv -> bn, but trees
            # initialised under the rollout scan come back with sorted
            # (alphabetical) children — restore creation order so the
            # order-aligned zip with torch's conv-then-BatchNorm
            # (``var_sep/networks/conv.py:54-60``) holds.
            keys.sort(key=lambda k: {"conv": 0, "bn": 1}.get(k, 2))
        for k in keys:
            walk(p[k], path + (k,))

    walk(params, ())
    return units


def _get(tree: dict, path: Tuple[str, ...]) -> dict:
    for k in path:
        tree = tree[k]
    return tree


def _np(t) -> np.ndarray:
    return t.detach().cpu().numpy()


def import_torch_module(torch_module, params: dict,
                        batch_stats: Optional[dict] = None,
                        name: str = "module") -> Tuple[dict, dict]:
    """Fill a flax param tree (and BN stats) from a trained torch module.

    ``params``/``batch_stats`` are this framework's variable subtrees for
    the corresponding module (e.g. ``variables['params']['Es']``); returns
    filled deep copies."""
    params = copy.deepcopy(params) if params else {}
    batch_stats = copy.deepcopy(batch_stats) if batch_stats else {}
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
        loc = f"{name}: torch {t_name!r} ({t_kind}) -> flax {'/'.join(f_path)}"
        expected = "dense" if t_kind == "dense" else ("bn" if t_kind == "bn" else "conv")
        if f_kind != expected:
            raise ValueError(f"{loc}: layer-kind mismatch (flax side is {f_kind})")
        leaf = _get(params, f_path)
        if t_kind == "bn":
            new = {"scale": _np(m.weight), "bias": _np(m.bias)}
            stats_leaf = _get(batch_stats, f_path)
            stats_leaf["mean"] = np.asarray(_np(m.running_mean),
                                            stats_leaf["mean"].dtype)
            stats_leaf["var"] = np.asarray(_np(m.running_var),
                                           stats_leaf["var"].dtype)
        else:
            w = _np(m.weight)
            if t_kind == "dense":
                # A dense following a conv consumes a flattened feature map:
                # torch flattens channel-major (c, h, w) while this framework
                # flattens channels-last (h, w, c), so the input rows must be
                # permuted (e.g. the DCGAN encoder's 4x4 ``to_code``,
                # ``var_sep/networks/conv.py:123``).  At 1x1 spatial extent
                # the orders coincide and k == 1 below is a no-op.
                if (last_channels is not None
                        and m.in_features % last_channels == 0):
                    k = m.in_features // last_channels
                    hw = int(round(k ** 0.5))
                    if k > 1 and hw * hw != k:
                        raise ValueError(
                            f"{loc}: cannot infer the {last_channels}-channel "
                            f"spatial shape of a {m.in_features}-wide flatten")
                    w = (w.reshape(-1, last_channels, hw, hw)
                          .transpose(0, 2, 3, 1).reshape(w.shape))
                kernel = w.T
                last_channels = None
            elif t_kind == "conv":
                kernel = w.transpose(2, 3, 1, 0)
                last_channels = m.out_channels
            else:  # convT
                kernel = w.transpose(2, 3, 0, 1)[::-1, ::-1]
                last_channels = m.out_channels
            new = {"kernel": kernel, "bias": _np(m.bias)}
        for key, value in new.items():
            if np.shape(leaf[key]) != np.shape(value):
                raise ValueError(
                    f"{loc}: {key} shape {np.shape(value)} does not match "
                    f"target {np.shape(leaf[key])} — wrong architecture config?")
            leaf[key] = np.ascontiguousarray(value, dtype=leaf[key].dtype)
    return params, batch_stats


def _ensure_reference_importable(reference_root: Optional[str]) -> None:
    """Unpickling the reference's saved modules imports ``var_sep`` classes;
    torchvision (absent here) is stubbed the way the parity tests do."""
    if "torchvision" not in sys.modules:
        try:
            import torchvision  # noqa: F401
        except ImportError:
            tv = types.ModuleType("torchvision")
            tv.datasets = types.SimpleNamespace(MNIST=None)
            sys.modules["torchvision"] = tv
    if reference_root and reference_root not in sys.path:
        sys.path.insert(0, reference_root)


def load_reference_modules(ref_xp_dir: str, epoch: Optional[int] = None,
                           reference_root: Optional[str] = None) -> Dict[str, Any]:
    """torch.load the four pickled modules of a reference experiment dir."""
    import torch

    _ensure_reference_importable(reference_root)
    append = f"_{epoch}" if epoch is not None else ""
    modules = {}
    for key, stem in REFERENCE_FILES:
        path = os.path.join(ref_xp_dir, f"{stem}{append}.pt")
        if not os.path.isfile(path):
            raise FileNotFoundError(
                f"{path} not found — not a reference experiment dir, or "
                f"missing the epoch-{epoch} snapshot")
        try:
            modules[key] = torch.load(path, map_location="cpu",
                                      weights_only=False)
        except TypeError:  # torch < 2.0: no weights_only kwarg
            modules[key] = torch.load(path, map_location="cpu")
    return modules


def import_reference_checkpoint(ref_xp_dir: str, out_xp_dir: str,
                                epoch: Optional[int] = None,
                                reference_root: Optional[str] = None,
                                log_fn=print) -> str:
    """Convert a reference experiment dir into a native one.

    Reads the reference ``params.json`` (flag names are config-compatible
    by design) and the four ``.pt`` module files, transplants every weight
    and BN statistic, and writes ``out_xp_dir`` with our ``params.json`` +
    an Orbax checkpoint — directly usable by every eval CLI and the
    serving surface.  Returns the checkpoint path."""
    import dataclasses
    import json

    import jax

    from spatiotemporal_variable_separation_tpu import checkpoint as ckpt
    from spatiotemporal_variable_separation_tpu.core.config import ExperimentConfig
    from spatiotemporal_variable_separation_tpu.models.factory import (
        build_separable_network,
    )
    from spatiotemporal_variable_separation_tpu.train.state import create_train_state
    from spatiotemporal_variable_separation_tpu.train.step import make_optimizer

    params_path = os.path.join(ref_xp_dir, "params.json")
    with open(params_path) as f:
        raw_params = json.load(f)
    cfg = ExperimentConfig.from_dict(raw_params)
    if "precision" not in raw_params:
        # Reference params.json has no precision flag (var_sep/options.py);
        # the modules were trained in torch f32, so the imported experiment
        # must evaluate in f32 — inheriting this framework's bf16 default
        # would break the forward parity the importer promises.
        cfg = dataclasses.replace(cfg, precision="f32")
        log_fn("reference params.json has no 'precision' — pinning f32 "
               "(torch training precision)")
    cfg = cfg.validate()
    if "mlp" in (cfg.architecture, cfg.decoder_arch) and cfg.channels > 1:
        # Torch MLP encoders flatten (C, H, W) channel-major; this framework
        # flattens (H, W, C).  The orders coincide only for C == 1, so a
        # multi-channel MLP transplant would silently permute every input —
        # and symmetrically an MLP *decoder*'s final dense emits pixels in
        # one flatten order that the other framework reshapes in the other.
        raise ValueError(
            "cannot import an mlp encoder/decoder experiment on "
            f"{cfg.channels}-channel data: the torch channel-major flatten "
            "order differs from this framework's channels-last order "
            "(see module docstring)")
    modules = load_reference_modules(ref_xp_dir, epoch, reference_root)
    model = build_separable_network(cfg)
    tx = make_optimizer(cfg, steps_per_epoch=1)
    state = create_train_state(model, cfg, tx)
    params, batch_stats = dict(state.params), dict(state.batch_stats)
    for key, _ in REFERENCE_FILES:
        if key not in params:  # e.g. ConstantS under --no_s: parameterless
            n_units = len(_torch_units(modules[key]))
            if n_units:
                raise ValueError(
                    f"{key}: torch module has {n_units} parameterized layers "
                    "but this configuration allocates none")
            continue
        new_p, new_s = import_torch_module(
            modules[key], params[key], batch_stats.get(key), name=key)
        params[key] = new_p
        if key in batch_stats:
            batch_stats[key] = new_s
        log_fn(f"imported {key}: {len(_flax_units(new_p))} layers")
    state = state.replace(params=params, batch_stats=batch_stats)
    os.makedirs(out_xp_dir, exist_ok=True)
    cfg.save(os.path.join(out_xp_dir, "params.json"))
    name = str(epoch) if epoch is not None else "final"
    path = ckpt.save_checkpoint(out_xp_dir, jax.device_get(state), name=name)
    log_fn(f"wrote {path}")
    return path
