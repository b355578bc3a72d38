"""WaveEq / WaveEq-100 evaluation (reference ``var_sep/test/wave/test.py``):
MSE over a 40-step rollout (``nt_pred`` hardcoded to 40, ``test.py:74-75``);
spatial mean for full grids, pixel mean for partial observations."""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from spatiotemporal_variable_separation_tpu.checkpoint import load_for_eval
from spatiotemporal_variable_separation_tpu.data.wave_eq import WaveEq, WaveEqPartial
from spatiotemporal_variable_separation_tpu.eval.common import Evaluator, batch_indices

NT_PRED = 40


def evaluate(xp_dir: str, data_dir: str, batch_size: int = 256,
             epoch: Optional[int] = None, max_batches: Optional[int] = None,
             model_bundle=None, mesh=None) -> Dict[str, float]:
    if model_bundle is None:
        model, variables, cfg = load_for_eval(
            xp_dir, name=str(epoch) if epoch is not None else None,
            overrides=dict(nt_pred=NT_PRED, data_dir=data_dir))
    else:
        model, variables, cfg = model_bundle
    nt_cond, offset = cfg.nt_cond, cfg.offset
    if cfg.data == "wave":
        ds = WaveEq(data_dir, nt_cond, nt_cond + NT_PRED, train=False,
                    downsample=cfg.downsample)
    else:
        ds = WaveEqPartial(data_dir, nt_cond, nt_cond + NT_PRED, train=False,
                           downsample=cfg.downsample, n_pixels=cfg.n_wave_points)
    ev = Evaluator(model, variables, mesh=mesh)

    all_mse = []
    for idx, n_real in batch_indices(len(ds), min(batch_size, len(ds)),
                                     max_batches):
        items = [ds[i] for i in idx]
        cond = np.stack([c for c, _ in items])
        target = np.stack([t for _, t in items])
        nt_target = target.shape[1]
        if offset:
            pred = np.asarray(ev.forecast(cond, nt_target + nt_cond)[0][:, nt_cond:])
        else:
            pred = np.asarray(ev.forecast(cond, nt_target)[0])
        err = (pred.astype(np.float64) - target.astype(np.float64)) ** 2
        # spatial(+channel) mean per frame; the reference's chained last-dim
        # means reduce to the same thing for both full and partial grids.
        mse = err.reshape(err.shape[0], err.shape[1], -1).mean(axis=2)
        all_mse.append(mse[:n_real])
    mse_array = np.concatenate(all_mse, axis=0)
    return {"mse_t40": float(mse_array.mean(axis=0)[:NT_PRED].mean())}
