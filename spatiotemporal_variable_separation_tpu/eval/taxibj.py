"""TaxiBJ evaluation (reference ``var_sep/test/taxibj/test.py``): MSE at
t+4 in normalized min-max space.  The reference rolls out per-sample
(batch 1, ``test.py:44-45``); we batch — numerically identical, orders of
magnitude faster."""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

import jax.numpy as jnp

from spatiotemporal_variable_separation_tpu.checkpoint import load_for_eval
from spatiotemporal_variable_separation_tpu.data.taxibj import TaxiBJ
from spatiotemporal_variable_separation_tpu.eval.common import (
    Evaluator,
    batch_indices,
    bn_reestimate_pass,
)

NT_PRED = 4


def evaluate(xp_dir: str, data_dir: str, batch_size: int = 128,
             epoch: Optional[int] = None, max_batches: Optional[int] = None,
             model_bundle=None, test_set=None, mesh=None,
             bn_reestimate: int = 0,
             save_arrays: bool = False) -> Dict[str, float]:
    if model_bundle is None:
        model, variables, cfg = load_for_eval(
            xp_dir, name=str(epoch) if epoch is not None else None,
            overrides=dict(nt_pred=NT_PRED, data_dir=data_dir))
    else:
        model, variables, cfg = model_bundle
    if test_set is None:
        test_set = TaxiBJ.make_datasets(data_dir,
                                        len_closeness=cfg.nt_cond + NT_PRED,
                                        nt_cond=cfg.nt_cond)[1]
    ev = Evaluator(model, variables, mesh=mesh)
    nt_cond, offset = cfg.nt_cond, cfg.offset

    horizon = (NT_PRED + nt_cond) if offset else NT_PRED
    bn_reestimate_pass(ev, test_set, min(batch_size, len(test_set)), horizon,
                       bn_reestimate)
    archive = None
    if save_arrays:
        from spatiotemporal_variable_separation_tpu.eval.common import FrameArchive

        archive = FrameArchive()
    from spatiotemporal_variable_separation_tpu.ops.metrics import frame_mse

    all_mse = []
    for idx, n_real in batch_indices(len(test_set),
                                     min(batch_size, len(test_set)), max_batches):
        items = [test_set[i] for i in idx]
        cond = np.stack([c for c, _ in items])
        target = np.stack([t for _, t in items])
        # per-frame MSE reduced on device: only (B, T) scalars are fetched;
        # the forecast frames cross the tunnel only on the archive path.
        if offset:
            pred_dev = ev.forecast(cond, target.shape[1] + nt_cond)[0][:, nt_cond:]
        else:
            pred_dev = ev.forecast(cond, target.shape[1])[0]
        seq_mse = np.asarray(frame_mse(pred_dev, jnp.asarray(target)),
                             np.float64)[:n_real]
        all_mse.append(seq_mse)
        if archive is not None:
            archive.add(cond[:n_real], target[:n_real],
                        np.asarray(pred_dev[:n_real], np.float32),
                        mse=seq_mse[:, :NT_PRED].mean(axis=1))
    if archive is not None:
        archive.save(xp_dir)
    mse_array = np.concatenate(all_mse, axis=0)
    return {"mse_t4": float(mse_array.mean(axis=0)[:NT_PRED].mean())}
