"""Moving MNIST evaluation (reference ``var_sep/test/mnist/test.py``).

Per batch: rollout to ``nt_cond + nt_pred``, keep the prediction window,
compute per-sequence MSE/PSNR/SSIM, and produce content swaps by decoding a
train batch's dynamics with the test batch's S code.  Archived npz files
match the reference's names/fields.

Deliberate fix (documented divergence): the reference slices the swap
prediction with ``xp_config.dt``, a key that doesn't exist, so its DotDict
yields None and *all* frames are kept (``test.py:132``, SURVEY.md §2
quirks); we slice with ``nt_cond`` as intended."""

from __future__ import annotations

import os
from collections import defaultdict
from typing import Dict, Optional

import numpy as np

from spatiotemporal_variable_separation_tpu.checkpoint import load_for_eval
from spatiotemporal_variable_separation_tpu.data.moving_mnist import MovingMNIST
from spatiotemporal_variable_separation_tpu.eval.common import (
    Evaluator,
    batch_indices,
    bn_reestimate_pass,
    pixel_metrics,
    to_uint8_nchw_last,
)


def evaluate(xp_dir: str, data_dir: str, nt_pred: int, batch_size: int = 16,
             test_seed: int = 1, epoch: Optional[int] = None,
             save_arrays: bool = True, max_batches: Optional[int] = None,
             model_bundle=None, mesh=None,
             bn_reestimate: int = 0) -> Dict[str, float]:
    if model_bundle is None:
        model, variables, cfg = load_for_eval(
            xp_dir, name=str(epoch) if epoch is not None else None,
            overrides=dict(nt_pred=nt_pred, data_dir=data_dir))
    else:
        model, variables, cfg = model_bundle
    ev = Evaluator(model, variables, mesh=mesh)
    nt_cond = cfg.nt_cond
    nt_test = nt_cond + nt_pred

    test_set = MovingMNIST.make_dataset(data_dir, 64, nt_cond, nt_test, 4,
                                        True, cfg.n_object, train=False)
    train_set = MovingMNIST.make_dataset(data_dir, 64, nt_cond, nt_test, 4,
                                         True, cfg.n_object, train=True,
                                         seed=test_seed,
                                         synthetic_fallback=model_bundle is not None)

    bn_reestimate_pass(ev, test_set, batch_size, nt_test, bn_reestimate)
    results = defaultdict(list)
    arch = defaultdict(list)
    for idx, n_real in batch_indices(len(test_set), batch_size, max_batches):
        items = [test_set[i] for i in idx]
        cond = np.stack([c for c, _ in items])
        target = np.stack([t for _, t in items])

        pred_full, s_code = ev.forecast(cond, nt_test)
        pred = np.asarray(pred_full[:, nt_cond:], np.float32)

        # content swap: train dynamics + test S
        swap = train_set.generate_batch(len(cond))
        swap_cond = swap[:, :nt_cond]
        swap_pred_full, _ = ev.forecast(swap_cond, nt_test, init_s_code=s_code)
        swap_pred = np.asarray(swap_pred_full[:, nt_cond:], np.float32)

        for k, v in pixel_metrics(pred, target).items():
            results[k].append(v[:n_real])
        if save_arrays:
            arch["cond"].append(to_uint8_nchw_last(cond[:n_real]))
            arch["gt"].append(to_uint8_nchw_last(target[:n_real]))
            arch["predictions"].append(to_uint8_nchw_last(pred[:n_real]))
            arch["content_swap"].append(to_uint8_nchw_last(swap_pred[:n_real]))
            arch["cond_swap"].append(to_uint8_nchw_last(swap_cond[:n_real]))
            arch["target_swap"].append(to_uint8_nchw_last(swap[:n_real, nt_cond:]))

    means = {k: float(np.concatenate(v).mean()) for k, v in results.items()}
    if save_arrays:
        np.savez_compressed(os.path.join(xp_dir, "results.npz"),
                            **{k: np.concatenate(v) for k, v in results.items()})
        for key, fname in [("predictions", "predictions.npz"), ("gt", "gt.npz"),
                           ("cond", "cond.npz"), ("content_swap", "content_swap.npz"),
                           ("cond_swap", "cond_swap.npz"),
                           ("target_swap", "target_swap.npz")]:
            np.savez_compressed(os.path.join(xp_dir, fname),
                                **{key: np.concatenate(arch[key])})
    return means
