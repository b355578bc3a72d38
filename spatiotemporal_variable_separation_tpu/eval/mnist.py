"""Moving MNIST evaluation (reference ``var_sep/test/mnist/test.py``).

Per batch: one fused device program rolls out to ``nt_cond + nt_pred``,
slices the prediction window and reduces per-sequence MSE/PSNR/SSIM on
device — only O(batch) metric scalars cross the device->host tunnel
(freeze-resistant eval path; the frame stacks the reference fetches per
batch, ``test.py:110-147``, stay device-resident).  Content swaps (a train
batch's dynamics decoded with the test batch's S code) are produced only
for the archive path, which is the one opt-in big fetch.

Completed batches checkpoint their metric rows to a progress file, so a
supervised rerun with ``resume=True`` continues where a killed/frozen run
stopped (chunk-level auto-resume; see ``eval.common.EvalProgress``).

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
    EvalProgress,
    Evaluator,
    batch_indices,
    bn_reestimate_pass,
    to_uint8_nchw_last,
)


def evaluate(xp_dir: str, data_dir: str, nt_pred: int, batch_size: int = 16,
             test_seed: int = 1, epoch: Optional[int] = None,
             save_arrays: bool = True, max_batches: Optional[int] = None,
             model_bundle=None, mesh=None,
             bn_reestimate: int = 0, resume: bool = False,
             archive_cap: int = 0) -> Dict[str, float]:
    """``archive_cap``: cap the archived npz files to the first N sequences
    (0 = all, the reference's behavior, ``test.py:162-168``).  The 5,000
    -sequence 95-frame protocol would otherwise archive ~12 GB of uint8
    frames; metrics always cover every sequence regardless.

    On ``resume`` after a partial run, archives cover only the batches
    scored since the resume point (metric results stay complete — they are
    checkpointed per batch)."""
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
    prog = EvalProgress(
        xp_dir, f"mnist_t{nt_pred}",
        meta=dict(n=len(test_set), batch_size=batch_size, nt_pred=nt_pred,
                  nt_cond=nt_cond, epoch=-1 if epoch is None else epoch,
                  max_batches=max_batches or 0, bn_reestimate=bn_reestimate),
        resume=resume)
    if prog.done and save_arrays:
        print(f"[eval] note: resuming at batch {prog.done} — archived npz "
              "arrays will cover only the remaining batches")
    arch = defaultdict(list)
    archived = 0
    for b, (idx, n_real) in enumerate(
            batch_indices(len(test_set), batch_size, max_batches)):
        if prog.skip(b):
            continue
        items = [test_set[i] for i in idx]
        cond = np.stack([c for c, _ in items])
        target = np.stack([t for _, t in items])

        mets, pred_dev, s_code = ev.score(cond, target, nt_skip=nt_cond)

        if save_arrays and (archive_cap == 0 or archived < archive_cap):
            take = n_real if archive_cap == 0 \
                else min(n_real, archive_cap - archived)
            pred = np.asarray(pred_dev, np.float32)
            # content swap: train dynamics + test S (archive-only artifact)
            swap = train_set.generate_batch(len(cond))
            swap_cond = swap[:, :nt_cond]
            swap_pred_full, _ = ev.forecast(swap_cond, nt_test,
                                            init_s_code=s_code)
            swap_pred = np.asarray(swap_pred_full[:, nt_cond:], np.float32)
            arch["cond"].append(to_uint8_nchw_last(cond[:take]))
            arch["gt"].append(to_uint8_nchw_last(target[:take]))
            arch["predictions"].append(to_uint8_nchw_last(pred[:take]))
            arch["content_swap"].append(to_uint8_nchw_last(swap_pred[:take]))
            arch["cond_swap"].append(to_uint8_nchw_last(swap_cond[:take]))
            arch["target_swap"].append(
                to_uint8_nchw_last(swap[:take, nt_cond:]))
            archived += take

        prog.add(b, {k: v[:n_real] for k, v in mets.items()})

    results = prog.arrays()
    means = {k: float(v.mean()) for k, v in results.items()}
    # per-sequence metric arrays are a few KB — archived unconditionally
    # (reference parity, test.py:152-157); only the frame stacks are gated.
    np.savez_compressed(os.path.join(xp_dir, "results.npz"), **results)
    if save_arrays:
        for key, fname in [("predictions", "predictions.npz"), ("gt", "gt.npz"),
                           ("cond", "cond.npz"), ("content_swap", "content_swap.npz"),
                           ("cond_swap", "cond_swap.npz"),
                           ("target_swap", "target_swap.npz")]:
            np.savez_compressed(os.path.join(xp_dir, fname),
                                **{key: np.concatenate(arch[key])
                                   if arch[key] else
                                   np.zeros((0,), np.uint8)})
    prog.finalize()
    return means
