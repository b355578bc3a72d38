"""3D Chairs disentanglement evaluation
(reference ``var_sep/test/chairs/test_disentanglement.py``).

For each test index: pick a random *content* chair at a random start, take
S from it; dynamics come from the canonical test sequence at that index;
the ground-truth swap is the content chair rendered with the test
sequence's start id (single object, so the best-over-permutations metric
reduces to a plain metric)."""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

from spatiotemporal_variable_separation_tpu.checkpoint import load_for_eval
from spatiotemporal_variable_separation_tpu.data.chairs import Chairs
from spatiotemporal_variable_separation_tpu.eval.common import (
    EvalProgress,
    Evaluator,
    batch_indices,
    bn_reestimate_pass,
)


class SwapDataset(Chairs):
    """(``test_disentanglement.py:36-49``)"""

    def __init__(self, train, data_root, nt_cond, rng: np.random.RandomState,
                 seq_len=20, image_size=64, cache_frames=False):
        super().__init__(train, data_root, nt_cond, seq_len=seq_len,
                         image_size=image_size, cache_frames=cache_frames)
        # Pre-draw the per-index content choices at construction.  The
        # legacy RandomState consumes its stream identically whether drawn
        # one scalar at a time or up front, so sequential access sees the
        # same values as the draw-on-access variant — but ``__getitem__``
        # becomes a pure function of the index, which chunk-level eval
        # resume requires (skipped batches must not shift later draws) and
        # which makes the padded last batch's repeated index return the
        # same content chair instead of consuming fresh draws.
        n = len(self)
        self._draws = [(rng.randint(self.stop_idx - self.start_idx),
                        rng.randint(self.max_length - self.seq_len))
                       for _ in range(n)]

    def __getitem__(self, index):
        idx_content, id_st_content = self._draws[index]
        seq = self.get_sequence(index, chosen_idx=idx_content,
                                chosen_id_st=id_st_content).astype(np.float32) / 255.0
        seq_swap = self.get_sequence(index, chosen_idx=idx_content
                                     ).astype(np.float32) / 255.0
        return (seq[: self.nt_cond], seq[self.nt_cond:],
                seq_swap[: self.nt_cond], seq_swap[self.nt_cond:])


def evaluate(xp_dir: str, data_dir: str, nt_pred: int, batch_size: int = 16,
             test_seed: int = 1, epoch: Optional[int] = None,
             max_batches: Optional[int] = None, model_bundle=None,
             mesh=None, bn_reestimate: int = 0,
             resume: bool = False) -> Dict[str, float]:
    if model_bundle is None:
        model, variables, cfg = load_for_eval(
            xp_dir, name=str(epoch) if epoch is not None else None,
            overrides=dict(nt_pred=nt_pred, data_dir=data_dir))
    else:
        model, variables, cfg = model_bundle
    ev = Evaluator(model, variables, mesh=mesh)
    nt_cond = cfg.nt_cond
    nt_test = nt_cond + nt_pred
    rng = np.random.RandomState(test_seed)

    shared_cache: dict = {}  # both datasets read the same test-split files
    test_set = Chairs(False, data_dir, nt_cond, seq_len=nt_test,
                      cache_frames=shared_cache)
    swap_set = SwapDataset(False, data_dir, nt_cond, rng, seq_len=nt_test,
                           cache_frames=shared_cache)

    bn_reestimate_pass(ev, test_set, batch_size, nt_test, bn_reestimate)
    n = len(test_set)
    prog = EvalProgress(
        xp_dir, f"chairs_swap_t{nt_pred}",
        meta=dict(n=n, batch_size=min(batch_size, n), nt_pred=nt_pred,
                  nt_cond=nt_cond, test_seed=test_seed,
                  epoch=-1 if epoch is None else epoch,
                  max_batches=max_batches or 0, bn_reestimate=bn_reestimate),
        resume=resume)
    for b, (idx, n_real) in enumerate(
            batch_indices(n, min(batch_size, n), max_batches)):
        if prog.skip(b):
            continue
        swap_items = [swap_set[i] for i in idx]
        x_cond = np.stack([it[0] for it in swap_items])     # content sequence
        gt_swap = np.stack([it[3] for it in swap_items])    # content w/ test dynamics
        test_cond = np.stack([test_set[i][0] for i in idx])

        # fused device program: S from content, dynamics from test, metrics
        # reduced on device — no frame stack ever crosses the tunnel (the
        # round-4 freeze hit exactly this protocol's first rollout fetch).
        mets, _ = ev.score_swap(x_cond, test_cond, gt_swap, nt_skip=nt_cond)
        prog.add(b, {k: v[:n_real] for k, v in mets.items()})

    results = prog.arrays()
    means = {k: float(v.mean()) for k, v in results.items()}
    np.savez_compressed(os.path.join(xp_dir, "results_swap.npz"), **results)
    prog.finalize()
    return means
