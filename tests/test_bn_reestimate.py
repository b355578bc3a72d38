"""BN re-estimation (SWA update_bn-style recalibration) for evaluation.

``Evaluator.reestimate_batch_stats`` refreshes the running stats from
forward rollouts; the eval CLIs expose it as ``--bn_reestimate N``
(default 0 = reference-parity protocol). See the method docstring for the
measured scope: it repairs genuinely stale statistics, not the
mid-training train/eval-mode gap caused by per-rollout-step activation
heterogeneity."""

import numpy as np

import jax

from spatiotemporal_variable_separation_tpu.core.config import ExperimentConfig
from spatiotemporal_variable_separation_tpu.eval.common import (
    Evaluator,
    bn_reestimate_pass,
)
from spatiotemporal_variable_separation_tpu.models.factory import (
    build_separable_network,
)


def _tiny_conv_cfg():
    return ExperimentConfig(
        data="mnist", architecture="dcgan", code_size_s=8, code_size_t=4,
        enc_hidden_size=8, dec_hidden_size=8, res_hidden_size=8, n_blocks=1,
        nt_cond=2, nt_pred=2, offset=2, batch_size=4, precision="f32",
        seed=0).validate()


def _bundle():
    cfg = _tiny_conv_cfg()
    model = build_separable_network(cfg)
    cond = np.zeros((4, 2, 64, 64, 1), np.float32)
    variables = model.init(jax.random.PRNGKey(0), cond, 2, train=False,
                           method=model.get_forecast)
    return cfg, model, {"params": variables["params"],
                        "batch_stats": variables["batch_stats"]}


def test_reestimate_updates_stats_and_output():
    cfg, model, variables = _bundle()
    ev = Evaluator(model, variables)
    rng = np.random.RandomState(0)
    cond = rng.rand(4, 2, 64, 64, 1).astype(np.float32)
    before = np.asarray(ev.forecast(cond, 4)[0])
    stats_before = jax.tree_util.tree_leaves(ev.variables["batch_stats"])

    n = ev.reestimate_batch_stats(
        [rng.rand(4, 2, 64, 64, 1).astype(np.float32) for _ in range(3)], 4)
    assert n == 3
    stats_after = jax.tree_util.tree_leaves(ev.variables["batch_stats"])
    changed = any(not np.allclose(a, b)
                  for a, b in zip(stats_before, stats_after))
    assert changed, "running stats unchanged after re-estimation"
    after = np.asarray(ev.forecast(cond, 4)[0])
    assert not np.allclose(before, after), "eval output unaffected by stats"
    # params must be untouched — only the statistics move
    assert ev.variables["params"] is variables["params"]


def test_pass_noop_when_zero():
    cfg, model, variables = _bundle()
    ev = Evaluator(model, variables)

    class DS:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            return (np.zeros((2, 64, 64, 1), np.float32),
                    np.zeros((2, 64, 64, 1), np.float32))

    assert bn_reestimate_pass(ev, DS(), 4, 4, 0) == 0
    assert ev.variables is variables or ev.variables == variables


def test_pass_consumes_dataset_batches():
    cfg, model, variables = _bundle()
    ev = Evaluator(model, variables)
    rng = np.random.RandomState(1)

    class DS:
        def __len__(self):
            return 16

        def __getitem__(self, i):
            r = np.random.RandomState(i)
            return (r.rand(2, 64, 64, 1).astype(np.float32),
                    np.zeros((2, 64, 64, 1), np.float32))

    assert bn_reestimate_pass(ev, DS(), 4, 4, 2) == 2


def test_noop_without_batch_stats():
    # MLP architectures have no BN: reestimate must return 0 untouched
    cfg = ExperimentConfig(
        data="wave", architecture="mlp", mixing="mul", code_size_s=8,
        code_size_t=8, enc_hidden_size=8, dec_hidden_size=8,
        res_hidden_size=8, nt_cond=2, nt_pred=2, offset=2, batch_size=4,
        precision="f32", seed=0).validate()
    model = build_separable_network(cfg)
    cond = np.zeros((4, 2, 64, 64, 1), np.float32)
    variables = model.init(jax.random.PRNGKey(0), cond, 2, train=False,
                           method=model.get_forecast)
    ev = Evaluator(model, dict(variables))
    assert ev.reestimate_batch_stats([cond], 4) == 0
