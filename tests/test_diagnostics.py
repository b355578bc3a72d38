"""Stability diagnostics: the probe must (a) report ~unit gain and healthy
BN on a fresh model, (b) flag a manufactured runaway (amplified integrator
weights / blown BN running var) — the exact signatures of the measured
bf16 failure mode in BASELINE.md."""

import json

import numpy as np
import pytest

import jax

from spatiotemporal_variable_separation_tpu.core.config import ExperimentConfig
from spatiotemporal_variable_separation_tpu.eval.diagnostics import (
    bn_health,
    diagnose,
    is_unstable,
    protocol_horizon,
    rollout_probe,
)
from spatiotemporal_variable_separation_tpu.models.factory import (
    build_separable_network,
)


def _tiny_cfg(**kw):
    base = dict(data="mnist", architecture="dcgan", code_size_s=16,
                code_size_t=8, enc_hidden_size=8, dec_hidden_size=8,
                res_hidden_size=16, n_blocks=1, nt_cond=2, nt_pred=2,
                offset=2, batch_size=4, precision="f32", seed=0)
    base.update(kw)
    return ExperimentConfig(**base)


@pytest.fixture(scope="module")
def model_and_vars():
    cfg = _tiny_cfg()
    model = build_separable_network(cfg)
    cond = np.random.RandomState(0).rand(
        4, cfg.nt_cond, *cfg.frame_shape).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), cond, 2, train=False)
    return cfg, model, variables, cond


def test_probe_shapes_and_fresh_model_health(model_and_vars):
    cfg, model, variables, cond = model_and_vars
    rep = rollout_probe(model, variables, cond, n_steps=6)
    assert rep["t_norms"].shape == (7,) and rep["gains"].shape == (6,)
    assert rep["gain_geomean"] > 0
    full = diagnose(model, variables, cond, n_steps=6, horizon=95)
    assert full["projected_growth_at_horizon"] == pytest.approx(
        full["gain_geomean"] ** 95)
    assert full["bn"]["n_layers"] > 0
    assert full["bn"]["max_var"] < 100  # fresh BN stats start at 1


def test_flags_amplified_integrator(model_and_vars):
    cfg, model, variables, cond = model_and_vars
    # scale every integrator kernel: x + MLP(x) with big MLP output has
    # gain >> 1 per step -> must trip the verdict
    params = variables["params"]
    blown = jax.tree_util.tree_map(lambda x: x * 25.0, params["t_resnet"])
    bad = dict(variables, params=dict(params, t_resnet=blown))
    rep = diagnose(model, bad, cond, n_steps=6, horizon=95)
    good = diagnose(model, variables, cond, n_steps=6, horizon=95)
    assert rep["gain_geomean"] > good["gain_geomean"]
    assert rep["gain_geomean"] > 1.15 and rep["verdict"] == "UNSTABLE"


def test_bn_health_flags_blown_running_var(model_and_vars):
    cfg, model, variables, cond = model_and_vars
    stats = variables["batch_stats"]
    blown = jax.tree_util.tree_map(lambda x: x + 1e29 if x.ndim else x, stats)
    rep = bn_health(dict(variables, batch_stats=blown))
    assert rep["max_var"] > 1e28
    assert diagnose(model, dict(variables, batch_stats=blown), cond,
                    n_steps=3)["verdict"] == "UNSTABLE"


def test_diagnose_cli_on_trained_xp(tmp_path, capsys):
    # end-to-end: save a checkpoint the CLI can load, then diagnose it
    import optax

    from spatiotemporal_variable_separation_tpu import checkpoint as ckpt
    from spatiotemporal_variable_separation_tpu.cli import diagnose as cli
    from spatiotemporal_variable_separation_tpu.train.state import (
        create_train_state,
    )

    cfg = _tiny_cfg()
    model = build_separable_network(cfg)
    state = create_train_state(model, cfg, optax.adam(1e-3))
    (tmp_path / "params.json").write_text(cfg.to_json())
    ckpt.save_checkpoint(str(tmp_path), state, "final")
    cli.main(["--xp_dir", str(tmp_path), "--n_steps", "4", "--epoch", "all",
              "--batch_size", "2"])
    out = capsys.readouterr().out
    assert "checkpoint final" in out and "verdict" in out
    line = [l for l in out.splitlines() if l.startswith("{")][-1]
    parsed = json.loads(line)
    assert parsed["verdict"] in ("ok", "UNSTABLE")
    assert parsed["projected_growth"] > 0


def test_horizon_aware_verdict():
    """The gain criterion judges compounded growth over the protocol
    horizon: a healthy short-horizon recipe (measured TaxiBJ probe: gain
    ~1.28, 4-step protocol) must NOT be flagged, while the same per-step
    gain over MNIST's 95-step protocol must."""
    assert not is_unstable(1.28, bn_max_var=400.0, horizon=4)
    assert is_unstable(1.28, bn_max_var=400.0, horizon=95)
    # healthy converged MNIST probes (gain 1.01-1.03) stay healthy at 95.
    assert not is_unstable(1.03, bn_max_var=10.0, horizon=95)
    # the measured runaway signature trips every formulation.
    assert is_unstable(1.43, bn_max_var=10.0, horizon=95)
    assert is_unstable(1.43, bn_max_var=10.0)  # legacy fixed threshold
    # BN / |S| criteria are horizon-independent.
    assert is_unstable(1.0, bn_max_var=1e7, horizon=4)
    assert is_unstable(1.0, bn_max_var=1.0, s_mean_abs=600.0, horizon=4)
    # a wildly divergent probe (gain**horizon would overflow a Python
    # float and raise OverflowError under naive exponentiation) must be
    # flagged, not crash the monitor mid-training.
    assert is_unstable(2600.0, bn_max_var=1.0, horizon=95)


def test_projected_growth_saturates():
    from spatiotemporal_variable_separation_tpu.eval.diagnostics import (
        projected_growth,
    )

    assert projected_growth(1.03, 95) == pytest.approx(1.03 ** 95)
    assert projected_growth(2600.0, 95) == float("inf")
    assert projected_growth(0.0, 95) == 0.0


def test_protocol_horizon_mapping():
    assert protocol_horizon("mnist") == 95
    assert protocol_horizon("wave") == 40
    assert protocol_horizon("wave_partial") == 40
    assert protocol_horizon("sst") == 10
    assert protocol_horizon("taxibj") == 4
    # unknown datasets fall back to the training nt_pred, floored at 10.
    assert protocol_horizon("chairs", nt_pred=25) == 25
    assert protocol_horizon("chairs", nt_pred=3) == 10
