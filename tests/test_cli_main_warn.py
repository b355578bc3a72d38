"""Train-CLI startup warning for long horizons without ``--remat``
(measured basis: BASELINE.md "Round-5: long-horizon-under-grad" — the
un-rematerialized t+95 rollout-under-grad OOMs at the flagship batch)."""

import pytest


@pytest.fixture
def stubbed_training(monkeypatch):
    """Stub the heavy tail of cli.main so only the argument/startup path
    runs; returns the list of configs run_training was called with."""
    from spatiotemporal_variable_separation_tpu.train import loop
    from spatiotemporal_variable_separation_tpu.utils import compile_cache

    calls = []
    monkeypatch.setattr(loop, "run_training",
                        lambda cfg, **kw: calls.append(cfg))
    monkeypatch.setattr(compile_cache, "enable_compilation_cache",
                        lambda *a, **kw: None)
    return calls


def _run(tmp_path, extra):
    from spatiotemporal_variable_separation_tpu.cli.main import main

    main(["--xp_dir", str(tmp_path / "xp"), "--data_dir", str(tmp_path),
          "--data", "mnist"] + extra)


def test_warns_on_long_horizon_without_remat(tmp_path, capsys,
                                             stubbed_training):
    _run(tmp_path, ["--nt_pred", "95"])
    out = capsys.readouterr().out
    assert "[warn] long training horizon" in out
    assert "--remat" in out
    assert len(stubbed_training) == 1


@pytest.mark.parametrize("extra", [["--nt_pred", "95", "--remat"], []])
def test_no_warning_when_remat_or_short(tmp_path, capsys, stubbed_training,
                                        extra):
    _run(tmp_path, extra)
    assert "[warn] long training horizon" not in capsys.readouterr().out
    assert len(stubbed_training) == 1
