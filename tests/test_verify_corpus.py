"""cli.verify_corpus: the "drop files, run two commands" promise.

Every benchmark's verifier must pass against a structurally-faithful
stand-in corpus (the same generators round-2's full recipe runs trained
on), must fail loudly on an empty directory, and must print the exact
reproduction commands on success.
"""

import numpy as np
import pytest

import spatiotemporal_variable_separation_tpu.data.synthetic_corpora as sc
from spatiotemporal_variable_separation_tpu.cli import verify_corpus
from spatiotemporal_variable_separation_tpu.data.moving_mnist import make_test_set
from spatiotemporal_variable_separation_tpu.data.wave_eq import (
    generate_dataset,
    generate_pixels,
)


def _run(benchmark, data_dir, **kw):
    lines = []
    ok = verify_corpus.verify(benchmark, str(data_dir),
                              log_fn=lines.append, **kw)
    return ok, "\n".join(lines)


def test_taxibj_standin_passes(tmp_path):
    # the paper protocol reserves 48*7*4 frames for test, so the corpus
    # needs > 28 complete days per the reference's slice.
    sc.make_taxibj(str(tmp_path), days_per_year=40)
    ok, out = _run("taxibj", tmp_path)
    assert ok, out
    assert "corpus ready" in out and "cli.test_taxibj" in out


def test_sst_standin_passes(tmp_path):
    zones = list(range(1, 30))  # eval protocol needs held-out zones 17-20
    sc.make_sst(str(tmp_path), zones=zones, n_days=80)
    ok, out = _run("sst", tmp_path, zones=zones)
    assert ok, out
    assert "corpus ready" in out


def test_chairs_standin_passes(tmp_path):
    sc.make_chairs(str(tmp_path), n_objects=20)
    ok, out = _run("chairs", tmp_path)
    assert ok, out


def test_mnist_standin_passes(tmp_path):
    sc.make_mnist_standin(str(tmp_path), seed=3, n_test=100)
    make_test_set(str(tmp_path))
    ok, out = _run("mnist", tmp_path)
    assert ok, out
    assert "test_mnist_disentanglement" in out


def test_mnist_missing_testset_fails_with_fix_command(tmp_path):
    sc.make_mnist_standin(str(tmp_path), seed=3, n_test=100)
    ok, out = _run("mnist", tmp_path)
    assert not ok
    assert "make_mnist_test" in out  # tells the user the exact fix
    assert "corpus ready" not in out


def test_wave_and_partial_pass(tmp_path):
    generate_dataset(str(tmp_path), size=5, seq_len=100, batch=5)
    ok, out = _run("wave", tmp_path)
    assert ok, out
    # wave_partial additionally needs pixels.npz
    ok, out = _run("wave_partial", tmp_path)
    assert not ok and "gen_pixels" in out
    generate_pixels(str(tmp_path), number=100)
    ok, out = _run("wave_partial", tmp_path)
    assert ok, out


def test_empty_dir_fails(tmp_path):
    for benchmark in ("mnist", "chairs", "taxibj", "sst", "wave"):
        ok, out = _run(benchmark, tmp_path)
        assert not ok, benchmark
        assert "FAIL" in out


def test_cli_exit_codes(tmp_path):
    generate_dataset(str(tmp_path), size=5, seq_len=100, batch=5)
    assert verify_corpus.main(["wave", "--data_dir", str(tmp_path)]) == 0
    assert verify_corpus.main(["taxibj", "--data_dir", str(tmp_path)]) == 1


class _Parsed(Exception):
    """Sentinel raised right after a successful real argparse parse."""


def test_printed_commands_parse_against_real_clis(monkeypatch):
    """Every reproduction command verify_corpus prints must be accepted by
    the argparse tree of the CLI it names (a chairs eval command once
    omitted the required --nt_pred and would have crashed as printed)."""
    import argparse
    import importlib
    import shlex

    real = argparse.ArgumentParser.parse_args

    def probe(self, args=None, namespace=None):
        ns = real(self, args, namespace)
        raise _Parsed(ns)

    monkeypatch.setattr(argparse.ArgumentParser, "parse_args", probe)
    for train_cmd, eval_cmds in verify_corpus.RECIPES.values():
        for cmd in [train_cmd] + eval_cmds:
            argv = shlex.split(cmd.format(d="/tmp/d", x="/tmp/x"))
            assert argv[:2] == ["python", "-m"], cmd
            mod = importlib.import_module(argv[2])
            with pytest.raises(_Parsed):
                mod.main(argv[3:])
