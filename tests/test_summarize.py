"""Run-summary CLI digest: config echo, checkpoint listing, curve points."""

import json
import os

from spatiotemporal_variable_separation_tpu.cli.summarize import summarize


def test_summarize_digest(tmp_path):
    xp = tmp_path / "xp"
    (xp / "checkpoints" / "10").mkdir(parents=True)
    (xp / "checkpoints" / "final").mkdir()
    (xp / "params.json").write_text(json.dumps(
        {"data": "wave", "architecture": "mlp", "epochs": 2,
         "batch_size": 8, "precision": "f32", "steps_per_epoch": 3}))
    with open(xp / "metrics.csv", "w") as f:
        f.write("step,wall_s,ae,forecast,loss,s_inv,t_reg,samples_per_sec\n")
        for s in range(1, 7):
            f.write(f"{s},{s}.0,{0.1/s},{0.2/s},{1.0/s},{0.01/s},{2.0/s},"
                    f"{100+s}\n")
        f.write("7,7.0,bad,row,,,,\n")  # partial line from a killed writer
    lines = []
    out = summarize(str(xp), points=3, log_fn=lines.append)
    assert out["checkpoints"] == ["final", "10"]
    assert out["steps_logged"] == 6
    assert out["samples_per_sec_median"] == 104
    assert out["curve"][0]["step"] == 1 and out["curve"][-1]["step"] == 6
    text = "\n".join(lines)
    assert "wave/mlp" in text and "throughput" in text


def test_summarize_empty_dir(tmp_path):
    lines = []
    out = summarize(str(tmp_path), log_fn=lines.append)
    assert "curve" not in out
    assert any("no metrics.csv" in l for l in lines)


def test_summarize_shows_evals(tmp_path):
    (tmp_path / "params.json").write_text(json.dumps({"data": "wave"}))
    (tmp_path / "evals.json").write_text(json.dumps(
        {"wave": {"mse_t40": 7.9e-05, "epoch": None, "unix_time": 1.0}}))
    lines = []
    out = summarize(str(tmp_path), log_fn=lines.append)
    assert out["evals"]["wave"]["mse_t40"] == 7.9e-05
    text = "\n".join(lines)
    assert "eval wave: mse_t40=7.9e-05" in text
    assert "unix_time" not in text


def test_summarize_all_aggregates(tmp_path):
    from spatiotemporal_variable_separation_tpu.cli.summarize import summarize_all

    for name, data in (("a_wave", "wave"), ("b_mnist", "mnist")):
        xp = tmp_path / name
        xp.mkdir()
        (xp / "params.json").write_text(json.dumps(
            {"data": data, "architecture": "mlp", "precision": "f32"}))
    (tmp_path / "a_wave" / "evals.json").write_text(json.dumps(
        {"wave": {"mse_t40": 1e-4, "unix_time": 1.0}}))
    (tmp_path / "not_an_xp").mkdir()  # no params.json: skipped
    lines = []
    rows = summarize_all(str(tmp_path), log_fn=lines.append)
    assert [r["name"] for r in rows] == ["a_wave", "b_mnist"]
    text = "\n".join(lines)
    assert "a_wave" in text and "wave/mlp" in text
    assert "mse_t40=0.0001" in text
    assert "not_an_xp" not in text


def test_summarize_all_empty_root(tmp_path):
    from spatiotemporal_variable_separation_tpu.cli.summarize import summarize_all

    lines = []
    assert summarize_all(str(tmp_path), log_fn=lines.append) == []
    assert any("no experiment dirs" in l for l in lines)


def test_summarize_all_tolerates_corrupt_params(tmp_path):
    # A truncated params.json (killed writer) must not abort the aggregation.
    from spatiotemporal_variable_separation_tpu.cli.summarize import summarize_all

    ok = tmp_path / "good"
    ok.mkdir()
    (ok / "params.json").write_text(json.dumps({"data": "wave"}))
    bad = tmp_path / "broken"
    bad.mkdir()
    (bad / "params.json").write_text('{"data": "wa')  # truncated
    lines = []
    rows = summarize_all(str(tmp_path), log_fn=lines.append)
    assert [r["name"] for r in rows] == ["good"]
    assert any("broken" in l and "unreadable" in l for l in lines)


def test_summarize_hides_run_metadata_from_metric_lines(tmp_path):
    # evals.json extras (ints/bools/lists) are metadata, not metrics.
    (tmp_path / "params.json").write_text(json.dumps({"data": "sst"}))
    (tmp_path / "evals.json").write_text(json.dumps(
        {"sst": {"mse_t10": 1.5, "epoch": None, "bn_reestimate": 0,
                 "reference_broadcast": False, "zones": [17, 18],
                 "unix_time": 1.0}}))
    lines = []
    summarize(str(tmp_path), log_fn=lines.append)
    text = "\n".join(lines)
    assert "mse_t10=1.5" in text
    for meta in ("bn_reestimate", "reference_broadcast", "zones", "unix_time"):
        assert meta not in text
