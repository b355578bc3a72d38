"""Checkpoint round-trip, resume, eval-protocol, and graft-entry tests."""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spatiotemporal_variable_separation_tpu.checkpoint import (
    list_checkpoints,
    load_for_eval,
    restore_checkpoint,
    save_checkpoint,
)
from spatiotemporal_variable_separation_tpu.core.config import ExperimentConfig
from spatiotemporal_variable_separation_tpu.models.factory import build_separable_network
from spatiotemporal_variable_separation_tpu.train.state import create_train_state
from spatiotemporal_variable_separation_tpu.train.step import make_optimizer, make_train_step


def wave_cfg(tmp, **kw):
    base = dict(data="wave", architecture="mlp", mixing="mul", code_size_s=16,
                code_size_t=16, enc_hidden_size=32, dec_hidden_size=32,
                res_hidden_size=32, n_blocks=1, nt_cond=4, nt_pred=3, offset=4,
                precision="f32", batch_size=8, xp_dir=str(tmp))
    base.update(kw)
    return ExperimentConfig(**base)


def _trained_state(cfg, n_steps=2):
    model = build_separable_network(cfg)
    tx = make_optimizer(cfg, 10)
    state = create_train_state(model, cfg, tx)
    step = make_train_step(model, cfg, tx)
    rng = np.random.default_rng(0)
    seq = rng.random((cfg.batch_size, 7) + cfg.frame_shape).astype(np.float32)
    for _ in range(n_steps):
        state, _ = step(state, jnp.asarray(seq[:, :4]), jnp.asarray(seq[:, 4:]))
    return model, tx, state


def test_checkpoint_roundtrip(tmp_path):
    cfg = wave_cfg(tmp_path)
    model, tx, state = _trained_state(cfg)
    save_checkpoint(str(tmp_path), state)
    save_checkpoint(str(tmp_path), state, name="final")
    assert set(list_checkpoints(str(tmp_path))) == {"2", "final"}
    template = jax.eval_shape(lambda: create_train_state(model, cfg, tx))
    restored = restore_checkpoint(str(tmp_path), template)
    assert int(restored.step) == 2
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_interrupted_save_preserves_previous(tmp_path, monkeypatch):
    """A save that dies mid-write must not destroy the last good checkpoint.

    Regression: ocp.save(path, force=True) deletes the target before the
    (tunnel-slow) write begins, so a supervisor kill landing during a final
    save destroyed the previous 'final' (observed on a real TaxiBJ run).
    save_checkpoint now stages to a dot-prefixed sibling and swaps in."""
    import orbax.checkpoint as ocp

    cfg = wave_cfg(tmp_path)
    model, tx, state = _trained_state(cfg)
    save_checkpoint(str(tmp_path), state, name="final")
    state2 = state.replace(step=state.step + 100)

    real_save = ocp.StandardCheckpointer.save

    def dying_save(self, path, *a, **kw):
        os.makedirs(str(path), exist_ok=True)  # partial staging debris
        raise RuntimeError("killed mid-save")

    monkeypatch.setattr(ocp.StandardCheckpointer, "save", dying_save)
    with pytest.raises(RuntimeError):
        save_checkpoint(str(tmp_path), state2, name="final")
    monkeypatch.setattr(ocp.StandardCheckpointer, "save", real_save)

    # the previous 'final' is intact and the staging debris is invisible
    assert list_checkpoints(str(tmp_path)) == ["final"]
    template = jax.eval_shape(lambda: create_train_state(model, cfg, tx))
    restored = restore_checkpoint(str(tmp_path), template, name="final")
    assert int(restored.step) == int(state.step)

    # the next successful save overwrites and cleans its debris
    save_checkpoint(str(tmp_path), state2, name="final")
    assert list_checkpoints(str(tmp_path)) == ["final"]
    ckpt_root = os.path.join(str(tmp_path), "checkpoints")
    assert [n for n in os.listdir(ckpt_root) if n.startswith(".")] == []
    restored2 = restore_checkpoint(str(tmp_path), template, name="final")
    assert int(restored2.step) == int(state2.step)


def test_repair_leftovers_recovers_and_cleans(tmp_path):
    """Crash leftovers from ANY pid are recovered or removed.

    A kill between save_checkpoint's two commit renames leaves a complete
    marked .tmp (and/or a retired .old) with no visible checkpoint of that
    name; the repair sweep must adopt the complete copy instead of leaving
    resume to silently fall back to an older save, and must delete
    markerless staging debris so kill cycles cannot accumulate hidden
    full-size checkpoints."""
    import shutil

    from spatiotemporal_variable_separation_tpu import checkpoint as ckpt_mod

    cfg = wave_cfg(tmp_path)
    model, tx, state = _trained_state(cfg)
    save_checkpoint(str(tmp_path), state, name="final")
    ckdir = os.path.join(str(tmp_path), "checkpoints")

    # simulate a dead pid's kill-between-renames: a complete marked .tmp
    # next to a retired .old, no visible 'final'.
    os.rename(os.path.join(ckdir, "final"), os.path.join(ckdir, ".old.final.999"))
    shutil.copytree(os.path.join(ckdir, ".old.final.999"),
                    os.path.join(ckdir, ".tmp.final.999"))
    # plus markerless staging debris from yet another dead save
    os.makedirs(os.path.join(ckdir, ".tmp.final.1000"))
    # age everything past the live-writer guard
    for n in os.listdir(ckdir):
        p = os.path.join(ckdir, n)
        os.utime(p, (os.path.getmtime(p) - 2 * ckpt_mod._REPAIR_MIN_AGE_S,) * 2)

    assert list_checkpoints(str(tmp_path)) == ["final"]  # adopted the .tmp
    assert [n for n in os.listdir(ckdir) if n.startswith(".")] == []
    template = jax.eval_shape(lambda: create_train_state(model, cfg, tx))
    restored = restore_checkpoint(str(tmp_path), template, name="final")
    assert int(restored.step) == int(state.step)

    # a FRESH leftover (possible live writer mid-swap) is left alone
    os.makedirs(os.path.join(ckdir, ".tmp.final.1001"))
    list_checkpoints(str(tmp_path))
    assert os.path.isdir(os.path.join(ckdir, ".tmp.final.1001"))
    os.rmdir(os.path.join(ckdir, ".tmp.final.1001"))

    # kill landed after retiring the old save but before any staging was
    # complete: only the .old survives — it must be restored, not deleted.
    os.rename(os.path.join(ckdir, "final"), os.path.join(ckdir, ".old.final.999"))
    p = os.path.join(ckdir, ".old.final.999")
    os.utime(p, (os.path.getmtime(p) - 2 * ckpt_mod._REPAIR_MIN_AGE_S,) * 2)
    assert list_checkpoints(str(tmp_path)) == ["final"]
    restored = restore_checkpoint(str(tmp_path), template, name="final")
    assert int(restored.step) == int(state.step)


def test_restore_prefers_newest_not_stale_final(tmp_path):
    """A SIGKILLed segment leaves a stale 'final' from the previous run next
    to newer periodic saves; default restore must pick the newest one (the
    step recorded in the checkpoint meta marker), not lose the segment."""
    cfg = wave_cfg(tmp_path)
    model, tx, state = _trained_state(cfg, n_steps=2)
    ckdir = os.path.join(str(tmp_path), "checkpoints")

    # segment 1 exits cleanly at step 1: 'final' written.
    save_checkpoint(str(tmp_path), state.replace(step=jnp.int32(1)), name="final")
    # segment 2 advances to step 2, writes a periodic save, then dies
    # without a final write.
    save_checkpoint(str(tmp_path), state, name="25")
    old, new = os.path.join(ckdir, "final"), os.path.join(ckdir, "25")
    # step recency must be immune to fs timestamps (an un-preserving
    # `cp -r` of the xp_dir scrambles mtimes into copy order): make the
    # stale final LOOK newest.
    os.utime(old, (os.path.getmtime(old) + 60,) * 2)

    template = jax.eval_shape(lambda: create_train_state(model, cfg, tx))
    restored = restore_checkpoint(str(tmp_path), template)
    assert int(restored.step) == 2  # the periodic save, not the stale final

    # legacy checkpoints without the meta marker fall back to mtime, with
    # equal mtimes (normal clean exit) resolving to 'final'.
    for p in (old, new):
        os.unlink(os.path.join(p, "_varsep_meta.json"))
    t = os.path.getmtime(new)
    os.utime(old, (t, t))
    restored = restore_checkpoint(str(tmp_path), template)
    assert int(restored.step) == 1


def test_resume_continues_identically(tmp_path):
    """Training N steps straight == training k, checkpoint/restore, N-k."""
    cfg = wave_cfg(tmp_path)
    rng = np.random.default_rng(1)
    seq = rng.random((cfg.batch_size, 7) + cfg.frame_shape).astype(np.float32)
    cond, target = jnp.asarray(seq[:, :4]), jnp.asarray(seq[:, 4:])

    model = build_separable_network(cfg)
    tx = make_optimizer(cfg, 10)
    step = make_train_step(model, cfg, tx)

    s_direct = create_train_state(model, cfg, tx)
    for _ in range(4):
        s_direct, _ = step(s_direct, cond, target)

    s_half = create_train_state(model, cfg, tx)
    for _ in range(2):
        s_half, _ = step(s_half, cond, target)
    save_checkpoint(str(tmp_path), s_half, name="mid")
    template = jax.eval_shape(lambda: create_train_state(model, cfg, tx))
    s_resumed = restore_checkpoint(str(tmp_path), template, name="mid")
    for _ in range(2):
        s_resumed, _ = step(s_resumed, cond, target)

    for a, b in zip(jax.tree_util.tree_leaves(s_direct.params),
                    jax.tree_util.tree_leaves(s_resumed.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_load_for_eval(tmp_path):
    cfg = wave_cfg(tmp_path)
    cfg.save(os.path.join(str(tmp_path), "params.json"))
    model, tx, state = _trained_state(cfg)
    save_checkpoint(str(tmp_path), state, name="final")
    model2, variables, cfg2 = load_for_eval(str(tmp_path))
    assert cfg2.architecture == "mlp"
    cond = jnp.ones((2, 4, 64, 64, 1))
    fc = model2.apply(variables, cond, 3, train=False, method=model2.get_forecast)[0]
    assert fc.shape == (2, 3, 64, 64, 1)


# ----------------------------------------------------------------------
# Eval protocols on synthetic fixtures with a fresh tiny model
# ----------------------------------------------------------------------

from conftest import write_idx_images as _write_idx_images
from conftest import write_idx_labels as _write_idx_labels


@pytest.fixture
def mnist_xp(tmp_path):
    from spatiotemporal_variable_separation_tpu.data.moving_mnist import (
        make_test_set,
        synthetic_digits,
    )

    data_dir = tmp_path / "data"
    xp_dir = tmp_path / "xp"
    data_dir.mkdir()
    xp_dir.mkdir()
    digits = synthetic_digits(64)
    labels = (np.arange(64) % 10).astype(np.uint8)
    _write_idx_images(data_dir / "train-images-idx3-ubyte", digits)
    _write_idx_labels(data_dir / "train-labels-idx1-ubyte", labels)
    _write_idx_images(data_dir / "t10k-images-idx3-ubyte", digits[:32])
    _write_idx_labels(data_dir / "t10k-labels-idx1-ubyte", labels[:32])
    make_test_set(str(data_dir), seq_len=8, seed=42, digits=2)

    cfg = ExperimentConfig(data="mnist", architecture="dcgan", code_size_s=16,
                           code_size_t=8, enc_hidden_size=4, dec_hidden_size=4,
                           res_hidden_size=8, n_blocks=1, nt_cond=3, nt_pred=3,
                           offset=3, precision="f32", batch_size=4,
                           xp_dir=str(xp_dir), data_dir=str(data_dir))
    model = build_separable_network(cfg)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.ones((2, 3, 64, 64, 1)), 2, train=False)
    return str(xp_dir), str(data_dir), (model, dict(variables), cfg)


def test_eval_mnist_protocol(mnist_xp):
    from spatiotemporal_variable_separation_tpu.eval.mnist import evaluate

    xp_dir, data_dir, bundle = mnist_xp
    means = evaluate(xp_dir, data_dir, nt_pred=5, batch_size=8, max_batches=2,
                     model_bundle=bundle)
    assert set(means) == {"mse", "psnr", "ssim"}
    assert 0 < means["mse"] < 1 and 0 < means["ssim"] <= 1
    assert os.path.exists(os.path.join(xp_dir, "results.npz"))
    assert os.path.exists(os.path.join(xp_dir, "content_swap.npz"))


def test_eval_mnist_disentanglement_protocol(mnist_xp):
    from spatiotemporal_variable_separation_tpu.data.moving_mnist import load_mnist
    from spatiotemporal_variable_separation_tpu.eval.mnist_swap import evaluate

    xp_dir, data_dir, bundle = mnist_xp
    images, _ = load_mnist(data_dir, train=False)
    means = evaluate(xp_dir, data_dir, nt_pred=5, batch_size=4, max_batches=1,
                     model_bundle=bundle, images=images)
    assert set(means) == {"mse", "psnr", "ssim"}
    assert np.isfinite(means["mse"])


def test_eval_wave_protocol(tmp_path):
    from spatiotemporal_variable_separation_tpu.data.wave_eq import (
        generate_dataset,
        generate_pixels,
    )
    from spatiotemporal_variable_separation_tpu.eval import wave as eval_wave

    generate_dataset(str(tmp_path), size=5, seq_len=96, batch=5)
    generate_pixels(str(tmp_path), number=10)
    cfg = wave_cfg(tmp_path, nt_pred=40, data_dir=str(tmp_path))
    model = build_separable_network(cfg)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.ones((2, 4, 64, 64, 1)), 2, train=False)
    means = eval_wave.evaluate(str(tmp_path), str(tmp_path), batch_size=8,
                               max_batches=1, model_bundle=(model, variables, cfg),
                               save_arrays=True)
    assert np.isfinite(means["mse_t40"])
    # opt-in archives land in the cli.visualize layout
    with np.load(tmp_path / "predictions.npz") as d:
        assert d["predictions"].ndim == 5  # (B, T, H, W, C)
    assert os.path.exists(tmp_path / "gt.npz")
    assert os.path.exists(tmp_path / "cond.npz")


def test_graft_entry_single_and_multichip():
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if repo_root not in sys.path:
        sys.path.insert(0, repo_root)
    import __graft_entry__

    fn, args = __graft_entry__.entry()
    out = jax.eval_shape(fn, *args)  # jittable/traceable check
    assert out[0].shape[1] == 15
    __graft_entry__.dryrun_multichip(8)


def test_write_eval_json_merges(tmp_path):
    import json

    from spatiotemporal_variable_separation_tpu.eval.common import write_eval_json

    write_eval_json(str(tmp_path), "wave", {"mse_t40": np.float32(1e-4)})
    # a pinned intermediate checkpoint gets its own slot so diagnostic
    # scores never clobber the final-model record
    write_eval_json(str(tmp_path), "mnist_t10",
                    {"mse": 0.01, "psnr": 20.0, "ssim": 0.9}, epoch=25)
    # last run of the same protocol wins; other protocols are preserved
    path = write_eval_json(str(tmp_path), "wave", {"mse_t40": 2e-4})
    with open(path) as f:
        record = json.load(f)
    assert set(record) == {"wave", "mnist_t10@ep25"}
    assert record["wave"]["mse_t40"] == pytest.approx(2e-4)
    assert record["mnist_t10@ep25"]["epoch"] == 25
    assert isinstance(record["wave"]["mse_t40"], float)  # np scalars coerced
    # a corrupt file is tolerated (fresh start), not fatal
    with open(path, "w") as f:
        f.write("{broken")
    write_eval_json(str(tmp_path), "wave", {"mse_t40": 3e-4})
    with open(path) as f:
        assert json.load(f)["wave"]["mse_t40"] == pytest.approx(3e-4)


def test_write_eval_json_clears_stale_lock(tmp_path):
    """A killed writer's leftover lock (old mtime) is removed and the
    write proceeds under a fresh lock — quickly, not after a blind
    timeout, and never lockless."""
    import json
    import time

    from spatiotemporal_variable_separation_tpu.eval.common import write_eval_json

    lock = str(tmp_path / "evals.json.lock")
    open(lock, "w").close()
    os.utime(lock, (time.time() - 60,) * 2)
    t0 = time.monotonic()
    path = write_eval_json(str(tmp_path), "wave", {"mse_t40": 1e-4})
    assert time.monotonic() - t0 < 5.0
    with open(path) as f:
        assert json.load(f)["wave"]["mse_t40"] == pytest.approx(1e-4)
    assert not os.path.exists(lock)  # released after the merge
