"""Supervised training wrapper: clean pass-through, and stall -> kill ->
auto-resume -> completion (the hang is simulated by a training subprocess
that stops producing output mid-run on its first incarnation)."""

import os

import pytest

from spatiotemporal_variable_separation_tpu.cli import supervise as sup


def _wave_args(tmp_path, epochs=1):
    from spatiotemporal_variable_separation_tpu.data.wave_eq import generate_dataset

    data_dir = tmp_path / "data"
    xp_dir = tmp_path / "xp"
    if not data_dir.is_dir():
        data_dir.mkdir()
        xp_dir.mkdir()
        generate_dataset(str(data_dir), size=5, seq_len=30, batch=5)
    return ["--xp_dir", str(xp_dir), "--data_dir", str(data_dir),
            "--data", "wave", "--architecture", "mlp", "--mixing", "mul",
            "--code_size_s", "8", "--code_size_t", "8",
            "--enc_hidden_size", "16", "--dec_hidden_size", "16",
            "--res_hidden_size", "16", "--nt_cond", "3", "--nt_pred", "3",
            "--offset", "3", "--precision", "f32", "--batch_size", "8",
            "--epochs", str(epochs), "--steps_per_epoch", "3",
            "--log_every", "1"]


@pytest.mark.slow
def test_supervise_clean_run(tmp_path, monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    logs = []
    rc = sup.supervise(_wave_args(tmp_path), stall_timeout=600,
                       log_fn=logs.append, startup_grace=0)
    assert rc == 0
    assert any("training exited rc=0" in l for l in logs)
    assert os.path.isdir(tmp_path / "xp" / "checkpoints" / "final")


def test_supervise_restarts_on_stall(tmp_path, monkeypatch):
    # Stub entry: first incarnation prints progress then hangs (simulated
    # infrastructure fault); the relaunch — which must carry --resume —
    # completes and writes the final checkpoint marker.
    (tmp_path / "hang_entry.py").write_text(
        "import os, sys, time\n"
        "mark = os.path.join(os.path.dirname(__file__), 'hang.marker')\n"
        "print('training: stub started', flush=True)\n"
        "print('epoch 0 done', flush=True)\n"
        "if not os.path.exists(mark):\n"
        "    open(mark, 'w').close()\n"
        "    time.sleep(3600)  # hang: no output, ignores nothing\n"
        "assert '--resume' in sys.argv, sys.argv\n"
        "xp = sys.argv[sys.argv.index('--xp_dir') + 1]\n"
        "os.makedirs(os.path.join(xp, 'checkpoints', 'final'), exist_ok=True)\n"
        "print('epoch 2 done', flush=True)\n")
    monkeypatch.setenv("PYTHONPATH",
                       f"{tmp_path}{os.pathsep}{os.environ.get('PYTHONPATH', '')}")
    xp_dir = tmp_path / "xp"
    logs = []
    # stall_timeout must dominate interpreter start-up on a saturated host
    # (the suite runs concurrently with training jobs): 8 s flaked when the
    # resumed child needed >8 s just to reach its first print.
    rc = sup.supervise(["--xp_dir", str(xp_dir)], stall_timeout=30,
                       grace=5, max_restarts=3, log_fn=logs.append,
                       entry="hang_entry", startup_grace=0)
    text = "\n".join(logs)
    assert rc == 0, text
    assert "killing pid" in text, text
    assert "(resume)" in text, text
    assert "training exited rc=0" in text
    assert os.path.isdir(xp_dir / "checkpoints" / "final")


def test_supervise_gives_up_after_max_restarts(tmp_path, monkeypatch):
    (tmp_path / "always_hang.py").write_text(
        "import time\nprint('started', flush=True)\ntime.sleep(3600)\n")
    monkeypatch.setenv("PYTHONPATH",
                       f"{tmp_path}{os.pathsep}{os.environ.get('PYTHONPATH', '')}")
    logs = []
    rc = sup.supervise(["--xp_dir", str(tmp_path)], stall_timeout=4,
                       grace=3, max_restarts=1, log_fn=logs.append,
                       entry="always_hang", startup_grace=0)
    assert rc == 1
    assert any("giving up" in l for l in logs)


def test_supervise_partial_line_stall_detected(tmp_path, monkeypatch):
    # a child that emits a PARTIAL line (no newline) then hangs must still
    # trip the watchdog (raw chunked reads, not readline)
    (tmp_path / "partial_hang.py").write_text(
        "import sys, time\n"
        "sys.stdout.write('compiling...')\n"
        "sys.stdout.flush()\n"
        "time.sleep(3600)\n")
    monkeypatch.setenv("PYTHONPATH",
                       f"{tmp_path}{os.pathsep}{os.environ.get('PYTHONPATH', '')}")
    logs = []
    rc = sup.supervise(["--xp_dir", str(tmp_path)], stall_timeout=4,
                       grace=3, max_restarts=0, log_fn=logs.append,
                       entry="partial_hang", startup_grace=0)
    assert rc == 1
    assert any("killing pid" in l for l in logs), logs


def test_supervise_grace_wait_drains_chatty_teardown(tmp_path, monkeypatch):
    """A SIGTERMed child that logs heavily during its final save must not
    deadlock on a full pipe (the supervisor used to block in a blind
    wait() reading nothing; ~64 KiB of teardown output then blocked the
    child in write() until the SIGKILL escalation destroyed the save)."""
    (tmp_path / "chatty_teardown.py").write_text(
        "import os, signal, sys, time\n"
        "def onterm(sig, frame):\n"
        "    for i in range(3000):\n"  # ~570 KB >> pipe capacity
        "        sys.stdout.write('teardown %06d: ' % i + 'x' * 160 + '\\n')\n"
        "    sys.stdout.flush()\n"
        "    mark = os.path.join(os.path.dirname(__file__), 'saved.marker')\n"
        "    open(mark, 'w').close()\n"
        "    sys.exit(0)\n"
        "signal.signal(signal.SIGTERM, onterm)\n"
        "print('started', flush=True)\n"
        "time.sleep(3600)\n")
    monkeypatch.setenv("PYTHONPATH",
                       f"{tmp_path}{os.pathsep}{os.environ.get('PYTHONPATH', '')}")
    logs = []
    # stall_timeout must dominate interpreter start-up on a saturated host
    # (see test_supervise_restarts_on_stall): a SIGTERM that lands before
    # the child installs its handler kills it outright — a test race, not
    # the pipe deadlock this guards against.
    rc = sup.supervise(["--xp_dir", str(tmp_path)], stall_timeout=30,
                       grace=60, max_restarts=0, log_fn=logs.append,
                       entry="chatty_teardown", startup_grace=0)
    assert rc == 1  # stall kill happened and max_restarts=0
    # the cooperative save completed: the child was not SIGKILLed mid-write
    assert (tmp_path / "saved.marker").exists(), "\n".join(logs[-5:])
    assert sum("teardown" in l for l in logs) == 3000


def test_supervise_paused_supervisor_does_not_kill_healthy_child(
        tmp_path, monkeypatch):
    """Regression: the supervisor losing the CPU must not kill the child.

    Incident (TaxiBJ resume run): the supervisor was SIGSTOPped between an
    empty poll and the staleness check; 25 min later, on SIGCONT, the stall
    clock had aged past the timeout and it SIGTERMed a healthy child whose
    epoch output was sitting unread in the pipe.  The fix re-polls with
    timeout=0 before declaring a stall.  Simulated deterministically here:
    one poll 'returns empty' while wall time jumps past stall_timeout and
    the child keeps writing."""
    import selectors as real_selectors
    import time as real_time
    import types

    (tmp_path / "steady_writer.py").write_text(
        "import time\n"
        "print('training: stub started', flush=True)\n"
        "for i in range(40):\n"
        "    time.sleep(0.2)\n"
        "    print('epoch', i, 'done', flush=True)\n")
    monkeypatch.setenv("PYTHONPATH",
                       f"{tmp_path}{os.pathsep}{os.environ.get('PYTHONPATH', '')}")

    offset = [0.0]
    state = {"seen_data": False, "paused_once": False}

    class PausingSelector(real_selectors.DefaultSelector):
        def select(self, timeout=None):
            if (state["seen_data"] and not state["paused_once"]
                    and timeout and timeout > 0):
                # the 'pause': wall time passes (child writes ~3 lines),
                # the stall clock ages past the timeout, and the poll the
                # staleness check acts on reports nothing.
                state["paused_once"] = True
                real_time.sleep(0.7)
                offset[0] = 10_000.0
                return []
            res = super().select(timeout)
            if res:
                state["seen_data"] = True
            return res

    monkeypatch.setattr(sup, "selectors", types.SimpleNamespace(
        DefaultSelector=PausingSelector, EVENT_READ=real_selectors.EVENT_READ))
    monkeypatch.setattr(sup, "time", types.SimpleNamespace(
        monotonic=lambda: real_time.monotonic() + offset[0]))

    logs = []
    rc = sup.supervise(["--xp_dir", str(tmp_path)], stall_timeout=30,
                       grace=3, max_restarts=0, log_fn=logs.append,
                       entry="steady_writer", startup_grace=0)
    text = "\n".join(logs)
    assert state["paused_once"], text
    assert rc == 0, text
    assert "killing pid" not in text, text
    assert "output is pending" in text, text
    assert "epoch 39 done" in text, text


def test_supervise_relaunches_on_crash(tmp_path, monkeypatch):
    # nonzero exit + max_failures: relaunch with --resume, succeed second try
    (tmp_path / "crash_once.py").write_text(
        "import os, sys\n"
        "mark = os.path.join(os.path.dirname(__file__), 'crash.marker')\n"
        "if not os.path.exists(mark):\n"
        "    open(mark, 'w').close()\n"
        "    print('transient backend error', flush=True)\n"
        "    sys.exit(1)\n"
        "assert '--resume' in sys.argv\n"
        "print('recovered', flush=True)\n")
    monkeypatch.setenv("PYTHONPATH",
                       f"{tmp_path}{os.pathsep}{os.environ.get('PYTHONPATH', '')}")
    logs = []
    rc = sup.supervise(["--xp_dir", str(tmp_path)], stall_timeout=60,
                       log_fn=logs.append, entry="crash_once",
                       startup_grace=0, max_failures=2)
    text = "\n".join(logs)
    assert rc == 0, text
    assert "relaunching after failure 1/2" in text, text


def test_supervise_deadline_stops_cooperatively(tmp_path, monkeypatch):
    # a healthy (never-stalling) child must be stopped at the wall-clock
    # deadline via SIGTERM and its exit code passed through — the TPU
    # analogue is the cooperative final-save path in train/loop.py
    (tmp_path / "steady_entry.py").write_text(
        "import signal, sys, time\n"
        "stop = []\n"
        "signal.signal(signal.SIGTERM, lambda *a: stop.append(1))\n"
        "print('training: stub started', flush=True)\n"
        "for i in range(10000):\n"
        "    time.sleep(0.1)\n"
        "    print('epoch', i, 'done', flush=True)\n"
        "    if stop:\n"
        "        print('final checkpoint saved', flush=True)\n"
        "        sys.exit(0)\n")
    monkeypatch.setenv("PYTHONPATH",
                       f"{tmp_path}{os.pathsep}{os.environ.get('PYTHONPATH', '')}")
    # The stub prints only after installing its SIGTERM handler, so once
    # 'stub started' shows up in the logs the cooperative path is
    # guaranteed.  On a heavily loaded host the interpreter can take longer
    # than the deadline to boot (SIGTERM then kills it pre-handler — a pure
    # test race, impossible at production deadlines of 45+ min): retry with
    # a longer deadline until the child demonstrably booted.
    for deadline_sec in (3.0, 10.0, 30.0):
        logs = []
        rc = sup.supervise(["--xp_dir", str(tmp_path)], stall_timeout=600,
                           log_fn=logs.append, entry="steady_entry",
                           startup_grace=0, deadline_min=deadline_sec / 60.0)
        text = "\n".join(logs)
        if "stub started" in text:
            break
    assert "stub started" in text, text
    assert rc == 0, text
    assert "deadline reached" in text, text
    assert "final checkpoint saved" in text, text
    assert "deadline stop complete" in text, text
