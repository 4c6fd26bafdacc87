"""tools/supervise_train.py: crash-restart supervision around the train CLI.

Pure process-logic tests (no jax): fake children crash deterministically
via a counter file. The supervisor's contract with real training — that
``--resume`` continues bit-exactly — is pinned separately by
tests/test_cli.py::test_main_cli_train_and_resume and the preemption tests.
"""

import json
import os
import signal
import subprocess
import sys
import textwrap
import time

import pytest
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from tools.supervise_train import main as supervise  # noqa: E402

FLAKY_CHILD = textwrap.dedent("""
    import pathlib, sys
    counter = pathlib.Path(sys.argv[1])
    n = int(counter.read_text()) if counter.exists() else 0
    counter.write_text(str(n + 1))
    sys.exit(1 if n < int(sys.argv[2]) else 0)
""")


def _events(log):
    return [json.loads(l) for l in Path(log).read_text().splitlines()]


def test_crash_twice_then_succeed(tmp_path):
    child = tmp_path / "child.py"
    child.write_text(FLAKY_CHILD)
    counter, log = tmp_path / "count", tmp_path / "sup.log"
    rc = supervise([
        "--backoff_base", "0.05", "--backoff_cap", "0.1",
        "--log", str(log), "--",
        sys.executable, str(child), str(counter), "2",
    ])
    assert rc == 0
    assert counter.read_text() == "3"  # two crashes + the clean run
    kinds = [e["event"] for e in _events(log)]
    assert kinds.count("crash") == 2 and kinds[-1] == "complete"


def test_usage_error_not_retried(tmp_path):
    child = tmp_path / "child.py"
    child.write_text("import sys; sys.exit(2)")
    log = tmp_path / "sup.log"
    rc = supervise([
        "--backoff_base", "0.05", "--log", str(log), "--",
        sys.executable, str(child),
    ])
    assert rc == 2
    kinds = [e["event"] for e in _events(log)]
    assert "crash" not in kinds and kinds[-1] == "fatal"


@pytest.mark.slow  # default-set coverage: test_crash_twice_then_succeed exercises the restart loop
def test_budget_exhausted(tmp_path):
    child = tmp_path / "child.py"
    child.write_text("import sys; sys.exit(7)")
    log = tmp_path / "sup.log"
    rc = supervise([
        "--max_restarts", "2", "--backoff_base", "0.05",
        "--log", str(log), "--",
        sys.executable, str(child),
    ])
    assert rc == 7
    kinds = [e["event"] for e in _events(log)]
    assert kinds.count("crash") == 2 and kinds[-1] == "gave_up"


def test_auto_resume_appended_to_main_py(tmp_path):
    fake_main = tmp_path / "main.py"
    fake_main.write_text(textwrap.dedent("""
        import sys
        assert "--resume" in sys.argv, sys.argv
        sys.exit(0)
    """))
    rc = supervise([
        "--log", str(tmp_path / "sup.log"), "--",
        sys.executable, str(fake_main),
    ])
    assert rc == 0

    # and NOT appended under --no_auto_resume
    fake_main.write_text(textwrap.dedent("""
        import sys
        assert "--resume" not in sys.argv, sys.argv
        sys.exit(0)
    """))
    rc = supervise([
        "--no_auto_resume", "--log", str(tmp_path / "sup2.log"), "--",
        sys.executable, str(fake_main),
    ])
    assert rc == 0


@pytest.mark.slow  # default-set coverage: test_crash_twice_then_succeed exercises the restart loop
def test_sigterm_forwarded_no_restart(tmp_path):
    """TERM to the supervisor reaches the child (which saves and exits,
    like the Trainer's preemption handler) and is not retried."""
    child = tmp_path / "child.py"
    marker = tmp_path / "terminated"
    child.write_text(textwrap.dedent(f"""
        import pathlib, signal, sys, time
        def onterm(sig, frame):
            pathlib.Path({str(marker)!r}).write_text("got TERM")
            sys.exit(0)
        signal.signal(signal.SIGTERM, onterm)
        pathlib.Path({str(tmp_path / "ready")!r}).write_text("up")
        time.sleep(60)
    """))
    log = tmp_path / "sup.log"
    proc = subprocess.Popen([
        sys.executable, str(REPO / "tools" / "supervise_train.py"),
        "--log", str(log), "--grace", "10", "--",
        sys.executable, str(child),
    ], cwd=tmp_path)
    deadline = time.time() + 30
    while not (tmp_path / "ready").exists():
        assert time.time() < deadline, "child never came up"
        time.sleep(0.05)
    os.kill(proc.pid, signal.SIGTERM)
    rc = proc.wait(timeout=30)
    assert marker.read_text() == "got TERM"
    assert rc == 0
    kinds = [e["event"] for e in _events(log)]
    assert kinds[-1] == "shutdown" and "crash" not in kinds
