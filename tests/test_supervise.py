"""Supervisor (submitit-requeue analog): crash restart, resume injection,
timeout budgets. Reference semantics: max_num_timeout requeue
(dpr_scale/conf/reddit.yaml:41) + save_last resume."""
import sys

from dpr_scale_tpu.cli.supervise import run_supervised

CRASH_TWICE = (
    "import pathlib, sys\n"
    "p = pathlib.Path(sys.argv[1])\n"
    "n = int(p.read_text()) if p.exists() else 0\n"
    "p.write_text(str(n + 1))\n"
    "resumed = '--resume' in sys.argv\n"
    "if n >= 2:\n"
    "    assert resumed, 'restarts must carry --resume'\n"
    "    sys.exit(0)\n"
    "assert not (n == 0 and resumed), 'first attempt must not resume'\n"
    "sys.exit(7)\n"
)


def test_restarts_until_success_and_injects_resume(tmp_path):
    state = tmp_path / "n"
    rc = run_supervised(
        [sys.executable, "-S", "-c", CRASH_TWICE, str(state)],
        max_crashes=5,
        backoff=0.0,
        _print=lambda *a, **k: None,
    )
    assert rc == 0
    assert state.read_text() == "3"  # two crashes + one success


def test_crash_budget_exhausts(tmp_path):
    rc = run_supervised(
        [sys.executable, "-S", "-c", "import sys; sys.exit(9)"],
        max_crashes=2,
        backoff=0.0,
        _print=lambda *a, **k: None,
    )
    assert rc == 9


def test_timeout_requeue(tmp_path):
    """First attempt sleeps past the limit (timeout requeue); the
    restarted attempt sees the marker file and exits fast."""
    marker = tmp_path / "m"
    prog = (
        "import pathlib, sys, time\n"
        "p = pathlib.Path(sys.argv[1])\n"
        "if p.exists(): sys.exit(0)\n"
        "p.write_text('x')\n"
        "time.sleep(60)\n"
    )
    rc = run_supervised(
        [sys.executable, "-S", "-c", prog, str(marker)],  # -S: skip sitecustomize
        max_timeouts=2,
        time_limit=1.5,
        backoff=0.0,
        on_restart_args=(),
        _print=lambda *a, **k: None,
    )
    assert rc == 0
