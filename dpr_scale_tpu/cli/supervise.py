"""Crash/timeout supervisor: the cluster-requeue analog for training jobs.

Parity target: the reference trains under SLURM/submitit with automatic
requeue on timeout (``max_num_timeout: 10``, reference
dpr_scale/conf/reddit.yaml:41, conf/trainer/slurm.yaml:19 ``timeout_min``
budgets) plus Lightning ``save_last`` for manual resume. TPU-native
deployments (GKE/xmanager-style) get the same semantics from this
single-process supervisor:

  * runs the wrapped command as a subprocess;
  * on a crash (nonzero exit), restarts it up to ``--max-crashes`` times;
  * with ``--time-limit SECONDS``, SIGTERMs the child at the limit and
    requeues up to ``--max-timeouts`` times (the submitit semantics:
    timeouts are budgeted separately from crashes);
  * after the first attempt, ``--on-restart-arg`` flags (default
    ``--resume``, matching cli/train.py's resume-from-last-orbax-
    checkpoint) are appended so restarts continue instead of starting
    over. Pass ``--on-restart-arg ''`` to disable.

Usage:
    python -m dpr_scale_tpu.cli.supervise [flags] -- \
        python -m dpr_scale_tpu.cli.train --config conf/nq.yaml ...
"""
from __future__ import annotations

import argparse
import signal
import subprocess
import sys
import time


def _exit_code(rc: int) -> int:
    """Normalize a child's return code into a valid exit status.

    Popen reports signal deaths as NEGATIVE codes (-15 after SIGTERM);
    passing those to sys.exit maps through the OS to e.g. 241, which is
    indistinguishable from an unrelated failure. Use the shell convention
    128 + signum instead (SIGTERM -> 143), and 1 for a zero rc reached on
    budget exhaustion.
    """
    if rc is None or rc == 0:
        return 1
    return 128 - rc if rc < 0 else rc


def run_supervised(
    cmd,
    max_crashes: int = 3,
    max_timeouts: int = 10,
    time_limit: float | None = None,
    backoff: float = 5.0,
    on_restart_args=("--resume",),
    _print=print,
) -> int:
    """Run ``cmd`` until success or budgets exhaust. Returns the final
    exit code (0 on success)."""
    crashes = timeouts = attempt = 0
    while True:
        full_cmd = list(cmd)
        if attempt > 0:
            full_cmd += [a for a in on_restart_args if a and a not in full_cmd]
        attempt += 1
        _print(f"[supervise] attempt {attempt}: {' '.join(full_cmd)}", flush=True)
        proc = subprocess.Popen(full_cmd)
        timed_out = False
        try:
            rc = proc.wait(timeout=time_limit)
        except subprocess.TimeoutExpired:
            timed_out = True
            proc.send_signal(signal.SIGTERM)  # give the child a grace period
            try:
                rc = proc.wait(timeout=30)
            except subprocess.TimeoutExpired:
                proc.kill()
                rc = proc.wait()
        if not timed_out and rc == 0:
            _print(f"[supervise] success after {attempt} attempt(s)", flush=True)
            return 0
        if timed_out:
            timeouts += 1
            _print(
                f"[supervise] time limit hit ({timeouts}/{max_timeouts} timeouts)",
                flush=True,
            )
            if timeouts > max_timeouts:
                _print("[supervise] timeout budget exhausted", flush=True)
                return _exit_code(rc)
        else:
            crashes += 1
            _print(
                f"[supervise] exit code {rc} ({crashes}/{max_crashes} crashes)",
                flush=True,
            )
            if crashes > max_crashes:
                _print("[supervise] crash budget exhausted", flush=True)
                return _exit_code(rc)
        if backoff:
            time.sleep(backoff)


def main(argv=None):
    parser = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter
    )
    parser.add_argument("--max-crashes", type=int, default=3)
    parser.add_argument("--max-timeouts", type=int, default=10)
    parser.add_argument(
        "--time-limit", type=float, default=None, help="seconds per attempt"
    )
    parser.add_argument("--backoff", type=float, default=5.0)
    parser.add_argument(
        "--on-restart-arg",
        action="append",
        default=None,
        help="arg(s) appended on every restart (default: --resume)",
    )
    parser.add_argument("cmd", nargs=argparse.REMAINDER, help="-- command ...")
    args = parser.parse_args(argv)
    cmd = args.cmd
    if cmd and cmd[0] == "--":
        cmd = cmd[1:]
    if not cmd:
        parser.error("no command given (append: -- python -m ... )")
    restart_args = (
        tuple(args.on_restart_arg) if args.on_restart_arg is not None else ("--resume",)
    )
    return run_supervised(
        cmd,
        max_crashes=args.max_crashes,
        max_timeouts=args.max_timeouts,
        time_limit=args.time_limit,
        backoff=args.backoff,
        on_restart_args=restart_args,
    )


if __name__ == "__main__":
    sys.exit(main())
