"""Unit tests for the campaign harness's post-run analysis gates.

The campaign harness (tools/run_campaign.py) is the parity analog of the
reference's SLURM requeue envelope (reference dpr_scale/main.py:43,
conf/trainer/slurm.yaml:19-23); its finish_and_write() holds the
assertions with teeth.  These tests pin the restore-gap accounting: a
``--pause-cmd`` (e.g. the on-TPU validate gate run while the trainer is
down) is scheduled downtime, so the gap assertion must apply to the
requeue-to-first-log leg only — and only at the pause boundary.
"""
import importlib.util
import json
import os
import types

import pytest

_SPEC = importlib.util.spec_from_file_location(
    "run_campaign",
    os.path.join(os.path.dirname(__file__), "..", "tools", "run_campaign.py"),
)
run_campaign = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(run_campaign)


def _mk_args(tmp_path, **over):
    os.makedirs(tmp_path / "ckpt" / "params_best", exist_ok=True)
    base = dict(
        workdir=str(tmp_path),
        arch="tiny",
        batch=8,
        qlen=16,
        clen=32,
        rows=640,
        epochs=2,
        eval_every=20,
        top_k=3,
        kill_at_step=40,
        max_restore_gap_s=100.0,
        no_learning_check=True,
        notes=None,
        out=str(tmp_path / "out.json"),
    )
    base.update(over)
    return types.SimpleNamespace(**base)


def _mk_report(boundaries, pause=None):
    rep = {
        "n_restarts": len(boundaries),
        "boundaries": [dict(b) for b in boundaries],
        "last_step_before_kill": boundaries[0]["last_step_before_kill"],
        "first_step_after_restore": boundaries[0]["first_step_after_restore"],
        "loss_rel_diff_max_on_overlap": 0.0,
        "lr_abs_diff_max_on_overlap": 0.0,
        "restore_gap_s": boundaries[0]["restore_gap_s"],
        "final_step": 160,
        "n_train_log_records": 2,
        "steady_qps_per_run": [100.0, 100.0],
        "steady_qps_pre_kill": 100.0,
        "steady_qps_post_restore": 100.0,
        "loss_first": 2.0,
        "loss_final": 1.0,
        "evals": [{"step": 20, "mrr": 0.1}, {"step": 160, "mrr": 0.2}],
    }
    if pause is not None:
        rep["pause"] = pause
    return rep


def _boundary(last_before, gap):
    return {
        "last_step_before_kill": last_before,
        "first_step_after_restore": max(1, last_before - 20),
        "n_overlap_steps": 20,
        "loss_rel_diff_max_on_overlap": 0.0,
        "lr_abs_diff_max_on_overlap": 0.0,
        "restore_gap_s": gap,
    }


def _run(args, report):
    retained = []
    run_campaign.finish_and_write(
        args, report, retained, total_steps=160, steps_per_epoch=80,
        wall_s=None, killed_at=40,
    )
    with open(args.out) as f:
        return json.load(f)


def test_pause_downtime_subtracted_only_at_pause_boundary(tmp_path):
    args = _mk_args(tmp_path)
    pause = {"paused_after_step": 100, "pause_cmd": "gate", "pause_wall_s": 60.0}
    report = _mk_report(
        [_boundary(40, 50.0), _boundary(105, 150.0)], pause=pause
    )
    # raw 150s exceeds the 100s limit; minus the 60s scheduled pause it is
    # 90s and must PASS — the gate measures restore cost, not gate runtime.
    out = _run(args, report)
    b0, b1 = out["boundaries"]
    assert "restore_gap_minus_pause_s" not in b0
    assert b1["restore_gap_minus_pause_s"] == pytest.approx(90.0)
    assert b1["restore_gap_s"] == 150.0  # raw value preserved alongside


def test_gap_over_limit_still_fails_after_pause_adjustment(tmp_path):
    args = _mk_args(tmp_path)
    pause = {"paused_after_step": 100, "pause_cmd": "gate", "pause_wall_s": 10.0}
    report = _mk_report([_boundary(105, 150.0)], pause=pause)
    with pytest.raises(AssertionError, match="restore gap"):
        _run(args, report)


def test_no_pause_keeps_raw_gap_semantics(tmp_path):
    args = _mk_args(tmp_path)
    report = _mk_report([_boundary(40, 150.0)])
    with pytest.raises(AssertionError, match="restore gap"):
        _run(args, report)
    report = _mk_report([_boundary(40, 50.0)])
    out = _run(args, report)
    assert "restore_gap_minus_pause_s" not in out["boundaries"][0]


def test_pre_pause_boundary_not_adjusted(tmp_path):
    # a kill BEFORE the pause step must not get the pause credit even if
    # the pause record exists
    args = _mk_args(tmp_path)
    pause = {"paused_after_step": 100, "pause_cmd": "gate", "pause_wall_s": 60.0}
    report = _mk_report([_boundary(40, 150.0)], pause=pause)
    with pytest.raises(AssertionError, match="restore gap"):
        _run(args, report)


def test_learning_check_gates_flat_loss(tmp_path):
    args = _mk_args(tmp_path, no_learning_check=False)
    report = _mk_report([_boundary(40, 50.0)])
    report["loss_final"] = report["loss_first"]  # did not learn
    with pytest.raises(AssertionError, match="did not learn"):
        _run(args, report)
