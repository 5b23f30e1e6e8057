"""Production-shape training campaign with a mid-run SIGKILL + supervised resume.

The reference's primary artifact is a multi-epoch ``trainer.fit`` run under
SLURM requeue (reference dpr_scale/main.py:43, conf/trainer/slurm.yaml:19-23
``timeout_min``/requeue budgets, conf/checkpoint_callback/default.yaml
top-k-on-mrr rotation). This harness drives the same operational envelope
end-to-end on real hardware and ASSERTS the properties a parity run must
survive:

  1. generates a learnable ICT-shaped synthetic corpus (question words are
     a subset of the positive passage's words) big enough for thousands of
     real optimizer steps at a production config;
  2. launches ``cli.supervise`` wrapping ``cli.train`` with periodic
     validation + checkpoint-best rotation (eval_every_steps);
  3. SIGKILLs the *training process* (not the supervisor) mid-epoch once
     the step log crosses ``--kill-at-step``;
  4. waits for the supervisor to restart it with ``--resume`` and run the
     campaign to completion;
  5. verifies from the metrics JSONL and the checkpoint directory:
       - loss-curve continuity: the steps re-run after the restore (between
         the restored checkpoint and the kill point) are logged twice; the
         two passes must agree (same state + same sampler stream => same
         losses up to hardware nondeterminism);
       - LR-schedule continuity: the logged ``lr`` at overlapping steps is
         identical — a resume that restarted the schedule (the requeue bug
         class) shows as a discontinuity;
       - checkpoint-best rotation: the retained orbax steps are exactly the
         top-k validations by monitored metric, and best_step is the argmax;
       - the restore gap (kill -> first post-restart logged step) and
         steady-state queries/s before and after the boundary.

Writes ONE JSON artifact (--out), exits nonzero if any assertion fails.

Usage:
    python tools/run_campaign.py --out docs/CAMPAIGN_r04.json \
        [--rows 128000] [--epochs 3] [--batch 128] [--kill-at-step 1400]
"""
from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


# --------------------------------------------------------------------- #
# fixture


def build_fixture(workdir: str, rows: int, val_rows: int, content_words: int = 6000):
    """ICT-shaped learnable data: each row draws a bag of content words;
    the positive passage is sampled from the bag, the question is a subset
    of the SAME bag (reference prep_wiki.py ICT recipe, utils/prep_wiki.py:44-125),
    hard negative from the next row's bag. Vocab is padded to bert-base's
    30522 so the embedding table is production-sized."""
    import numpy as np

    rng = np.random.default_rng(7)
    words = np.array([f"w{i:05d}" for i in range(content_words)])

    tok_dir = os.path.join(workdir, "tok")
    os.makedirs(tok_dir, exist_ok=True)
    filler = [f"unused{i:05d}" for i in range(30522 - 5 - content_words)]
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + words.tolist() + filler
    with open(os.path.join(tok_dir, "vocab.txt"), "w") as f:
        f.write("\n".join(vocab) + "\n")
    from transformers import BertTokenizerFast

    BertTokenizerFast(vocab_file=os.path.join(tok_dir, "vocab.txt")).save_pretrained(
        tok_dir
    )

    def rows_to_file(path: str, n: int, seed_rng):
        # vectorized draw: per-row 24-word bag; passage 90 draws from the
        # bag, question 12 draws from the bag, negative = previous row's
        # passage (a hard negative: same marginal distribution)
        bags = seed_rng.integers(0, content_words, size=(n, 24))
        psg_idx = seed_rng.integers(0, 24, size=(n, 90))
        q_idx = seed_rng.integers(0, 24, size=(n, 12))
        psg = words[np.take_along_axis(bags, psg_idx, axis=1)]
        qs = words[np.take_along_axis(bags, q_idx, axis=1)]
        with open(path, "w") as f:
            for i in range(n):
                row = {
                    "question": " ".join(qs[i]),
                    "positive_ctxs": [
                        {"title": f"doc {i}", "text": " ".join(psg[i])}
                    ],
                    "hard_negative_ctxs": [
                        {"title": f"doc {i-1}", "text": " ".join(psg[i - 1])}
                    ],
                }
                f.write(json.dumps(row) + "\n")

    train = os.path.join(workdir, "train.jsonl")
    val = os.path.join(workdir, "val.jsonl")
    rows_to_file(train, rows, rng)
    rows_to_file(val, val_rows, rng)
    return tok_dir, train, val


CONFIG_TMPL = """\
task:
  type: dense
  model:
    arch: {arch}
    vocab_size: 30522
    fused_attention: true
    # fused_ffn defaults OFF here: its custom VJP saves the (B*T, F)
    # intermediate for backward, and at bert_base B=128/chip c=256 that
    # exceeds the 16 GB HBM (measured 16.43G required; the same shape
    # with fused attention only fits and is the round-3 measured e2e
    # config at 289.6 q/s). The monolithic-OOM config is exactly the
    # GradCache demonstration case (tools/bench_gradcache_ceiling.py).
    fused_ffn: {fused_ffn}
  transform:
    model_path: {tok_dir}
    max_seq_len: {clen}
  shared_model: true
  softmax_temperature: 1.0
  in_batch_eval: true
  in_batch_negatives: true
  warmup_steps: {warmup}
  k: 1
  optim:
    name: adamw
    lr: 2.0e-5
datamodule:
  train_path: {train}
  val_path: {val}
  batch_size: {batch}
  num_negative: 1
  num_val_negative: 10
  use_title: true
  query_max_seq_len: {qlen}
trainer:
  max_epochs: {epochs}
  gradient_clip_val: 2.0
  log_every: {log_every}
  eval_every_steps: {eval_every}
  metrics_jsonl: {metrics}
checkpoint_callback:
  dirpath: {ckpt}
  monitor: mrr
  mode: max
  save_top_k: {top_k}
  save_last: true
  async_save: {async_save}
seed: 0
"""


# --------------------------------------------------------------------- #
# process plumbing


def children_of(pid: int):
    try:
        with open(f"/proc/{pid}/task/{pid}/children") as f:
            return [int(p) for p in f.read().split()]
    except (FileNotFoundError, ProcessLookupError):
        return []


def last_logged_step(metrics_path: str) -> int:
    last_step = -1
    if os.path.exists(metrics_path):
        with open(metrics_path) as f:
            for line in f:
                try:
                    rec = json.loads(line)
                except json.JSONDecodeError:
                    continue  # partial trailing line
                if "train_loss" in rec:
                    last_step = max(last_step, rec["step"])
    return last_step


class Killer(threading.Thread):
    """Polls the metrics JSONL; once a train_loss record crosses
    ``kill_at_step``, SIGKILLs the supervisor's child (the training
    process). Fires exactly once."""

    def __init__(self, metrics_path: str, sup_pid_fn, kill_at_step: int):
        super().__init__(daemon=True)
        self.metrics_path = metrics_path
        self.sup_pid_fn = sup_pid_fn
        self.kill_at_step = kill_at_step
        self.killed_at_step = None
        self.kill_ts = None
        self.error = None

    def run(self):
        while True:
            time.sleep(1.0)
            try:
                last_step = last_logged_step(self.metrics_path)
                sup_pid = self.sup_pid_fn()
                if last_step >= self.kill_at_step:
                    kids = children_of(sup_pid)
                    if not kids:
                        self.error = "threshold crossed but supervisor has no child"
                        return
                    os.kill(kids[0], signal.SIGKILL)
                    self.killed_at_step = last_step
                    self.kill_ts = time.time()
                    print(
                        f"[campaign] SIGKILLed train pid {kids[0]} at logged "
                        f"step {last_step}",
                        flush=True,
                    )
                    return
                if children_of(sup_pid) == [] and not os.path.exists(
                    f"/proc/{sup_pid}"
                ):
                    self.error = "supervisor exited before kill threshold"
                    return
            except Exception as e:  # pragma: no cover - diagnostics only
                self.error = f"{type(e).__name__}: {e}"
                return


class SaveKiller(threading.Thread):
    """Kill DURING an orbax checkpoint save (the failure mode the r04
    campaign never exercised): once the step log crosses
    ``arm_after_step``, snapshot the checkpoint dir and poll it at 25 ms;
    the instant a NEW entry appears (orbax creates the step dir, then
    writes array files, then the commit marker — a multi-second window
    at bert_base size over this tunnel), SIGKILL the training process.
    The restore then must cope with a partial step dir and/or a
    mid-write ``last`` copy (train/checkpoint.py's .old fallback)."""

    def __init__(self, metrics_path: str, ckpt_dir: str, sup_pid_fn,
                 arm_after_step: int):
        super().__init__(daemon=True)
        self.metrics_path = metrics_path
        self.ckpt_dir = ckpt_dir
        self.sup_pid_fn = sup_pid_fn
        self.arm_after_step = arm_after_step
        self.killed_entry = None
        self.kill_ts = None
        self.error = None

    def run(self):
        try:
            while last_logged_step(self.metrics_path) < self.arm_after_step:
                time.sleep(1.0)
                if not os.path.exists(f"/proc/{self.sup_pid_fn()}"):
                    self.error = "supervisor exited before save-kill armed"
                    return
            baseline = set(os.listdir(self.ckpt_dir)) if os.path.isdir(
                self.ckpt_dir
            ) else set()
            print(
                f"[campaign] save-killer armed after step {self.arm_after_step} "
                f"(baseline {sorted(baseline)})",
                flush=True,
            )
            while True:
                time.sleep(0.025)
                if os.path.isdir(self.ckpt_dir):
                    new = set(os.listdir(self.ckpt_dir)) - baseline
                    if new:
                        kids = children_of(self.sup_pid_fn())
                        if not kids:
                            self.error = "save began but supervisor has no child"
                            return
                        os.kill(kids[0], signal.SIGKILL)
                        self.killed_entry = sorted(new)
                        self.kill_ts = time.time()
                        print(
                            f"[campaign] SIGKILLed train pid {kids[0]} DURING "
                            f"save of {sorted(new)}",
                            flush=True,
                        )
                        return
                if not os.path.exists(f"/proc/{self.sup_pid_fn()}"):
                    self.error = "supervisor exited while save-kill armed"
                    return
        except Exception as e:  # pragma: no cover - diagnostics only
            self.error = f"{type(e).__name__}: {e}"


# --------------------------------------------------------------------- #
# analysis


def analyze(metrics_path: str, log_every: int):
    """Check continuity across EVERY restart boundary in the appended log.

    A campaign can be killed more than once (the drill's injected SIGKILL,
    plus any real infrastructure death followed by a requeue); each restart
    shows as the step counter going backwards. For every boundary, the
    steps re-run after the restore must replay the pre-kill log exactly
    (same restored state + same sampler stream => same losses, identical
    lr) — any divergence is the resume-restarted-something bug class.
    """
    train_recs, eval_recs = [], []
    with open(metrics_path) as f:
        for line in f:
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue  # partial trailing line from a mid-write kill
            if "train_loss" in rec:
                train_recs.append(rec)
            elif "valid_mrr" in rec:
                eval_recs.append(rec)

    # split into runs at the boundaries (step goes backwards or repeats)
    runs = [[train_recs[0]]]
    for prev, rec in zip(train_recs, train_recs[1:]):
        if rec["step"] <= prev["step"]:
            runs.append([rec])
        else:
            runs[-1].append(rec)
    assert len(runs) >= 2, "no restart boundary found in the metrics log"

    # q/s steady state: median, skipping the first few samples of each run
    # (they absorb compile time)
    def steady_qps(recs, skip=3):
        vals = [r["queries_per_s"] for r in recs[skip:]]
        vals.sort()
        return vals[len(vals) // 2] if vals else None

    seen = {r["step"]: r for r in runs[0]}
    boundaries = []
    for prev_run, run in zip(runs, runs[1:]):
        overlap = [r for r in run if r["step"] in seen]
        assert overlap, (
            f"no overlapping steps across the restart at step "
            f"{run[0]['step']} — the restore did not land before the kill "
            f"point"
        )
        loss_rel_diffs, lr_diffs = [], []
        for r in overlap:
            p = seen[r["step"]]
            loss_rel_diffs.append(
                abs(r["train_loss"] - p["train_loss"])
                / max(abs(p["train_loss"]), 1e-9)
            )
            lr_diffs.append(abs(r.get("lr", 0.0) - p.get("lr", 0.0)))
        boundaries.append(
            {
                "last_step_before_kill": prev_run[-1]["step"],
                "first_step_after_restore": run[0]["step"],
                "n_overlap_steps": len(overlap),
                "loss_rel_diff_max_on_overlap": max(loss_rel_diffs),
                "lr_abs_diff_max_on_overlap": max(lr_diffs),
                # upper bound on the restore gap: last pre-kill log line ->
                # first post-restore log line (includes the killed step's
                # remainder, supervisor backoff, process start + compile,
                # and log_every re-warmup steps)
                "restore_gap_s": run[0]["ts"] - prev_run[-1]["ts"],
            }
        )
        for r in run:
            seen[r["step"]] = r

    # monotone schedule across the whole campaign: collapse duplicate steps
    # (post-restart wins = what the optimizer actually consumed last)
    by_step = {r["step"]: r for r in train_recs}
    steps_sorted = sorted(by_step)
    return {
        "n_restarts": len(runs) - 1,
        "boundaries": boundaries,
        # back-compat aliases for the single-kill drill fields
        "last_step_before_kill": boundaries[0]["last_step_before_kill"],
        "first_step_after_restore": boundaries[0]["first_step_after_restore"],
        "loss_rel_diff_max_on_overlap": max(
            b["loss_rel_diff_max_on_overlap"] for b in boundaries
        ),
        "lr_abs_diff_max_on_overlap": max(
            b["lr_abs_diff_max_on_overlap"] for b in boundaries
        ),
        "restore_gap_s": boundaries[0]["restore_gap_s"],
        # train_loss records land only on log_every multiples; the final
        # epoch-end validation is the record that pins the true last step
        "final_step": max(
            steps_sorted[-1], max((r["step"] for r in eval_recs), default=-1)
        ),
        "n_train_log_records": len(train_recs),
        "steady_qps_per_run": [steady_qps(r) for r in runs],
        "steady_qps_pre_kill": steady_qps(runs[0]),
        "steady_qps_post_restore": steady_qps(runs[-1]),
        "loss_first": train_recs[0]["train_loss"],
        "loss_final": by_step[steps_sorted[-1]]["train_loss"],
        "evals": [
            {"step": r["step"], "mrr": r["valid_mrr"], "loss": r["valid_loss"]}
            for r in eval_recs
        ],
    }


def check_rotation(ckpt_dir: str, evals, top_k: int):
    """Retained orbax step dirs must be the top-k validations by mrr
    (post-restart re-validations overwrite the same steps)."""
    retained = sorted(
        int(d) for d in os.listdir(ckpt_dir) if d.isdigit()
    )
    by_step = {}
    for e in evals:  # later (post-restart) eval of the same step wins
        by_step[e["step"]] = e["mrr"]
    expect = sorted(
        by_step, key=lambda s: (by_step[s], s), reverse=True
    )[:top_k]
    assert set(retained) == set(expect), (
        f"checkpoint rotation mismatch: retained {retained}, "
        f"expected top-{top_k} by mrr {sorted(expect)}"
    )
    assert os.path.isdir(os.path.join(ckpt_dir, "last")), "save_last missing"
    return retained


# --------------------------------------------------------------------- #


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--workdir", default="/tmp/campaign_r04")
    ap.add_argument("--out", default="docs/CAMPAIGN_r04.json")
    ap.add_argument("--rows", type=int, default=128_000)
    ap.add_argument("--val-rows", type=int, default=1024)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--arch", default="bert_base")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--qlen", type=int, default=32)
    ap.add_argument("--clen", type=int, default=256)
    ap.add_argument("--warmup", type=int, default=300)
    ap.add_argument("--eval-every", type=int, default=250)
    ap.add_argument("--log-every", type=int, default=10)
    ap.add_argument("--top-k", type=int, default=3)
    ap.add_argument("--kill-at-step", type=int, default=1400)
    ap.add_argument(
        "--kill-during-save-after", type=int, default=None,
        help="arm a second killer that SIGKILLs the training process the "
        "instant a NEW checkpoint entry appears after this step — i.e. "
        "DURING an orbax save (must be later than kill-at-step and after "
        "at least one completed save)",
    )
    ap.add_argument(
        "--pause-at-step", type=int, default=None,
        help="once the step log crosses this, SIGKILL supervisor+train "
        "(simulated infrastructure death), run --pause-cmd, then REQUEUE "
        "the same supervise command with --resume (the reference's "
        "SLURM-requeue shape, conf/trainer/slurm.yaml:19-23)",
    )
    ap.add_argument(
        "--pause-cmd", default=None,
        help="command run while the campaign is paused (e.g. the on-TPU "
        "validate gate: 'python tools/validate_tpu.py ...')",
    )
    ap.add_argument(
        "--max-restore-gap-s", type=float, default=None,
        help="assert every restore gap is under this bound — the "
        "deep-in-epoch restore proof: a resume that re-collates (rather "
        "than index-skips) thousands of batches blows straight past it",
    )
    ap.add_argument("--budget-s", type=float, default=7200.0)
    ap.add_argument(
        "--fused-ffn",
        action="store_true",
        help="enable the fused FFN kernel (needs HBM headroom: its VJP "
        "saves the FFN intermediate; OOMs at bert_base B=128 c=256)",
    )
    ap.add_argument(
        "--no-learning-check",
        action="store_true",
        help="skip the loss/mrr-trend assertion (tiny-model CPU smokes)",
    )
    ap.add_argument(
        "--force-platform",
        default=None,
        help="DPR_FORCE_PLATFORM for the train subprocesses (cpu smoke runs)",
    )
    ap.add_argument(
        "--analyze-only",
        action="store_true",
        help="skip fixture/launch; analyze the workdir's existing "
        "metrics.jsonl + ckpt dir (use after driving the campaign "
        "manually, e.g. a real infra kill followed by a requeue)",
    )
    ap.add_argument(
        "--async-save", action="store_true",
        help="background checkpoint saves (device snapshot -> off-thread "
        "fetch+serialize) so the save pipeline overlaps training steps",
    )
    ap.add_argument(
        "--notes",
        default=None,
        help="free-text provenance recorded in the artifact",
    )
    args = ap.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    metrics_path = os.path.join(args.workdir, "metrics.jsonl")
    ckpt_dir = os.path.join(args.workdir, "ckpt")

    steps_per_epoch = args.rows // args.batch
    total_steps = steps_per_epoch * args.epochs

    if args.analyze_only:
        report = analyze(metrics_path, args.log_every)
        retained = check_rotation(ckpt_dir, report["evals"], args.top_k)
        finish_and_write(args, report, retained, total_steps,
                         steps_per_epoch, wall_s=None, killed_at=None)
        return

    for stale in (metrics_path,):
        if os.path.exists(stale):
            os.remove(stale)

    print("[campaign] building fixture ...", flush=True)
    tok_dir, train, val = build_fixture(args.workdir, args.rows, args.val_rows)
    cfg_path = os.path.join(args.workdir, "campaign.yaml")
    with open(cfg_path, "w") as f:
        f.write(
            CONFIG_TMPL.format(
                arch=args.arch,
                tok_dir=tok_dir,
                clen=args.clen,
                qlen=args.qlen,
                warmup=args.warmup,
                train=train,
                val=val,
                batch=args.batch,
                epochs=args.epochs,
                log_every=args.log_every,
                eval_every=args.eval_every,
                metrics=metrics_path,
                ckpt=ckpt_dir,
                top_k=args.top_k,
                fused_ffn="true" if args.fused_ffn else "false",
                async_save="true" if args.async_save else "false",
            )
        )

    assert args.kill_at_step < total_steps - args.eval_every, (
        "kill point too late: nothing left to re-run after the restore"
    )

    cmd = [
        sys.executable,
        "-m",
        "dpr_scale_tpu.cli.supervise",
        "--max-crashes",
        "3",
        "--backoff",
        "5",
        "--",
        sys.executable,
        "-m",
        "dpr_scale_tpu.cli.train",
        "--config",
        cfg_path,
    ]
    env = dict(os.environ)
    if args.force_platform:
        env["DPR_FORCE_PLATFORM"] = args.force_platform
    if args.kill_during_save_after is not None:
        assert args.kill_during_save_after > args.kill_at_step, (
            "save-kill must arm after the step kill"
        )
        assert args.kill_during_save_after > args.eval_every, (
            "save-kill must arm after >=1 completed save, or the restart "
            "replays from scratch and the boundary proves nothing"
        )
    if args.pause_at_step is not None:
        assert args.pause_at_step > (args.kill_during_save_after
                                     or args.kill_at_step), (
            "the pause/requeue must come after the kills"
        )
    t_start = time.time()
    print(f"[campaign] launching: {' '.join(cmd)}", flush=True)
    sup = subprocess.Popen(cmd, cwd=REPO, env=env)
    sup_box = {"pid": sup.pid}
    killer = Killer(metrics_path, lambda: sup_box["pid"], args.kill_at_step)
    killer.start()
    save_killer = None
    if args.kill_during_save_after is not None:
        save_killer = SaveKiller(
            metrics_path, ckpt_dir, lambda: sup_box["pid"],
            args.kill_during_save_after,
        )
        save_killer.start()

    pause_done = None
    if args.pause_at_step is not None:
        # simulated infrastructure death + requeue: wait for the step,
        # kill supervisor THEN child, run the pause cmd, relaunch with
        # --resume on the first attempt (the r04 manual-requeue shape)
        deadline = t_start + args.budget_s
        while last_logged_step(metrics_path) < args.pause_at_step:
            if sup.poll() is not None:
                raise SystemExit(
                    f"[campaign] FAILED: supervisor exited "
                    f"{sup.returncode} before the pause step"
                )
            if time.time() > deadline:
                sup.kill()
                raise SystemExit("[campaign] FAILED: budget exhausted (pause)")
            time.sleep(2.0)
        kids = children_of(sup.pid)
        sup.send_signal(signal.SIGKILL)
        for k in kids:
            try:
                os.kill(k, signal.SIGKILL)
            except ProcessLookupError:
                pass
        sup.wait()
        pause_t0 = time.time()
        print(
            f"[campaign] paused at step >={args.pause_at_step}: "
            f"killed supervisor {sup.pid} + train {kids}", flush=True,
        )
        if args.pause_cmd:
            print(f"[campaign] pause cmd: {args.pause_cmd}", flush=True)
            rc = subprocess.run(
                args.pause_cmd, shell=True, cwd=REPO, env=env
            ).returncode
            assert rc == 0, f"pause cmd exited {rc}"
        requeue_cmd = cmd + ["--resume"]
        print(f"[campaign] REQUEUE: {' '.join(requeue_cmd)}", flush=True)
        sup = subprocess.Popen(requeue_cmd, cwd=REPO, env=env)
        sup_box["pid"] = sup.pid
        pause_done = {
            "paused_after_step": args.pause_at_step,
            "pause_cmd": args.pause_cmd,
            "pause_wall_s": time.time() - pause_t0,
        }

    try:
        rc = sup.wait(timeout=max(60.0, args.budget_s - (time.time() - t_start)))
    except subprocess.TimeoutExpired:
        sup.kill()
        raise SystemExit("[campaign] FAILED: budget exhausted")
    wall_s = time.time() - t_start
    assert rc == 0, f"supervisor exited {rc}"
    assert killer.error is None, f"killer error: {killer.error}"
    assert killer.kill_ts is not None, "kill never fired"
    if save_killer is not None:
        assert save_killer.error is None, (
            f"save-killer error: {save_killer.error}"
        )
        assert save_killer.kill_ts is not None, "save-kill never fired"

    report = analyze(metrics_path, args.log_every)
    if save_killer is not None:
        report["save_kill_entry"] = save_killer.killed_entry
    if pause_done is not None:
        report["pause"] = pause_done
    retained = check_rotation(ckpt_dir, report["evals"], args.top_k)
    assert report["first_step_after_restore"] <= killer.killed_at_step, (
        "restore jumped past the kill point"
    )
    finish_and_write(args, report, retained, total_steps, steps_per_epoch,
                     wall_s=wall_s, killed_at=killer.killed_at_step)


def finish_and_write(args, report, retained, total_steps, steps_per_epoch,
                     wall_s, killed_at):
    ckpt_dir = os.path.join(args.workdir, "ckpt")
    # the assertions with teeth
    assert report["loss_rel_diff_max_on_overlap"] < 5e-3, (
        f"loss curve discontinuous across restore: "
        f"{report['loss_rel_diff_max_on_overlap']}"
    )
    assert report["lr_abs_diff_max_on_overlap"] == 0.0, (
        f"LR schedule discontinuous across restore: "
        f"{report['lr_abs_diff_max_on_overlap']}"
    )
    assert report["final_step"] == total_steps, (
        f"campaign ended at step {report['final_step']}, expected {total_steps}"
    )
    if getattr(args, "max_restore_gap_s", None) is not None:
        pause = report.get("pause")
        gaps = []
        for b in report["boundaries"]:
            g = b["restore_gap_s"]
            if pause and b["last_step_before_kill"] >= pause["paused_after_step"]:
                # the pause boundary's wall clock includes the --pause-cmd
                # runtime (e.g. the on-TPU validate gate) — scheduled
                # downtime, not restore cost; assert on the
                # requeue-to-first-log leg only, record both
                g = max(0.0, g - pause["pause_wall_s"])
                b["restore_gap_minus_pause_s"] = round(g, 1)
            gaps.append(g)
        assert max(gaps) < args.max_restore_gap_s, (
            f"restore gap {max(gaps):.0f}s exceeds "
            f"{args.max_restore_gap_s}s — a deep-in-epoch resume that "
            f"re-collates instead of index-skipping shows up exactly here"
        )
    if not args.no_learning_check:
        mrrs = [e["mrr"] for e in report["evals"]]
        assert mrrs[-1] > mrrs[0] and report["loss_final"] < report["loss_first"], (
            "the model did not learn — loss/mrr trends are the evidence the "
            "campaign trained, not just survived"
        )
    assert os.path.isdir(os.path.join(ckpt_dir, "params_best")), (
        "params export of the best checkpoint missing"
    )

    out = {
        "config": {
            "arch": args.arch,
            "batch": args.batch,
            "qlen": args.qlen,
            "clen": args.clen,
            "rows": args.rows,
            "epochs": args.epochs,
            "steps_per_epoch": steps_per_epoch,
            "total_steps": total_steps,
            "eval_every_steps": args.eval_every,
            "save_top_k": args.top_k,
            "kill_at_step_threshold": args.kill_at_step,
        },
        "killed_at_logged_step": killed_at,
        "wall_s": None if wall_s is None else round(wall_s, 1),
        "retained_checkpoints": retained,
        "notes": args.notes,
        "ok": True,
        **report,
    }
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "evals"}, indent=1))
    print(f"[campaign] OK -> {args.out}")


if __name__ == "__main__":
    main()
