"""Per-chip batch-size ceilings: monolithic vs GradCache, with measured q/s.

The reference documents the batch sizes "that worked on Volta 32GB GPUs"
per model/dataset (reference README.md:277-285) — the operational fact a
user needs before launching a run. This harness measures the same fact for
this framework on the attached TPU chip, and demonstrates GradCache's
reason to exist: at least one production shape that OOMs monolithically
but trains with exact full-batch contrastive gradients via
``task.grad_cache_chunks`` (train/gradcache.py), with the measured q/s
cost of the ~4/3 FLOPs.

Each probe runs ``bench_train.py`` in a SUBPROCESS: a compile-time HBM OOM
raises through PJRT inside the probe process and must not poison the
sweep. OOM is detected from the exit code + the XLA "Ran out of memory in
memory space hbm" marker.

Writes docs/GRADCACHE_CEILING_r04.json and prints a markdown table.

Usage:
    python tools/bench_gradcache_ceiling.py [--quick] [--out PATH]
"""
from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

OOM_MARKERS = (
    "Ran out of memory in memory space hbm",
    "RESOURCE_EXHAUSTED",
    "Exceeded hbm capacity",
)


def probe(arch, batch, clen, chunks=1, qlen=32, steps=5, timeout=1500):
    """Run one bench_train config; returns dict(status=ok|oom|error, ...)."""
    cmd = [
        sys.executable,
        "bench_train.py",
        "--arch",
        arch,
        "--batch",
        str(batch),
        "--clen",
        str(clen),
        "--qlen",
        str(qlen),
        "--steps",
        str(steps),
        "--fused-attention",
    ]
    if chunks > 1:
        cmd += ["--grad-cache", str(chunks)]
    t0 = time.time()
    try:
        r = subprocess.run(
            cmd, cwd=REPO, capture_output=True, text=True, timeout=timeout
        )
    except subprocess.TimeoutExpired:
        return {"status": "timeout", "wall_s": round(time.time() - t0, 1)}
    wall = round(time.time() - t0, 1)
    if r.returncode == 0:
        for line in reversed(r.stdout.strip().splitlines()):
            try:
                rec = json.loads(line)
                return {
                    "status": "ok",
                    "qps": rec["value"],
                    "tflops": rec.get("model_tflops_per_s"),
                    "wall_s": wall,
                }
            except (json.JSONDecodeError, KeyError):
                continue
        return {"status": "error", "detail": "no JSON line", "wall_s": wall}
    blob = r.stdout + r.stderr
    if any(m in blob for m in OOM_MARKERS):
        need = re.search(r"Used ([0-9.]+[GM]) of ([0-9.]+[GM]) hbm", blob)
        return {
            "status": "oom",
            "hbm": need.group(0) if need else None,
            "wall_s": wall,
        }
    return {
        "status": "error",
        "detail": blob[-400:],
        "wall_s": wall,
    }


def sweep(arch, clen, batches, chunk_grid, log):
    """Walk the batch grid upward; at each OOM try GradCache chunks."""
    rows = []
    mono_ceiling = None
    gc_ceiling = None
    for b in batches:
        res = probe(arch, b, clen)
        log(f"{arch} c{clen} B={b} monolithic: {res['status']} "
            f"{res.get('qps', res.get('hbm', ''))}")
        row = {"arch": arch, "clen": clen, "batch": b, "monolithic": res}
        if res["status"] == "ok":
            mono_ceiling = b
        elif res["status"] == "oom":
            pass
        else:
            rows.append(row)
            break
        # GradCache probes: only bother at/above the monolithic ceiling
        if res["status"] == "oom" or b == batches[-1]:
            gc = {}
            for c in chunk_grid:
                res_c = probe(arch, b, clen, chunks=c)
                log(f"{arch} c{clen} B={b} gradcache x{c}: {res_c['status']} "
                    f"{res_c.get('qps', res_c.get('hbm', ''))}")
                gc[str(c)] = res_c
                if res_c["status"] == "ok":
                    gc_ceiling = max(gc_ceiling or 0, b)
                    break  # smallest chunk count that fits = fastest
            row["gradcache"] = gc
        rows.append(row)
        if res["status"] == "oom" and row.get("gradcache") and all(
            v["status"] != "ok" for v in row["gradcache"].values()
        ):
            break  # even max chunks OOMs: the grid above won't fit either
    return rows, mono_ceiling, gc_ceiling


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="docs/GRADCACHE_CEILING_r04.json")
    ap.add_argument("--quick", action="store_true", help="bert_base c256 only")
    ap.add_argument(
        "--configs", default=None,
        help="comma list of arch_cCLEN keys to sweep (e.g. "
        "'bert_base_c128,bert_large_c256') — each probe pays a "
        "multi-minute novel-shape compile, so select cells to budget",
    )
    ap.add_argument(
        "--merge-from", default=None,
        help="preload results from a prior artifact (grids not re-swept "
        "here are carried over, e.g. r04's bert_base_c256)",
    )
    args = ap.parse_args()

    def log(msg):
        print(f"[ceiling] {msg}", flush=True)

    configs = [
        ("bert_base", 256, [128, 256, 512], [4, 8, 16]),
        ("bert_base", 128, [256, 512, 1024], [4, 8, 16]),
        ("bert_large", 128, [64, 128, 256], [4, 8, 16]),
        ("bert_large", 256, [32, 64, 128], [4, 8, 16]),
    ]
    if args.quick:
        configs = configs[:1]
    if args.configs:
        want = set(args.configs.split(","))
        configs = [c for c in configs if f"{c[0]}_c{c[1]}" in want]
        missing = want - {f"{c[0]}_c{c[1]}" for c in configs}
        assert not missing, f"unknown --configs keys: {sorted(missing)}"

    out = {"chip": "v5e-1 (16G HBM)", "fused_attention": True, "results": {}}
    if args.merge_from and os.path.exists(args.merge_from):
        prior = json.load(open(args.merge_from))
        out["results"].update(prior.get("results", {}))
        out["merged_from"] = args.merge_from
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    for arch, clen, batches, chunks in configs:
        rows, mono, gc = sweep(arch, clen, batches, chunks, log)
        out["results"][f"{arch}_c{clen}"] = {
            "rows": rows,
            "monolithic_ceiling": mono,
            "gradcache_ceiling": gc,
        }
        # incremental write: a budget timeout keeps the completed grids
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
        log(f"wrote {args.out} ({len(out['results'])} grids)")

    # markdown table for STATUS.md
    print("\n| model | ctx len | B | monolithic | gradcache (chunks) |")
    print("|---|---|---|---|---|")
    for key, res in out["results"].items():
        for row in res["rows"]:
            m = row["monolithic"]
            mono_s = (
                f"{m['qps']} q/s" if m["status"] == "ok" else m["status"].upper()
            )
            gc_s = ""
            for c, g in (row.get("gradcache") or {}).items():
                gc_s += (
                    f"x{c}: {g['qps']} q/s "
                    if g["status"] == "ok"
                    else f"x{c}: {g['status'].upper()} "
                )
            print(
                f"| {row['arch']} | {row['clen']} | {row['batch']} "
                f"| {mono_s} | {gc_s or '—'} |"
            )


if __name__ == "__main__":
    main()
