"""End-to-end training throughput: REAL input pipeline + train step.

bench_train.py feeds the jitted step synthetic batches; this harness runs
the full path — mmap JSONL dataset, positive/negative sampling, Rust
tokenization, prefetch, device upload, SPMD train step — on a synthetic
NQ-shaped dataset (100-word positives, 1 hard negative), and reports
steady-state queries/s against bench_train's device-only rate. If the
two match, the host pipeline keeps the chip fed (the reference's known
weakness is a single-process loader, dpr.py:292).

Usage: python tools/bench_train_e2e.py [--rows 6000] [--batch 128]
           [--arch bert_base] [--clen 256] [--steps 30] [--fused-attention]
"""
import argparse
import dataclasses
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORDS = (
    "retrieval dense passage corpus query encoder transformer token index "
    "search answer question wikipedia marco title text evidence neural "
    "model train batch device shard embedding vector score rank exact"
).split()


def build_fixture(tmpdir: str, rows: int):
    import numpy as np

    rng = np.random.default_rng(0)
    train = os.path.join(tmpdir, "train.jsonl")
    with open(train, "w") as f:
        for i in range(rows):
            row = {
                "question": " ".join(rng.choice(WORDS, size=12).tolist()),
                "positive_ctxs": [
                    {
                        "title": " ".join(rng.choice(WORDS, size=3).tolist()),
                        "text": " ".join(rng.choice(WORDS, size=100).tolist()),
                    }
                ],
                "hard_negative_ctxs": [
                    {
                        "title": " ".join(rng.choice(WORDS, size=3).tolist()),
                        "text": " ".join(rng.choice(WORDS, size=100).tolist()),
                    }
                ],
            }
            f.write(json.dumps(row) + "\n")

    tok_dir = os.path.join(tmpdir, "tok")
    os.makedirs(tok_dir, exist_ok=True)
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + WORDS + [
        "##" + w[:3] for w in WORDS
    ]
    with open(os.path.join(tok_dir, "vocab.txt"), "w") as f:
        f.write("\n".join(dict.fromkeys(vocab)) + "\n")
    from transformers import BertTokenizerFast

    BertTokenizerFast(vocab_file=os.path.join(tok_dir, "vocab.txt")).save_pretrained(
        tok_dir
    )
    return train, tok_dir


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--rows", type=int, default=6000)
    parser.add_argument("--batch", type=int, default=128)
    parser.add_argument("--arch", default="bert_base")
    parser.add_argument("--qlen", type=int, default=32)
    parser.add_argument("--clen", type=int, default=256)
    parser.add_argument("--steps", type=int, default=30)
    parser.add_argument("--fused-attention", action="store_true")
    parser.add_argument("--num-workers", type=int, default=0)
    args = parser.parse_args()
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    import jax
    import numpy as np

    from dpr_scale_tpu.cli.common import ARCH_PRESETS
    from dpr_scale_tpu.data.datamodule import DenseRetrieverDataModule
    from dpr_scale_tpu.data.tokenize import HFTokenizer
    from dpr_scale_tpu.optim import make_optimizer
    from dpr_scale_tpu.parallel import get_mesh
    from dpr_scale_tpu.train import DenseRetrieverTask
    from dpr_scale_tpu.train.schedule import linear_warmup_decay
    from dpr_scale_tpu.utils.prefetch import prefetch

    tmpdir = tempfile.mkdtemp(prefix="bench_e2e_")
    train_path, tok_dir = build_fixture(tmpdir, args.rows)
    tok = HFTokenizer(tok_dir, max_seq_len=args.clen)
    dm = DenseRetrieverDataModule(
        tok,
        train_path=train_path,
        batch_size=args.batch,
        num_negative=1,
        use_title=True,
        query_max_seq_len=args.qlen,
        num_workers=args.num_workers,
    )

    cfg = ARCH_PRESETS[args.arch]()
    if args.fused_attention:
        cfg = dataclasses.replace(cfg, fused_attention=True)
    task = DenseRetrieverTask(
        cfg=cfg,
        optimizer=make_optimizer(
            "adamw", linear_warmup_decay(1e-5, 100, 10_000), grad_clip_norm=2.0
        ),
        mesh=get_mesh(),
        softmax_temperature=1.0,
    )
    batch0 = dm.example_batch("train")
    state = task.init_state(jax.random.PRNGKey(0), batch0)
    step_fn = task.make_train_step()

    # warm / compile
    state, metrics = step_fn(state, task.shard(batch0))
    float(np.asarray(metrics["train_loss"]))

    n_done = 0
    t0 = None
    warm_skip = 3
    for epoch in range(100):
        for batch in prefetch(dm.train_batches(epoch), buffer_size=2):
            state, metrics = step_fn(state, task.shard(batch))
            n_done += 1
            if n_done == warm_skip:
                float(np.asarray(metrics["train_loss"]))  # sync
                t0 = time.perf_counter()
            if n_done >= args.steps + warm_skip:
                break
        if n_done >= args.steps + warm_skip:
            break
    assert t0 is not None, (
        f"dataset too small: only {n_done} batches available for "
        f"--steps {args.steps} (+{warm_skip} warm-up)"
    )
    float(np.asarray(metrics["train_loss"]))  # final sync
    dt = time.perf_counter() - t0
    qps = args.steps * args.batch / dt
    dm.close()
    print(
        json.dumps(
            {
                "metric": f"train_e2e_qps_{args.arch}_b{args.batch}"
                f"_q{args.qlen}_c{args.clen}"
                + ("_fa" if args.fused_attention else ""),
                "value": round(qps, 1),
                "unit": "queries/s",
                "steps_per_s": round(args.steps / dt, 2),
                "num_workers": args.num_workers,
            }
        )
    )


if __name__ == "__main__":
    main()
