"""Benchmark: host input pipeline (mmap read + batch assembly + Rust
tokenization) vs the device encode rate.

The chip encodes ~2,094 psgs/s at L=256 (docs/STATUS.md); the host must
assemble batches at least that fast or encoding starves (the reference's
known weakness: num_workers=0, dpr_scale/datamodule/dpr.py:292). Measures
PassagesDataModule throughput serial and with N fork workers on a
synthetic psgs_w100-style corpus (100-word passages + titles).

Usage: python tools/bench_tokenize.py [--rows 20000] [--workers 0 2 4]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORDS = (
    "retrieval dense passage corpus query encoder transformer token index "
    "search answer question wikipedia marco title text evidence neural "
    "model train batch device shard embedding vector score rank exact"
).split()

DEVICE_ENCODE_PSGS_PER_S = 2094  # measured, bench_encode.py L=256 bert-base


def build_fixture(tmpdir: str, rows: int) -> tuple:
    import numpy as np

    rng = np.random.default_rng(0)
    corpus = os.path.join(tmpdir, "psgs.tsv")
    with open(corpus, "w") as f:
        f.write("id\ttext\ttitle\n")
        for i in range(rows):
            text = " ".join(rng.choice(WORDS, size=100))
            title = " ".join(rng.choice(WORDS, size=3))
            f.write(f"{i}\t{text}\t{title}\n")

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
    return corpus, tok_dir


def measure(corpus, tok_dir, num_workers, batch_size=128, max_seq_len=256):
    from dpr_scale_tpu.data.datamodule import PassagesDataModule
    from dpr_scale_tpu.data.tokenize import HFTokenizer

    tok = HFTokenizer(tok_dir, max_seq_len=max_seq_len)
    dm = PassagesDataModule(
        tok, corpus, batch_size=batch_size, num_workers=num_workers,
        prefetch_batches=4,
    )
    n = 0
    it = dm.batches()
    first = next(it)  # warm up pool + page cache outside the timing
    t0 = time.perf_counter()
    for batch in it:
        n += batch["input_ids"].shape[0] - int(batch["pad_count"])
    dt = time.perf_counter() - t0
    dm.close()
    return n / dt


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--rows", type=int, default=20000)
    ap.add_argument("--workers", nargs="+", type=int, default=[0, 2, 4])
    args = ap.parse_args()

    import tempfile

    with tempfile.TemporaryDirectory() as td:
        corpus, tok_dir = build_fixture(td, args.rows)
        out = {"device_encode_psgs_per_s": DEVICE_ENCODE_PSGS_PER_S, "host_cpus": os.cpu_count()}
        for w in args.workers:
            rate = measure(corpus, tok_dir, w)
            out[f"workers_{w}_psgs_per_s"] = round(rate, 1)
            print(
                f"num_workers={w}: {rate:,.0f} psgs/s "
                f"({rate / DEVICE_ENCODE_PSGS_PER_S:.2f}x device encode rate)",
                file=sys.stderr,
            )
        print(json.dumps(out))


if __name__ == "__main__":
    main()
