"""Concurrency safety of the HFTokenizer wrapper.

HF *fast* tokenizers mutate truncation/padding state on the shared Rust
object per call; two threads using one instance race to
``RuntimeError: Already borrowed``.  This hit the r05 on-chip campaign:
the train-batch prefetch thread and the eval-batch prefetch thread
(utils/prefetch.py) both tokenized through the same wrapper at a
mid-epoch validation and killed the trainer at step 1000.  The wrapper
now keeps one underlying tokenizer per OS thread.
"""
import threading

import numpy as np

from dpr_scale_tpu.data.tokenize import HFTokenizer


def _hammer(tok, msl, n, errs):
    try:
        texts = ["a b c d e f g h i j k l", "who what book city"] * 4
        for _ in range(n):
            ids, mask = tok(texts, max_seq_len=msl)
            assert ids.shape == (8, msl)
    except Exception as e:  # noqa: BLE001 - recorded for the main thread
        errs.append(e)


def test_concurrent_tokenize_different_settings(tiny_bert_dir):
    # different max_seq_len per thread forces set_truncation_and_padding
    # on every call — the exact interleaving that raced pre-fix
    tok = HFTokenizer(tiny_bert_dir, max_seq_len=32)
    errs = []
    threads = [
        threading.Thread(target=_hammer, args=(tok, msl, 300, errs))
        for msl in (16, 32, 24)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs, f"concurrent tokenization raised: {errs[:3]}"


def test_per_thread_underlying_instances(tiny_bert_dir):
    tok = HFTokenizer(tiny_bert_dir, max_seq_len=16)
    seen = {}

    def grab(name):
        seen[name] = id(tok.tokenizer)

    grab("main")
    t = threading.Thread(target=grab, args=("worker",))
    t.start()
    t.join()
    assert seen["main"] != seen["worker"]
    # same thread gets a stable instance
    assert id(tok.tokenizer) == seen["main"]


def test_outputs_identical_across_threads(tiny_bert_dir):
    tok = HFTokenizer(tiny_bert_dir, max_seq_len=16)
    texts = ["who what book", "a b c"]
    main_ids, main_mask = tok(texts)
    out = {}

    def run():
        out["ids"], out["mask"] = tok(texts)

    t = threading.Thread(target=run)
    t.start()
    t.join()
    np.testing.assert_array_equal(main_ids, out["ids"])
    np.testing.assert_array_equal(main_mask, out["mask"])
