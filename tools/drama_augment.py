#!/usr/bin/env python3
"""DRAMA data augmentation: LLM synthetic-query generation + listwise rerank.

Parity: reference drama/data-augmentation/* (SURVEY.md §2.8) — sharded
synthetic-query generation over a corpus and LLM listwise reranking of
candidates, normally driven by vLLM + Llama-3.3-70B-Instruct. The LLM is a
pluggable backend here:

  * ``--backend vllm``: uses vLLM if installed (the reference's setup);
  * ``--backend command``: pipes prompts through ``--command`` (one JSON
    prompt per line on stdin, one completion per line on stdout) so any
    local inference server/CLI works in restricted environments.

Generation output format matches the reference: per-shard JSONL rows
``{"docid", "task", "query", "language"}`` parsed from the model's
"Task: ...\\nQuery: ...\\nLanguage: ..." completion.

Usage:
    python tools/drama_augment.py generate --corpus_tsv collection.tsv \
        --output_dir out/ --shard 0 --num_shards 1000 --backend command \
        --command "my_llm_server --stdin"
    python tools/drama_augment.py rerank --candidates cand.jsonl \
        --output reranked.jsonl --backend vllm
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
from typing import Callable, List

SYSTEM_PROMPT = (
    "You are a search agent. Given a text, your task is to brainstorm a "
    "retrieval task this text can support. (e.g. QA, websearch, fact "
    "verification). The task should be written in English, but the query "
    "should be in the same language as the document. Be creative."
)

RERANK_PROMPT = (
    "You are a relevance judge. Given the query and the numbered list of "
    "passages, output the passage numbers in order of decreasing relevance "
    "to the query, comma-separated, nothing else."
)


def make_backend(args) -> Callable[[List[str]], List[str]]:
    if args.backend == "vllm":
        try:
            from vllm import LLM, SamplingParams
        except ImportError:
            raise SystemExit(
                "vLLM is not installed in this environment; use "
                "--backend command with a local inference endpoint instead."
            )
        llm = LLM(model=args.model, tensor_parallel_size=args.tensor_parallel_size)
        params = SamplingParams(temperature=0.8, top_p=0.9, max_tokens=256)

        def run(prompts):
            outs = llm.generate(prompts, params)
            return [o.outputs[0].text for o in outs]

        return run
    if args.backend == "command":

        def run(prompts):
            proc = subprocess.run(
                args.command,
                shell=True,
                input="\n".join(json.dumps(p) for p in prompts),
                capture_output=True,
                text=True,
                check=True,
            )
            # one completion per line; literal "\n" escapes carry newlines
            outs = [l.replace("\\n", "\n") for l in proc.stdout.splitlines()]
            if len(outs) != len(prompts):
                raise RuntimeError(
                    f"command backend returned {len(outs)} completions for "
                    f"{len(prompts)} prompts — completions must be exactly one "
                    "line each (escape newlines as \\n)"
                )
            return outs

        return run
    raise ValueError(args.backend)


def parse_generation(text: str):
    """Parse 'Task: ...\\nQuery: ...\\nLanguage: ...' (reference parsing)."""
    try:
        task, rest = text.split("\nQuery:")[:2]
        query, language = rest.split("\nLanguage:")
        return {
            "task": task.replace("Task:", "").strip(),
            "query": query.strip(),
            "language": language.strip().split("\n")[0].strip(),
        }
    except ValueError:
        return None


def cmd_generate(args):
    backend = make_backend(args)
    import os as _os
    import sys as _sys

    _sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
    from tools._text import iter_tsv_rows

    docids, prompts = [], []
    for row, parts in iter_tsv_rows(args.corpus_tsv):
        if args.num_shards > 1 and row % args.num_shards != args.shard:
            continue
        docids.append(parts[0])
        text = " ".join(parts[1].split())
        prompts.append(f"{SYSTEM_PROMPT}\n\nText: {text}")
    outputs = backend(prompts)
    os.makedirs(args.output_dir, exist_ok=True)
    out_path = os.path.join(args.output_dir, f"{args.shard}.jsonl")
    n = 0
    with open(out_path, "w", encoding="utf-8") as f:
        for docid, text in zip(docids, outputs):
            parsed = parse_generation(text)
            if parsed is None:
                continue
            f.write(json.dumps({"docid": docid, **parsed}, ensure_ascii=False) + "\n")
            n += 1
    print(f"Wrote {n} synthetic queries to {out_path}")


def cmd_rerank(args):
    backend = make_backend(args)
    rows = [json.loads(l) for l in open(args.candidates)]
    prompts = []
    for row in rows:
        listing = "\n".join(
            f"[{i + 1}] {c['text']}" for i, c in enumerate(row["ctxs"])
        )
        prompts.append(f"{RERANK_PROMPT}\n\nQuery: {row['question']}\n{listing}")
    outputs = backend(prompts)
    with open(args.output, "w") as f:
        for row, text in zip(rows, outputs):
            try:
                mentioned = [int(x) - 1 for x in text.replace(" ", "").split(",")]
                seen = set()
                order = []
                for i in mentioned:  # dedupe repeated indices
                    if 0 <= i < len(row["ctxs"]) and i not in seen:
                        seen.add(i)
                        order.append(i)
                # unmentioned passages keep their original relative order
                order.extend(i for i in range(len(row["ctxs"])) if i not in seen)
                row["ctxs"] = [row["ctxs"][i] for i in order]
            except ValueError:
                pass  # keep original order on unparseable output
            f.write(json.dumps(row, ensure_ascii=False) + "\n")
    print(f"Wrote {len(rows)} reranked rows to {args.output}")


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    sub = parser.add_subparsers(dest="cmd", required=True)
    for name in ("generate", "rerank"):
        p = sub.add_parser(name)
        p.add_argument("--backend", default="vllm", choices=["vllm", "command"])
        p.add_argument("--command", default=None)
        p.add_argument("--model", default="meta-llama/Llama-3.3-70B-Instruct")
        p.add_argument("--tensor_parallel_size", type=int, default=4)
        if name == "generate":
            p.add_argument("--corpus_tsv", required=True)
            p.add_argument("--output_dir", required=True)
            p.add_argument("--shard", type=int, default=0)
            p.add_argument("--num_shards", type=int, default=1)
        else:
            p.add_argument("--candidates", required=True)
            p.add_argument("--output", required=True)
    args = parser.parse_args()
    if args.cmd == "generate":
        cmd_generate(args)
    else:
        cmd_rerank(args)


if __name__ == "__main__":
    main()
