"""Trace-driven workload ingestion (VERDICT r3 item 9).

The reference builds benchmark workloads from public request traces
(reference: tools/benchmark/gen_workload.py:18-40 — ShareGPT/LMSYS dialogs
for content + lengths, the Azure Functions invocation trace for arrival/model
distributions). This environment has zero egress, so this module ingests
LOCAL files in the same shapes:

  sharegpt   the classic ShareGPT JSON dump: a list of
             {"conversations": [{"from": "human"|"gpt", "value": str}, ...]}
             — first human turn becomes the prompt, first gpt reply sets the
             output length.
  jsonl      one JSON object per line with any of:
             {"prompt": str | "prompt_len": int, "output_len": int,
              "tstamp": float, "model": str}
             (the Azure trace converts to this with two pandas lines:
             tstamp = end_timestamp - duration, func -> model).

Records normalize to WorkloadItem; arrival times come from the trace when
present, else from a Poisson process. Token lengths without a tokenizer use
a ~4 chars/token estimate (cl100k average on English text — the reference
uses tiktoken for the same purpose).
"""

from __future__ import annotations

import dataclasses
import json
import random
from typing import Optional


@dataclasses.dataclass
class WorkloadItem:
    arrival: float  # seconds from workload start
    prompt: Optional[str]  # text prompt (None when only a length is known)
    prompt_len: int  # tokens (estimated when no tokenizer given)
    output_len: int
    model: Optional[str] = None  # multi-model routing workloads


def _est_tokens(text: str) -> int:
    # ~4 chars/token for English (cl100k); floor at 1
    return max(len(text) // 4, 1)


def load_sharegpt(
    path: str,
    tokenizer=None,
    max_items: Optional[int] = None,
) -> list[WorkloadItem]:
    """First human turn -> prompt, first gpt turn -> output length."""
    with open(path) as f:
        data = json.load(f)
    items: list[WorkloadItem] = []
    for rec in data:
        convs = rec.get("conversations") or rec.get("conversation") or []
        prompt = next(
            (c["value"] for c in convs if c.get("from") in ("human", "user")),
            None,
        )
        reply = next(
            (
                c["value"]
                for c in convs
                if c.get("from") in ("gpt", "assistant", "chatgpt", "bard")
            ),
            None,
        )
        if not prompt or not reply:
            continue
        if tokenizer is not None:
            plen = len(tokenizer.encode(prompt))
            olen = max(len(tokenizer.encode(reply)), 1)
        else:
            plen, olen = _est_tokens(prompt), _est_tokens(reply)
        items.append(
            WorkloadItem(
                arrival=0.0, prompt=prompt, prompt_len=plen, output_len=olen
            )
        )
        if max_items and len(items) >= max_items:
            break
    return items


def load_jsonl(path: str, max_items: Optional[int] = None) -> list[WorkloadItem]:
    items: list[WorkloadItem] = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            rec = json.loads(line)
            prompt = rec.get("prompt")
            plen = rec.get("prompt_len") or (
                _est_tokens(prompt) if prompt else 128
            )
            items.append(
                WorkloadItem(
                    arrival=float(rec.get("tstamp", 0.0)),
                    prompt=prompt,
                    prompt_len=int(plen),
                    output_len=int(rec.get("output_len", 128)),
                    model=rec.get("model"),
                )
            )
            if max_items and len(items) >= max_items:
                break
    # trace timestamps are absolute: rebase to 0
    if items and any(i.arrival > 0 for i in items):
        t0 = min(i.arrival for i in items)
        for i in items:
            i.arrival -= t0
        items.sort(key=lambda i: i.arrival)
    return items


def load_trace(
    path: str,
    fmt: str = "auto",
    tokenizer=None,
    max_items: Optional[int] = None,
) -> list[WorkloadItem]:
    if fmt == "auto":
        fmt = "jsonl" if path.endswith((".jsonl", ".ndjson")) else "sharegpt"
    if fmt == "sharegpt":
        return load_sharegpt(path, tokenizer, max_items)
    if fmt == "jsonl":
        return load_jsonl(path, max_items)
    raise ValueError(f"unknown trace format {fmt!r}")


def assign_arrivals(
    items: list[WorkloadItem], rate: float, seed: int = 0
) -> list[WorkloadItem]:
    """Overwrite arrivals with a Poisson process (rate req/s; <= 0 = burst).
    Used when the trace carries lengths but no timestamps (ShareGPT)."""
    rng = random.Random(seed)
    t = 0.0
    for it in items:
        it.arrival = t
        if rate > 0:
            t += rng.expovariate(rate)
    return items


def assign_models(
    items: list[WorkloadItem],
    models: list[str],
    distribution: str = "uniform",
    seed: int = 0,
) -> list[WorkloadItem]:
    """Multi-model routing workloads (reference gen_workload.py's
    uniform/zipf:alpha model distributions)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    if distribution == "uniform":
        picks = rng.choice(models, len(items))
    elif distribution.startswith("zipf"):
        alpha = float(distribution.split(":")[1])
        probs = np.array([i**-alpha for i in range(1, len(models) + 1)])
        probs /= probs.sum()
        picks = rng.choice(models, len(items), p=probs)
    else:
        raise ValueError(f"unknown distribution {distribution!r}")
    for it, m in zip(items, picks):
        it.model = str(m)
    return items


def to_sim_requests(items: list[WorkloadItem]):
    """Adapter for the cluster simulator (tools/simulator/core.py)."""
    from tools.simulator.core import SimRequest

    return [
        SimRequest(
            rid=i,
            arrival=it.arrival,
            prompt_len=it.prompt_len,
            output_len=it.output_len,
        )
        for i, it in enumerate(items)
    ]
