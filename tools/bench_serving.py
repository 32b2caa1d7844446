"""Open-loop serving benchmark against an OpenAI-compatible endpoint.

Re-creation of the reference harness
(reference: tools/benchmark/bench_perf.py:21-120, tools/benchmark/common.py:21-49,
tools/benchmark/arrival.py): Poisson arrivals, streaming requests, and the
same metric set — TTFT / TPOT / ITL / E2E (mean, median, std, p90/p99),
request & output-token throughput, and goodput under SLO attainment.

Usage:
    python tools/bench_serving.py --base-url http://127.0.0.1:3000 \
        --model m --num-prompts 100 --request-rate 4 \
        --input-len 512 --output-len 128
"""

from __future__ import annotations

import argparse
import asyncio
import json
import random
import time
from dataclasses import dataclass, field

import aiohttp
import numpy as np


@dataclass
class RequestResult:
    success: bool = False
    prompt_len: int = 0
    output_len: int = 0
    ttft: float = 0.0
    itls: list[float] = field(default_factory=list)
    e2e: float = 0.0
    error: str = ""


def poisson_arrivals(n: int, rate: float, rng: random.Random):
    """Inter-arrival gaps; rate <= 0 means all-at-once
    (reference: tools/benchmark/arrival.py)."""
    if rate <= 0:
        return [0.0] * n
    return [rng.expovariate(rate) for _ in range(n)]


async def run_one(
    session: aiohttp.ClientSession,
    base_url: str,
    model: str,
    prompt_ids,  # list[int] token ids, or str text (trace-driven)
    output_len: int,
) -> RequestResult:
    res = RequestResult(prompt_len=len(prompt_ids))
    payload = {
        "model": model,
        "prompt": prompt_ids if isinstance(prompt_ids, str) else [prompt_ids],
        "max_tokens": output_len,
        "temperature": 0.0,
        "ignore_eos": True,
        "stream": True,
    }
    start = time.perf_counter()
    last = start
    try:
        async with session.post(
            f"{base_url}/v1/completions", json=payload
        ) as resp:
            if resp.status != 200:
                res.error = f"http {resp.status}"
                return res
            async for raw in resp.content:
                line = raw.decode().strip()
                if not line.startswith("data: "):
                    continue
                data = line[6:]
                if data == "[DONE]":
                    break
                chunk = json.loads(data)
                now = time.perf_counter()
                usage = chunk.get("usage")
                if usage:
                    res.output_len = usage.get("completion_tokens", 0)
                # any choices-bearing chunk marks progress: random-weight
                # lab models emit tokens whose text detokenizes empty (the
                # SSE stream holds text back), so keying on non-empty text
                # would mark every request failed
                if chunk.get("choices"):
                    if res.ttft == 0.0:
                        res.ttft = now - start
                    else:
                        res.itls.append(now - last)
                    last = now
        res.e2e = time.perf_counter() - start
        res.success = res.ttft > 0 or res.output_len > 0
    except Exception as e:  # noqa: BLE001
        res.error = str(e)
    return res


async def run_benchmark(args) -> dict:
    rng = random.Random(args.seed)
    if args.trace:
        # trace-driven workload (reference: tools/benchmark/gen_workload.py):
        # ShareGPT text prompts + reply lengths, or a generic jsonl trace
        # with lengths/timestamps (Azure-style)
        import os
        import sys

        sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
        from tools.workload import assign_arrivals, load_trace

        items = load_trace(
            args.trace, args.trace_format, max_items=args.num_prompts
        )
        if not any(i.arrival > 0 for i in items):
            assign_arrivals(items, args.request_rate, args.seed)
        prompts = []
        for it in items:
            if it.prompt is not None:
                prompts.append(it.prompt)
            else:  # length-only trace row: synthesize ids at that length
                prompts.append(
                    [rng.randint(1, 30000) for _ in range(it.prompt_len)]
                )
        out_lens = [it.output_len for it in items]
        arrivals = [it.arrival for it in items]
        gaps = [arrivals[0]] + [
            b - a for a, b in zip(arrivals, arrivals[1:])
        ]
    else:
        prompts = [
            [rng.randint(1, 30000) for _ in range(args.input_len)]
            for _ in range(args.num_prompts)
        ]
        out_lens = [args.output_len] * args.num_prompts
        gaps = poisson_arrivals(args.num_prompts, args.request_rate, rng)

    conn = aiohttp.TCPConnector(limit=args.max_concurrency or 0)
    async with aiohttp.ClientSession(
        connector=conn, timeout=aiohttp.ClientTimeout(total=args.timeout)
    ) as session:
        t0 = time.perf_counter()
        tasks = []
        for p, ol, gap in zip(prompts, out_lens, gaps):
            await asyncio.sleep(gap)
            tasks.append(
                asyncio.create_task(
                    run_one(session, args.base_url, args.model, p, ol)
                )
            )
        results: list[RequestResult] = list(await asyncio.gather(*tasks))
        wall = time.perf_counter() - t0

    ok = [r for r in results if r.success]
    if not ok:
        return {"error": "no successful requests", "failures": [r.error for r in results[:5]]}

    def stats(xs):
        a = np.asarray(xs)
        return {
            "mean": float(a.mean()),
            "median": float(np.median(a)),
            "std": float(a.std()),
            "p90": float(np.percentile(a, 90)),
            "p99": float(np.percentile(a, 99)),
        }

    ttfts = [r.ttft for r in ok]
    tpots = [r.e2e / max(r.output_len, 1) for r in ok]
    itls = [x for r in ok for x in r.itls]
    e2es = [r.e2e for r in ok]
    total_out = sum(r.output_len or args.output_len for r in ok)
    goodput = sum(
        1
        for r in ok
        if r.ttft <= args.slo_ttft and (np.mean(r.itls) if r.itls else 0) <= args.slo_itl
    )
    return {
        "num_requests": len(results),
        "num_success": len(ok),
        "duration_s": round(wall, 2),
        "request_throughput_rps": round(len(ok) / wall, 3),
        "output_token_throughput_tps": round(total_out / wall, 1),
        "ttft_s": stats(ttfts),
        "tpot_s": stats(tpots),
        "itl_s": stats(itls) if itls else None,
        "e2e_s": stats(e2es),
        "goodput_rps": round(goodput / wall, 3),
        "slo": {"ttft_s": args.slo_ttft, "itl_s": args.slo_itl},
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--base-url", default="http://127.0.0.1:3000")
    ap.add_argument("--model", default="model")
    ap.add_argument("--num-prompts", type=int, default=64)
    ap.add_argument("--request-rate", type=float, default=0.0, help="req/s Poisson; 0=burst")
    ap.add_argument("--input-len", type=int, default=512)
    ap.add_argument("--output-len", type=int, default=128)
    ap.add_argument("--max-concurrency", type=int, default=0)
    ap.add_argument("--timeout", type=float, default=600)
    ap.add_argument("--slo-ttft", type=float, default=2.0)
    ap.add_argument("--slo-itl", type=float, default=0.1)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--output", type=str, default=None, help="write JSON report here")
    ap.add_argument(
        "--trace", type=str, default=None,
        help="trace file (ShareGPT json or jsonl) replacing synthetic prompts",
    )
    ap.add_argument(
        "--trace-format", default="auto", choices=["auto", "sharegpt", "jsonl"]
    )
    args = ap.parse_args()
    report = asyncio.run(run_benchmark(args))
    print(json.dumps(report, indent=2))
    if args.output:
        with open(args.output, "w") as f:
            json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
