"""Discrete-event cluster serving simulator.

Compact re-creation of the reference simulator
(reference: tools/simulator/core/global_engine.py:13, core/roofline.py:12,
internal/configs/hardware_params.py:1-30): several engine replicas with a
roofline cost model, continuous batching with chunked prefill, router
policies, and Chrome-trace output — for studying cluster behaviour without
hardware (the reference's stand-in for multi-node testing, SURVEY §4).
"""

from __future__ import annotations

import json
import random
from dataclasses import dataclass, field
from typing import Optional

import numpy as np

# bandwidth GB/s, peak matmul TFLOPs (bf16), HBM GB
# (reference keeps an equivalent GPU table, hardware_params.py:1-30)
HARDWARE_PARAMS = {
    "tpu-v5e": {"bw": 819, "tflops": 197, "hbm": 16},
    "tpu-v5p": {"bw": 2765, "tflops": 459, "hbm": 95},
    "tpu-v4": {"bw": 1228, "tflops": 275, "hbm": 32},
    "a100-80g": {"bw": 2039, "tflops": 312, "hbm": 80},
    "a100-40g": {"bw": 1555, "tflops": 312, "hbm": 40},
    "h100": {"bw": 3350, "tflops": 989, "hbm": 80},
    "a6000": {"bw": 960, "tflops": 91, "hbm": 48},
    "v100": {"bw": 900, "tflops": 112, "hbm": 32},
}


@dataclass
class ModelSpec:
    """Analytic model description for the roofline."""

    num_params_b: float = 8.0  # billions
    num_layers: int = 32
    hidden: int = 4096
    kv_heads: int = 8
    head_dim: int = 128
    bytes_per_param: float = 2.0  # 2=bf16, 0.55=w4a16(+scales)
    kv_bytes_per_token: Optional[int] = None

    def __post_init__(self):
        if self.kv_bytes_per_token is None:
            self.kv_bytes_per_token = (
                2 * self.num_layers * self.kv_heads * self.head_dim * 2
            )

    @property
    def param_bytes(self) -> float:
        return self.num_params_b * 1e9 * self.bytes_per_param


@dataclass
class SimConfig:
    hardware: str = "tpu-v5e"
    chips_per_engine: int = 1
    model: ModelSpec = field(default_factory=ModelSpec)
    max_running: int = 64
    kv_budget_tokens: int = 65536
    chunked_prefill_size: int = 2048
    decode_window: int = 32  # fused decode steps per dispatch
    dispatch_overhead_s: float = 0.002  # host + dispatch per device call
    mfu: float = 0.5  # attained fraction of roofline


@dataclass
class SimRequest:
    rid: int
    arrival: float
    prompt_len: int
    output_len: int
    # filled during sim
    prefill_done: float = 0.0
    first_token: float = 0.0
    finished: float = 0.0
    computed: int = 0
    generated: int = 0

    @property
    def ttft(self) -> float:
        return self.first_token - self.arrival

    @property
    def e2e(self) -> float:
        return self.finished - self.arrival


class EngineSim:
    """One engine replica: continuous batching over a roofline cost model."""

    def __init__(self, cfg: SimConfig, engine_id: int):
        self.cfg = cfg
        self.id = engine_id
        self.hw = HARDWARE_PARAMS[cfg.hardware]
        self.bw = self.hw["bw"] * 1e9 * cfg.chips_per_engine * cfg.mfu
        self.flops = self.hw["tflops"] * 1e12 * cfg.chips_per_engine * cfg.mfu
        self.waiting: list[SimRequest] = []
        self.running: list[SimRequest] = []
        self.busy_until = 0.0
        self.kv_tokens_used = 0
        self.trace: list[dict] = []
        self.decode_tokens = 0
        self.prefill_tokens = 0

    # ----------------------------------------------------------- cost model

    def _prefill_time(self, tokens: int) -> float:
        m = self.cfg.model
        flops = 2 * m.num_params_b * 1e9 * tokens
        mem = m.param_bytes
        return max(flops / self.flops, mem / self.bw) + self.cfg.dispatch_overhead_s

    def _decode_window_time(self, bs: int, avg_ctx: float, steps: int) -> float:
        m = self.cfg.model
        per_step_mem = m.param_bytes + bs * avg_ctx * m.kv_bytes_per_token
        per_step_flops = 2 * m.num_params_b * 1e9 * bs
        step = max(per_step_mem / self.bw, per_step_flops / self.flops)
        return steps * step + self.cfg.dispatch_overhead_s

    # ------------------------------------------------------------- stepping

    def submit(self, req: SimRequest) -> None:
        self.waiting.append(req)

    def step(self, now: float) -> float:
        """Run one scheduling iteration starting at `now`; returns end time."""
        # a pending blocking operation (e.g. a fleet reprovision weight
        # reload) pushes the start of this iteration
        now = max(now, self.busy_until)
        # admission (fcfs, whole-prompt or chunk)
        budget = self.cfg.chunked_prefill_size
        prefill_batch = []
        while (
            self.waiting
            and len(self.running) + len(prefill_batch) < self.cfg.max_running
            and budget > 0
        ):
            r = self.waiting[0]
            need = r.prompt_len - r.computed
            if self.kv_tokens_used + need + r.output_len > self.cfg.kv_budget_tokens:
                break
            take = min(need, budget)
            r.computed += take
            budget -= take
            self.prefill_tokens += take
            if r.computed >= r.prompt_len:
                self.waiting.pop(0)
                prefill_batch.append(r)
                self.kv_tokens_used += r.prompt_len + r.output_len
            else:
                break  # chunked request keeps the slot

        if prefill_batch or (self.waiting and self.waiting[0].computed > 0):
            tokens = sum(
                min(r.prompt_len, self.cfg.chunked_prefill_size)
                for r in prefill_batch
            ) or min(self.waiting[0].prompt_len, self.cfg.chunked_prefill_size)
            dt = self._prefill_time(tokens)
            end = now + dt
            for r in prefill_batch:
                r.prefill_done = end
                r.first_token = end
                r.generated = 1
                self.running.append(r)
            self._emit(now, end, f"prefill x{len(prefill_batch)} ({tokens} tok)")
            return end

        if self.running:
            steps = min(
                self.cfg.decode_window,
                max(min(r.output_len - r.generated for r in self.running), 1),
            )
            avg_ctx = np.mean(
                [r.prompt_len + r.generated for r in self.running]
            )
            dt = self._decode_window_time(len(self.running), avg_ctx, steps)
            end = now + dt
            done = []
            for r in self.running:
                r.generated += steps
                self.decode_tokens += steps
                if r.generated >= r.output_len:
                    r.finished = end
                    done.append(r)
            for r in done:
                self.running.remove(r)
                self.kv_tokens_used -= r.prompt_len + r.output_len
            self._emit(now, end, f"decode bs={len(self.running)+len(done)} x{steps}")
            return end
        return now

    def _emit(self, start: float, end: float, name: str) -> None:
        self.trace.append(
            {
                "name": name,
                "ph": "X",
                "ts": start * 1e6,
                "dur": (end - start) * 1e6,
                "pid": self.id,
                "tid": 0,
            }
        )

    @property
    def queue_len(self) -> int:
        return len(self.waiting) + len(self.running)


class ClusterSimulator:
    """Multiple engines + a router (reference: LLMGlobalEngine)."""

    def __init__(self, cfg: SimConfig, num_engines: int = 1, policy: str = "shortest"):
        self.cfg = cfg
        self.engines = [EngineSim(cfg, i) for i in range(num_engines)]
        self.policy = policy
        self._rr = 0
        self._rng = random.Random(0)

    def _route(self, req: SimRequest) -> EngineSim:
        if self.policy == "random":
            return self._rng.choice(self.engines)
        if self.policy == "round-robin":
            e = self.engines[self._rr % len(self.engines)]
            self._rr += 1
            return e
        if self.policy == "shortest":
            return min(self.engines, key=lambda e: e.queue_len)
        raise ValueError(f"unknown routing policy {self.policy}")

    def run(self, requests: list[SimRequest]) -> dict:
        pending = sorted(requests, key=lambda r: r.arrival)
        # event loop: engines advance independently
        clocks = [0.0] * len(self.engines)
        i = 0
        while i < len(pending) or any(
            e.waiting or e.running for e in self.engines
        ):
            # deliver arrivals up to the earliest engine clock
            t = min(clocks)
            while i < len(pending) and pending[i].arrival <= t:
                self._route(pending[i]).submit(pending[i])
                i += 1
            # advance the laggiest engine
            idx = int(np.argmin(clocks))
            e = self.engines[idx]
            if not (e.waiting or e.running):
                # idle: jump to next arrival
                if i < len(pending):
                    clocks[idx] = max(clocks[idx], pending[i].arrival)
                    self._route(pending[i]).submit(pending[i])
                    i += 1
                    continue
                clocks[idx] = float("inf")
                continue
            clocks[idx] = e.step(clocks[idx])
        done = [r for r in requests if r.finished > 0]
        wall = max((r.finished for r in done), default=0.0)
        return {
            "num_requests": len(requests),
            "completed": len(done),
            "makespan_s": round(wall, 3),
            "throughput_tok_s": round(
                sum(r.output_len for r in done) / max(wall, 1e-9), 1
            ),
            "ttft_mean_s": round(float(np.mean([r.ttft for r in done])), 4),
            "ttft_p99_s": round(float(np.percentile([r.ttft for r in done], 99)), 4),
            "e2e_mean_s": round(float(np.mean([r.e2e for r in done])), 4),
            "per_engine_decode_tokens": [e.decode_tokens for e in self.engines],
        }

    def write_chrome_trace(self, path: str) -> None:
        events = [ev for e in self.engines for ev in e.trace]
        with open(path, "w") as f:
            json.dump({"traceEvents": events}, f)


def gen_synthetic_workload(
    n: int, rate: float, seed: int = 0,
    prompt_mean: int = 512, output_mean: int = 128,
) -> list[SimRequest]:
    """Poisson arrivals with lognormal lengths (ShareGPT-ish shape;
    reference: tools/benchmark/gen_workload.py)."""
    rng = np.random.default_rng(seed)
    t = 0.0
    out = []
    for i in range(n):
        if rate > 0:
            t += rng.exponential(1.0 / rate)
        out.append(
            SimRequest(
                rid=i,
                arrival=t,
                prompt_len=max(int(rng.lognormal(np.log(prompt_mean), 0.6)), 4),
                output_len=max(int(rng.lognormal(np.log(output_mean), 0.6)), 1),
            )
        )
    return out


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--hardware", default="tpu-v5e", choices=sorted(HARDWARE_PARAMS))
    ap.add_argument("--num-engines", type=int, default=1)
    ap.add_argument("--policy", default="shortest")
    ap.add_argument("--num-requests", type=int, default=200)
    ap.add_argument("--rate", type=float, default=8.0)
    ap.add_argument("--trace", type=str, default=None)
    ap.add_argument(
        "--workload", type=str, default=None,
        help="replay a recorded trace (ShareGPT json / jsonl) instead of "
        "the synthetic Poisson workload (tools/workload.py)",
    )
    ap.add_argument("--workload-format", default="auto")
    args = ap.parse_args()
    sim = ClusterSimulator(SimConfig(hardware=args.hardware), args.num_engines, args.policy)
    if args.workload:
        import os
        import sys

        sys.path.insert(
            0, os.path.dirname(os.path.dirname(os.path.dirname(__file__)))
        )
        from tools.workload import assign_arrivals, load_trace, to_sim_requests

        items = load_trace(
            args.workload, args.workload_format, max_items=args.num_requests
        )
        if not any(i.arrival > 0 for i in items):
            assign_arrivals(items, args.rate)
        reqs = to_sim_requests(items)
    else:
        reqs = gen_synthetic_workload(args.num_requests, args.rate)
    report = sim.run(reqs)
    print(json.dumps(report, indent=2))
    if args.trace:
        sim.write_chrome_trace(args.trace)


if __name__ == "__main__":
    main()
