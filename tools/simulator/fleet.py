"""Multi-model fleet simulation with engine re-provisioning.

The counterpart of the reference's engine/node re-provisioning policy
layer (reference: tools/simulator/core/policies/engine_reprovisioning/
base.py EngineReprovisioningPolicy, random_policy.py): engines each hold
one model's weights; when a request arrives for a model with no live
engine, a policy picks a victim engine to repurpose, paying the weight
reload time (host->device), after which the engine serves the new model.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from dataclasses import dataclass, replace
from typing import Dict, List, Optional

import numpy as np

from tools.simulator.core import EngineSim, ModelSpec, SimConfig, SimRequest


@dataclass
class FleetRequest(SimRequest):
    model: str = ""


class ReprovisioningPolicy(ABC):
    """reference: engine_reprovisioning/base.py:6."""

    @abstractmethod
    def select_engine_to_repurpose(
        self, target_model: str, engines: List["FleetEngine"], now: float
    ) -> Optional["FleetEngine"]:
        ...

    @staticmethod
    def reprovision_time(spec: ModelSpec, h2d_gbps: float = 10.0) -> float:
        return spec.param_bytes / (h2d_gbps * 1e9)


class NeverRepurpose(ReprovisioningPolicy):
    def select_engine_to_repurpose(self, target_model, engines, now):
        return None


class IdleFirst(ReprovisioningPolicy):
    """Prefer an idle engine; among idle, the one idle longest."""

    def select_engine_to_repurpose(self, target_model, engines, now):
        idle = [
            e
            for e in engines
            if e.model_name != target_model and e.sim.queue_len == 0
        ]
        if not idle:
            return None
        return min(idle, key=lambda e: e.last_used)


class LeastLoaded(ReprovisioningPolicy):
    """Repurpose the engine with the shortest queue (drains first)."""

    def select_engine_to_repurpose(self, target_model, engines, now):
        cands = [e for e in engines if e.model_name != target_model]
        if not cands:
            return None
        return min(cands, key=lambda e: e.sim.queue_len)


class FleetEngine:
    def __init__(self, cfg: SimConfig, engine_id: int, model_name: str):
        self.sim = EngineSim(cfg, engine_id)
        self.model_name = model_name
        self.last_used = 0.0
        self.reprovisions = 0

    def repurpose(self, model_name: str, spec: ModelSpec, now: float, policy):
        """Swap weights: engine is busy for the reload, caches flush."""
        assert self.sim.queue_len == 0, "repurpose only drains idle engines"
        self.sim.cfg = replace(self.sim.cfg, model=spec)
        self.sim.kv_tokens_used = 0
        load = policy.reprovision_time(spec)
        self.sim.busy_until = max(self.sim.busy_until, now) + load
        self.sim._emit(now, now + load, f"reprovision->{model_name}")
        self.model_name = model_name
        self.reprovisions += 1


class FleetSimulator:
    """Multi-model cluster: route to a same-model engine, else repurpose
    (reference: core/global_engine.py + reprovisioning policies)."""

    def __init__(
        self,
        base_cfg: SimConfig,
        models: Dict[str, ModelSpec],
        initial: List[str],
        policy: ReprovisioningPolicy = None,
    ):
        self.models = models
        self.policy = policy or IdleFirst()
        self.engines = [
            FleetEngine(replace(base_cfg, model=models[m]), i, m)
            for i, m in enumerate(initial)
        ]
        self.rejected: list = []

    def _route(self, req: FleetRequest, now: float) -> Optional[FleetEngine]:
        same = [e for e in self.engines if e.model_name == req.model]
        if same:
            return min(same, key=lambda e: e.sim.queue_len)
        victim = self.policy.select_engine_to_repurpose(
            req.model, self.engines, now
        )
        if victim is None:
            return None
        victim.repurpose(req.model, self.models[req.model], now, self.policy)
        return victim

    def run(self, requests: List[FleetRequest]) -> dict:
        pending = sorted(requests, key=lambda r: r.arrival)
        clocks = [0.0] * len(self.engines)
        held: list[FleetRequest] = []  # no engine yet; retry on next step
        i = 0
        while (
            i < len(pending)
            or held
            or any(e.sim.waiting or e.sim.running for e in self.engines)
        ):
            t = min(clocks)
            while i < len(pending) and pending[i].arrival <= t:
                held.append(pending[i])
                i += 1
            still = []
            for r in held:
                e = self._route(r, t)
                if e is None:
                    still.append(r)
                else:
                    e.sim.submit(r)
                    e.last_used = t
            held = still
            idx = int(np.argmin(clocks))
            e = self.engines[idx]
            if not (e.sim.waiting or e.sim.running):
                nxt = pending[i].arrival if i < len(pending) else None
                if held and all(c == float("inf") or c >= t for c in clocks):
                    # everyone idle but requests still unroutable: policy
                    # refuses to repurpose -> they are rejected
                    if all(
                        self._route(r, t) is None for r in list(held)
                    ):
                        self.rejected.extend(held)
                        held = []
                        continue
                if nxt is not None:
                    clocks[idx] = max(clocks[idx], nxt)
                    continue
                clocks[idx] = float("inf")
                continue
            clocks[idx] = e.sim.step(clocks[idx])
            e.last_used = clocks[idx]
        done = [r for r in requests if r.finished > 0]
        wall = max((r.finished for r in done), default=0.0)
        return {
            "num_requests": len(requests),
            "completed": len(done),
            "rejected": len(self.rejected),
            "makespan_s": round(wall, 3),
            "throughput_tok_s": round(
                sum(r.output_len for r in done) / max(wall, 1e-9), 1
            ),
            "ttft_mean_s": round(
                float(np.mean([r.ttft for r in done])) if done else 0.0, 4
            ),
            "reprovisions": sum(e.reprovisions for e in self.engines),
            "final_models": [e.model_name for e in self.engines],
        }
