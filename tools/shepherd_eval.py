"""Shepherd routing evaluation (reference: tools/shepherd/eval.py +
eval_routing_sim.py): score a routing policy on a labeled prompt set and
sweep the cost/accuracy tradeoff of the learned policy's penalty knob.

Input JSONL rows: {"prompt": str, "route": str}. Embeddings come from a
served /v1/embeddings endpoint (utils/client.LLMEncoder) or any callable.

Usage:
  python tools/shepherd_eval.py --data eval.jsonl --routes routes.json \
      [--base-url http://host:port/v1 --embed-model MODEL] [--policy knn|learned]

routes.json: [{"name": ..., "model": ..., "utterances": [...],
               "cost_per_mtok": optional}]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from scratchpad_tpu.extensions.shepherd import (  # noqa: E402
    LearnedRouter,
    Route,
    ShepherdRouter,
)


def load_routes(path: str) -> tuple[list[Route], np.ndarray]:
    spec = json.load(open(path))
    routes = [
        Route(name=r["name"], model=r["model"], utterances=r["utterances"])
        for r in spec
    ]
    costs = np.asarray([r.get("cost_per_mtok", 1.0) for r in spec], np.float32)
    return routes, costs


def evaluate(router, rows: list[dict], costs_by_name: dict) -> dict:
    correct = 0
    cost = 0.0
    confusion: dict = {}
    for row in rows:
        got = router.route(row["prompt"])
        correct += got == row["route"]
        cost += costs_by_name.get(got, 1.0)
        confusion[(row["route"], got)] = confusion.get((row["route"], got), 0) + 1
    n = max(len(rows), 1)
    return {
        "n": len(rows),
        "accuracy": correct / n,
        "mean_route_cost": cost / n,
        "confusion": {f"{a}->{b}": c for (a, b), c in sorted(confusion.items())},
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True, help="labeled prompts JSONL")
    ap.add_argument("--routes", required=True, help="routes JSON spec")
    ap.add_argument("--policy", default="knn", choices=["knn", "max", "learned"])
    ap.add_argument("--base-url", default=None)
    ap.add_argument("--embed-model", default=None)
    ap.add_argument("--penalty-sweep", action="store_true",
                    help="learned policy: sweep cost penalties and print the "
                    "accuracy/cost frontier")
    args = ap.parse_args()

    rows = [json.loads(l) for l in open(args.data) if l.strip()]
    routes, costs = load_routes(args.routes)
    costs_by_name = {r.name: float(c) for r, c in zip(routes, costs)}

    if args.base_url:
        from scratchpad_tpu.utils.client import LLMEncoder

        enc = LLMEncoder(args.embed_model or "default", base_url=args.base_url)
        embed_fn = lambda t: enc([t])[0]  # noqa: E731
    else:
        # offline: hashing-trick bag-of-words embedding (deterministic,
        # dependency-free) — good enough for routing smoke evals
        def embed_fn(t: str) -> np.ndarray:
            v = np.zeros(256, np.float32)
            for w in t.lower().split():
                v[hash(w) % 256] += 1.0
            return v

    if args.policy == "learned":
        if args.penalty_sweep:
            out = []
            for scale in (0.0, 0.5, 1.0, 2.0, 4.0):
                r = LearnedRouter(
                    routes, embed_fn, penalty=scale * costs / costs.max()
                )
                m = evaluate(r, rows, costs_by_name)
                out.append(
                    {"penalty_scale": scale,
                     "accuracy": m["accuracy"],
                     "mean_route_cost": m["mean_route_cost"]}
                )
            print(json.dumps({"frontier": out}, indent=2))
            return
        router = LearnedRouter(routes, embed_fn)
    else:
        router = ShepherdRouter(routes, embed_fn, policy=args.policy)
    print(json.dumps(evaluate(router, rows, costs_by_name), indent=2))


if __name__ == "__main__":
    main()
