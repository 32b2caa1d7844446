"""Shepherd: embedding-based multi-model router.

Re-creation of the reference's shepherd extension
(reference: scratchpad/extensions/shepherd/router.py:12, policies/,
tools/shepherd/): classify an incoming prompt into a "route" (a model +
generation config) by nearest neighbours over example-utterance embeddings.

The embedding function is pluggable: Engine.encode (a served embedding
model) in production, or any callable for tests.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import numpy as np


@dataclasses.dataclass
class Route:
    name: str
    model: str  # served model / endpoint this route targets
    utterances: list[str]
    # filled by the router
    embeddings: Optional[np.ndarray] = None


class ShepherdRouter:
    """kNN / cosine-threshold routing over route utterances."""

    def __init__(
        self,
        routes: list[Route],
        embed_fn: Callable[[str], np.ndarray],
        policy: str = "knn",
        k: int = 3,
        threshold: float = 0.0,
        default_route: Optional[str] = None,
    ):
        self.routes = {r.name: r for r in routes}
        self.embed_fn = embed_fn
        self.policy = policy
        self.k = k
        self.threshold = threshold
        self.default_route = default_route or routes[0].name
        self._index: list[tuple[str, np.ndarray]] = []
        for r in routes:
            embs = np.stack([self._embed(u) for u in r.utterances])
            r.embeddings = embs
            for e in embs:
                self._index.append((r.name, e))

    def _embed(self, text: str) -> np.ndarray:
        e = np.asarray(self.embed_fn(text), np.float32)
        n = np.linalg.norm(e)
        return e / max(n, 1e-9)

    def route(self, prompt: str) -> str:
        """Returns the route name for a prompt."""
        q = self._embed(prompt)
        sims = np.array([float(e @ q) for _, e in self._index])
        if self.policy == "knn":
            top = np.argsort(-sims)[: self.k]
            if sims[top[0]] < self.threshold:
                return self.default_route
            votes: dict[str, float] = {}
            for i in top:
                name = self._index[i][0]
                votes[name] = votes.get(name, 0.0) + float(sims[i])
            return max(votes, key=votes.get)
        if self.policy == "max":
            best = int(np.argmax(sims))
            if sims[best] < self.threshold:
                return self.default_route
            return self._index[best][0]
        raise ValueError(f"unknown policy {self.policy}")

    def target_model(self, prompt: str) -> str:
        return self.routes[self.route(prompt)].model
