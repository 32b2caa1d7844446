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


class LearnedRouter:
    """MLP-classifier routing policy over utterance embeddings
    (reference: extensions/shepherd/policies/learned.py + the mlp trainers
    in nn/functional/mlp.py), rebuilt on jax/optax: a small softmax
    classifier maps prompt embeddings to routes, trained full-batch with
    Adam on the routes' example utterances. ``penalty`` adds a per-route
    cost term to the loss (the reference's train_mlp_classifier_with_penalty
    role) so expensive routes need margin to win."""

    def __init__(
        self,
        routes: list[Route],
        embed_fn: Callable[[str], np.ndarray],
        hidden_dims: tuple = (128, 64),
        penalty: Optional[np.ndarray] = None,  # f32[n_routes] cost bias
        epochs: int = 300,
        lr: float = 1e-2,
        seed: int = 0,
    ):
        import jax
        import jax.numpy as jnp
        import optax

        self.routes = {r.name: r for r in routes}
        self.names = [r.name for r in routes]
        self.embed_fn = embed_fn
        self.stats = {r.name: 0 for r in routes}

        X, y = [], []
        for i, r in enumerate(routes):
            embs = np.stack([self._embed(u) for u in r.utterances])
            r.embeddings = embs
            X.append(embs)
            y.extend([i] * len(r.utterances))
        X = np.concatenate(X).astype(np.float32)
        y = np.asarray(y, np.int32)
        dims = (X.shape[1],) + tuple(hidden_dims) + (len(routes),)

        keys = jax.random.split(jax.random.PRNGKey(seed), len(dims) - 1)
        params = [
            (
                jax.random.normal(k, (a, b), jnp.float32) / np.sqrt(a),
                jnp.zeros((b,), jnp.float32),
            )
            for k, a, b in zip(keys, dims[:-1], dims[1:])
        ]
        pen = (
            jnp.asarray(penalty, jnp.float32)
            if penalty is not None
            else jnp.zeros((len(routes),), jnp.float32)
        )

        def forward(params, x):
            for w, b in params[:-1]:
                x = jax.nn.relu(x @ w + b)
            w, b = params[-1]
            return x @ w + b

        def loss_fn(params):
            logits = forward(params, X) - pen[None, :]
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y
            ).mean()

        opt = optax.adam(lr)
        state = opt.init(params)

        @jax.jit
        def step(params, state):
            loss, g = jax.value_and_grad(loss_fn)(params)
            upd, state = opt.update(g, state)
            return optax.apply_updates(params, upd), state, loss

        for _ in range(epochs):
            params, state, loss = step(params, state)
        self._params = params
        self._forward = jax.jit(forward)
        self._penalty = pen
        self.final_loss = float(loss)

    def _embed(self, text: str) -> np.ndarray:
        e = np.asarray(self.embed_fn(text), np.float32)
        return e / max(np.linalg.norm(e), 1e-9)

    def route(self, prompt: str) -> str:
        logits = np.asarray(
            self._forward(self._params, self._embed(prompt)[None])
        )[0] - np.asarray(self._penalty)
        name = self.names[int(np.argmax(logits))]
        self.stats[name] += 1
        return name

    def target_model(self, prompt: str) -> str:
        return self.routes[self.route(prompt)].model
