"""Per-request custom logit processors
(reference: scratchpad/sampling/custom_logit_processor.py:1-38, applied in
nn/layers/sampler.py:162; request field managers/structs.py:63-65).

A processor is a jax-TRACEABLE callable ``fn(logits, params) -> logits``:

- ``logits`` is f32[B, V] — the whole padded batch; rows that did not
  request this processor are blended back afterwards via a row mask, so
  the fn may transform everything.
- ``params`` is a dict of f32[B] arrays, one entry per key appearing in
  any request's ``custom_params`` (scalar values only; missing rows are 0).

Because the processor is traced into the jitted decode step it runs
on-device at full speed (TPU-native equivalent of the reference's
torch-on-GPU hook); a new processor identity triggers one recompile of the
sampling step and is cached thereafter — ship one processor class with
per-request ``custom_params`` rather than many ad-hoc lambdas.

HTTP serialization: base64(zlib(pickle(obj))), the reference's dill+b64
scheme. Deserializing executes arbitrary code by design, so the server
only accepts it behind ``--enable-custom-logit-processor``.
"""

from __future__ import annotations

import base64
import functools
import pickle
import zlib


class CustomLogitProcessor:
    """Subclass and implement __call__(logits, params) with jnp ops."""

    def __call__(self, logits, params):  # pragma: no cover - interface
        raise NotImplementedError

    def to_str(self) -> str:
        return base64.b64encode(zlib.compress(pickle.dumps(self))).decode()

    @classmethod
    def from_str(cls, s: str) -> "CustomLogitProcessor":
        # cache by payload so repeated requests reuse ONE object identity
        # (the jitted step keys on the processor object; a fresh unpickle
        # per request would recompile every time)
        return _from_str_cached(s)


@functools.lru_cache(maxsize=64)
def _from_str_cached(s: str):
    return pickle.loads(zlib.decompress(base64.b64decode(s)))


class BannedTokensProcessor(CustomLogitProcessor):
    """Built-in example: hard-ban a fixed token id list (params ignored)."""

    def __init__(self, token_ids):
        self.token_ids = tuple(int(t) for t in token_ids)

    def __call__(self, logits, params):
        import jax.numpy as jnp

        mask = jnp.zeros(logits.shape[-1], jnp.bool_)
        mask = mask.at[jnp.asarray(self.token_ids, jnp.int32)].set(True)
        return jnp.where(mask[None, :], -1e30, logits)

    # distinct id lists are distinct processors; make equal payloads share
    # a jit cache entry even across engine-API (non-serialized) use
    def __hash__(self):
        return hash((type(self).__name__, self.token_ids))

    def __eq__(self, other):
        return (
            type(other) is type(self) and other.token_ids == self.token_ids
        )
