"""Sequence-parallel (SP) prefill over a mesh ``sp`` axis.

Beyond-reference (SURVEY.md §2.7: the reference has no sequence/context
parallelism; long prompts are only chunked). Here a fresh long prompt can
prefill with the token axis sharded across devices: every per-token op
(embedding, norms, MLP, KV projection/write) partitions trivially on the
sharded axis, and attention runs as ring attention
(ops/attention/ring.py) — K/V blocks rotate around the ICI ring with
online-softmax accumulation, so no device ever holds the full sequence.

``make_sp_extend_attention`` adapts the ring op to the model's attention
call signature: it re-reads this step's K/V rows from the paged cache (in
token order via ``meta.out_cache_loc``) so the written pages stay the
single source of truth and later decode steps read the same cache.

Constraints (fresh-prefill scope): one request, no cached prefix
(computed_len == 0), positions == arange(T), no logit softcap / sliding
window, T divisible by the sp axis size.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from scratchpad_tpu.ops.attention.ring import sp_ring_attention


def make_sp_extend_attention(mesh: Mesh, axis: str = "sp"):
    """Ring-attention adapter matching the model attention signature."""

    def attend(
        q,
        kv_c,
        layer_idx,
        meta,
        page_size: int,
        sm_scale: float,
        logit_cap=None,
        sliding_window=None,
    ):
        assert not logit_cap and sliding_window is None, (
            "sp prefill: softcap/sliding-window not supported yet"
        )
        D = q.shape[-1]
        ps = kv_c.kv.shape[1]
        rows = layer_idx * kv_c.slots_per_layer + meta.out_cache_loc
        g = kv_c.kv[rows // ps, rows % ps, :, :D]  # [T, 2Hkv, D] token order
        k = g[:, 0::2, :].astype(q.dtype)
        v = g[:, 1::2, :].astype(q.dtype)
        return sp_ring_attention(mesh, q, k, v, sm_scale, axis)

    return attend


def sp_prefill(model, params, kv, meta, mesh: Mesh, axis: str = "sp"):
    """Run one fresh-prompt extend step with ring attention on ``mesh``.

    Returns (kv, logits) exactly like ``model(params, kv, meta)``; the KV
    cache ends up identical to the single-device extend (pages are written
    by the same ``write_kv`` scatter), so decode continues normally.
    """
    prev = model.extend_attention
    model.extend_attention = make_sp_extend_attention(mesh, axis)
    try:
        return model(params, kv, meta)
    finally:
        model.extend_attention = prev
