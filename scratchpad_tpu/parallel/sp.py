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
    """Ring-attention adapter matching the model attention signature.

    Round-2 scope (VERDICT item 7): several fresh requests per SP batch
    (block-diagonal masks from meta.req_indices/positions), a cached
    radix prefix for single-request batches (prefix K/V gathered from the
    paged cache into a replicated block, sized by the static
    meta.sp_prefix_bucket), and softcap / sliding-window models."""

    import jax.numpy as jnp

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
        D = q.shape[-1]
        ps = kv_c.kv.shape[1]
        rows = layer_idx * kv_c.slots_per_layer + meta.out_cache_loc
        g = kv_c.kv[rows // ps, rows % ps, :, :D]  # [T, 2Hkv, D] token order
        k = g[:, 0::2, :].astype(q.dtype)
        v = g[:, 1::2, :].astype(q.dtype)
        pk = pv = plen = None
        Cp = meta.sp_prefix_bucket
        if Cp:
            # cached prefix (request 0): token slots for positions < C
            pos = jnp.arange(Cp, dtype=jnp.int32)
            loc = (
                meta.page_table[0, pos // page_size] * page_size
                + pos % page_size
            )
            prow = layer_idx * kv_c.slots_per_layer + loc
            gp = kv_c.kv[prow // ps, prow % ps, :, :D]
            pk = gp[:, 0::2, :].astype(q.dtype)
            pv = gp[:, 1::2, :].astype(q.dtype)
            plen = meta.positions[0]
        # bucket-padding rows are packed with req_idx = B-1 (in-bounds for
        # per-request gathers) — give them unique NEGATIVE ids so they can
        # never alias a real request in the block-diagonal mask
        T = q.shape[0]
        valid = jnp.arange(T, dtype=jnp.int32) < jnp.sum(meta.extend_lens)
        ring_req = jnp.where(
            valid,
            meta.req_indices.astype(jnp.int32),
            -1 - jnp.arange(T, dtype=jnp.int32),
        )
        return sp_ring_attention(
            mesh,
            q,
            k,
            v,
            sm_scale,
            axis,
            positions=meta.positions,
            req_ids=ring_req,
            prefix_k=pk,
            prefix_v=pv,
            prefix_len=plen,
            logit_cap=logit_cap,
            sliding_window=sliding_window,
        )

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
