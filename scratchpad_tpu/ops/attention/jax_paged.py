"""Decode backend on jax's bundled multi-queries paged-attention kernel.

Alternative to our in-repo kernel (pallas_decode.py): wraps
jax.experimental.pallas.ops.tpu.paged_attention over the same
[Hkv, L, S, D] cache by folding the layer into the global page index.
Useful as a cross-check and a fallback while tuning our kernel.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from scratchpad_tpu.executor.forward_meta import ForwardMeta


@functools.partial(
    jax.jit, static_argnames=("page_size", "sm_scale", "logit_cap")
)
def _call(
    q, k_cache, v_cache, layer_idx, page_table, seq_lens,
    *, page_size, sm_scale, logit_cap,
):
    from jax.experimental.pallas.ops.tpu.paged_attention import paged_attention

    B, Hq, D = q.shape
    Hkv, L, S, _ = k_cache.shape
    Ptot = S // page_size
    k_pages = k_cache.reshape(Hkv, L * Ptot, page_size, D)
    v_pages = v_cache.reshape(Hkv, L * Ptot, page_size, D)
    pt = page_table + layer_idx.astype(jnp.int32) * Ptot
    P = pt.shape[1]
    ppcb = 8 if P % 8 == 0 else (4 if P % 4 == 0 else 1)
    # the kernel has no scale argument; pre-scale q
    out = paged_attention(
        (q.astype(jnp.float32) * sm_scale).astype(q.dtype),
        k_pages,
        v_pages,
        jnp.maximum(seq_lens, 1).astype(jnp.int32),
        pt,
        pages_per_compute_block=ppcb,
        attn_logits_soft_cap=logit_cap,
    )
    # rows with seq_len == 0 are batch padding; zero them
    return jnp.where(seq_lens[:, None, None] > 0, out, 0.0).astype(q.dtype)


def decode_attention_jax_paged(
    q: jax.Array,
    kv,  # KVCache
    layer_idx: jax.Array,
    meta: ForwardMeta,
    *,
    page_size: int,
    sm_scale: float,
    logit_cap: Optional[float] = None,
    sliding_window: Optional[int] = None,
) -> jax.Array:
    assert sliding_window is None, "sliding window unsupported by this backend"
    k_cache, v_cache = kv.k, kv.v
    assert k_cache.dtype != jnp.int8, "int8 KV not supported by this kernel yet"
    D = q.shape[-1]
    Dp = k_cache.shape[-1]
    if Dp != D:  # cache head_dim is lane-padded
        q = jnp.pad(q, [(0, 0), (0, 0), (0, Dp - D)])
    out = _call(
        q,
        k_cache,
        v_cache,
        jnp.asarray(layer_idx),
        meta.page_table,
        meta.seq_lens,
        page_size=page_size,
        sm_scale=sm_scale,
        logit_cap=logit_cap,
    )
    return out[..., :D]
