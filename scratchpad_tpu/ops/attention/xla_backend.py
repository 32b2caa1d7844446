"""Reference paged attention in plain XLA ops.

Correctness backend: gathers KV pages into dense per-request form and runs
masked attention. Materialises score matrices, so it is only meant for tests,
CPU runs and small shapes; the Pallas kernels (ops/attention/pallas_*.py) are
the performance path on TPU. Mirrors what FlashInfer provides the reference
(reference: scratchpad/nn/attention/flashinfer_backend.py) and the in-repo
Triton kernels (reference: scratchpad/nn/attention/triton_attn/).

Cache layout: k_cache/v_cache are [L, Hkv, S, D] (see memory/kv_cache.py).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from scratchpad_tpu.executor.forward_meta import ForwardMeta

_NEG = -1e30


def write_kv(
    k_cache: jax.Array,  # [Hkv, L, S, D]
    v_cache: jax.Array,
    k_new: jax.Array,  # [T, Hkv, D]
    v_new: jax.Array,
    layer_idx: jax.Array,  # scalar i32
    out_cache_loc: jax.Array,  # i32[T] slot indices
) -> tuple[jax.Array, jax.Array]:
    """Scatter new KV rows into the cache (set_kv_buffer analogue,
    reference: scratchpad/memory/pool.py:392-424)."""
    Dp = k_cache.shape[-1]
    D = k_new.shape[-1]
    if Dp != D:  # cache head_dim is lane-padded (see kv_cache.padded_head_dim)
        pad = [(0, 0), (0, 0), (0, Dp - D)]
        k_new = jnp.pad(k_new, pad)
        v_new = jnp.pad(v_new, pad)
    # adjacent advanced indices (layer_idx, out_cache_loc) broadcast to [T]
    # in place, so the update shape is [Hkv, T, D]
    k_cache = k_cache.at[:, layer_idx, out_cache_loc, :].set(
        k_new.astype(k_cache.dtype).transpose(1, 0, 2)
    )
    v_cache = v_cache.at[:, layer_idx, out_cache_loc, :].set(
        v_new.astype(v_cache.dtype).transpose(1, 0, 2)
    )
    return k_cache, v_cache


def _pad_q(q: jax.Array, Dp: int) -> jax.Array:
    D = q.shape[-1]
    if D == Dp:
        return q
    return jnp.pad(q, [(0, 0)] * (q.ndim - 1) + [(0, Dp - D)])


def _gather_kv(k_cache, v_cache, layer_idx, meta: ForwardMeta, page_size: int):
    """Dense per-request KV: [B, S_max, Hkv, D], S_max = MAXP * page_size."""
    B, maxp = meta.page_table.shape
    offsets = jnp.arange(page_size, dtype=jnp.int32)
    slots = (
        meta.page_table[:, :, None] * page_size + offsets[None, None, :]
    ).reshape(B, maxp * page_size)
    k = k_cache[:, layer_idx, slots].transpose(1, 2, 0, 3)  # [B, S_max, Hkv, D]
    v = v_cache[:, layer_idx, slots].transpose(1, 2, 0, 3)
    return k, v


def _softcap(scores: jax.Array, cap: Optional[float]) -> jax.Array:
    if cap is None:
        return scores
    return cap * jnp.tanh(scores / cap)


def decode_attention_xla(
    q: jax.Array,  # [B, Hq, D]
    k_cache: jax.Array,
    v_cache: jax.Array,
    layer_idx: jax.Array,
    meta: ForwardMeta,
    *,
    page_size: int,
    sm_scale: float,
    logit_cap: Optional[float] = None,
    sliding_window: Optional[int] = None,
) -> jax.Array:
    B, Hq, D = q.shape
    q = _pad_q(q, k_cache.shape[-1])
    Dp = q.shape[-1]
    k, v = _gather_kv(k_cache, v_cache, layer_idx, meta, page_size)
    S = k.shape[1]
    Hkv = k.shape[2]
    G = Hq // Hkv
    qg = q.reshape(B, Hkv, G, Dp)
    scores = jnp.einsum(
        "bhgd,bshd->bhgs", qg.astype(jnp.float32), k.astype(jnp.float32)
    )
    scores = _softcap(scores * sm_scale, logit_cap)
    kv_idx = jnp.arange(S, dtype=jnp.int32)
    valid = kv_idx[None, :] < meta.seq_lens[:, None]  # [B, S]
    if sliding_window is not None:
        valid &= kv_idx[None, :] >= meta.seq_lens[:, None] - sliding_window
    scores = jnp.where(valid[:, None, None, :], scores, _NEG)
    p = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhgs,bshd->bhgd", p, v.astype(jnp.float32))
    return out.reshape(B, Hq, Dp)[..., :D].astype(q.dtype)


def extend_attention_xla(
    q: jax.Array,  # [T, Hq, D] flat new-token queries
    k_cache: jax.Array,
    v_cache: jax.Array,
    layer_idx: jax.Array,
    meta: ForwardMeta,
    *,
    page_size: int,
    sm_scale: float,
    logit_cap: Optional[float] = None,
    sliding_window: Optional[int] = None,
) -> jax.Array:
    """Ragged extend attention: new tokens attend to (prefix + in-chunk causal).

    The new tokens' KV must already be in the cache (write before attend), so
    a single position-based causal mask covers both the cached prefix and the
    in-chunk part — the reference needs a two-kernel merge_state cascade for
    this (flashinfer_backend.py:419-440); here the paged cache unifies it.
    """
    T, Hq, D = q.shape
    q = _pad_q(q, k_cache.shape[-1])
    Dp = q.shape[-1]
    B = meta.batch_size
    k, v = _gather_kv(k_cache, v_cache, layer_idx, meta, page_size)
    S = k.shape[1]
    Hkv = k.shape[2]
    G = Hq // Hkv

    # scatter flat queries to padded [B, T, Hq, Dp] (E_max = T upper bound)
    starts = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(meta.extend_lens)[:-1]]
    )
    intra = jnp.arange(T, dtype=jnp.int32) - starts[meta.req_indices]
    qp = jnp.zeros((B, T, Hq, Dp), q.dtype)
    qp = qp.at[meta.req_indices, intra].set(q)
    pos_p = jnp.zeros((B, T), jnp.int32)
    pos_p = pos_p.at[meta.req_indices, intra].set(meta.positions)

    qg = qp.reshape(B, T, Hkv, G, Dp)
    scores = jnp.einsum(
        "bthgd,bshd->bhgts", qg.astype(jnp.float32), k.astype(jnp.float32)
    )
    scores = _softcap(scores * sm_scale, logit_cap)
    kv_idx = jnp.arange(S, dtype=jnp.int32)
    valid = kv_idx[None, None, :] <= pos_p[:, :, None]  # [B, T, S] causal+prefix
    valid &= kv_idx[None, None, :] < meta.seq_lens[:, None, None]
    if sliding_window is not None:
        valid &= kv_idx[None, None, :] > pos_p[:, :, None] - sliding_window
    scores = jnp.where(valid[:, None, None, :, :], scores, _NEG)
    p = jax.nn.softmax(scores, axis=-1)
    outp = jnp.einsum("bhgts,bshd->bthgd", p, v.astype(jnp.float32))
    outp = outp.reshape(B, T, Hq, Dp)
    out = outp[meta.req_indices, intra][..., :D]
    return out.astype(q.dtype)
