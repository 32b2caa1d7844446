"""Multi-head latent attention (MLA) over the paged latent cache.

TPU-native analogue of the reference's MLA path (MLATokenToKVPool,
reference: scratchpad/memory/pool.py:427-474; MLA decode kernels,
scratchpad/nn/attention/triton_attn/decode_attention.py:358 grouped MQA
variant). The cache stores ONE vector per token per layer —
``[c_kv (kv_lora_rank) | k_rope (qk_rope_head_dim)]`` — and attention runs
in the compressed space via weight absorption:

    score(t, s) = q_nope_t · (W_UK c_s) + q_rope_t · k_rope_s
                = (W_UK^T q_nope_t) · c_s + q_rope_t · k_rope_s

so the model hands this backend ``q_lat = W_UK^T q_nope`` [T, Hq, r] and
``q_rope`` [T, Hq, dr]; the output is the attention-weighted latent
``sum_s p(t,s) c_s`` [T, Hq, r], which the model expands with W_UV. KV
reads are MQA-shaped (every q head shares the one latent stream), which is
exactly the memory-bound regime MLA was designed for.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from scratchpad_tpu.executor.forward_meta import ForwardMeta, ForwardMode
from scratchpad_tpu.memory.kv_cache import KVCache

_NEG = jnp.float32(-1e30)


def write_latent(
    kv: KVCache, lat: jax.Array, layer_idx: jax.Array, loc: jax.Array
) -> KVCache:
    """Scatter new latent rows ([T, r+dr]) at global slots ``loc``."""
    ps = kv.kv.shape[1]
    rows = layer_idx.astype(jnp.int32) * kv.slots_per_layer + loc
    new = kv.kv.at[rows // ps, rows % ps, 0].set(lat.astype(kv.kv.dtype))
    import dataclasses

    return dataclasses.replace(kv, kv=new)


def _gather_latent(kv: KVCache, layer_idx, meta: ForwardMeta, page_size: int):
    """[B, S, r+dr] latent rows via the per-request page table."""
    pt = meta.page_table + layer_idx.astype(jnp.int32) * kv.pages_per_layer
    g = kv.kv[pt]  # [B, P, ps, 1, D]
    B, P = pt.shape
    return g.reshape(B, P * page_size, kv.kv.shape[-1])


def mla_attention_xla(
    q_lat: jax.Array,  # [T, Hq, r]  (nope part absorbed through W_UK)
    q_rope: jax.Array,  # [T, Hq, dr]
    kv: KVCache,
    layer_idx: jax.Array,
    meta: ForwardMeta,
    *,
    page_size: int,
    sm_scale: float,
) -> jax.Array:
    """Returns the weighted latent [T, Hq, r]; both EXTEND and DECODE."""
    T, Hq, r = q_lat.shape
    B = meta.batch_size
    lat = _gather_latent(kv, layer_idx, meta, page_size)  # [B, S, r+dr]
    S = lat.shape[1]
    ckv = lat[..., :r].astype(jnp.float32)
    krope = lat[..., r:].astype(jnp.float32)
    kv_idx = jnp.arange(S, dtype=jnp.int32)

    if meta.mode == ForwardMode.DECODE:
        scores = jnp.einsum(
            "bhr,bsr->bhs", q_lat.astype(jnp.float32), ckv
        ) + jnp.einsum("bhd,bsd->bhs", q_rope.astype(jnp.float32), krope)
        valid = kv_idx[None, :] < meta.seq_lens[:, None]
        scores = jnp.where(valid[:, None, :], scores * sm_scale, _NEG)
        p = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhs,bsr->bhr", p, ckv)
        return out.astype(q_lat.dtype)

    # extend: scatter flat ragged queries to padded [B, T, ...] rows
    starts = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(meta.extend_lens)[:-1]]
    )
    intra = jnp.arange(T, dtype=jnp.int32) - starts[meta.req_indices]
    qlp = jnp.zeros((B, T, Hq, r), q_lat.dtype)
    qlp = qlp.at[meta.req_indices, intra].set(q_lat)
    qrp = jnp.zeros((B, T, Hq, q_rope.shape[-1]), q_rope.dtype)
    qrp = qrp.at[meta.req_indices, intra].set(q_rope)
    pos_p = jnp.zeros((B, T), jnp.int32)
    pos_p = pos_p.at[meta.req_indices, intra].set(meta.positions)

    scores = jnp.einsum(
        "bthr,bsr->bhts", qlp.astype(jnp.float32), ckv
    ) + jnp.einsum("bthd,bsd->bhts", qrp.astype(jnp.float32), krope)
    valid = kv_idx[None, None, :] <= pos_p[:, :, None]  # causal + prefix
    valid &= kv_idx[None, None, :] < meta.seq_lens[:, None, None]
    scores = jnp.where(valid[:, None, :, :], scores * sm_scale, _NEG)
    p = jax.nn.softmax(scores, axis=-1)
    outp = jnp.einsum("bhts,bsr->bthr", p, ckv)
    out = outp[meta.req_indices, intra]
    return out.astype(q_lat.dtype)