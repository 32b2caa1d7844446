"""Unified paged attention via the ragged-paged-attention Pallas kernel.

Serves BOTH extend (chunked prefill) and decode with one kernel — each
sequence contributes q_len flat query tokens that are causally aligned to
the tail of its kv_len cached tokens, which is exactly this engine's
write-before-attend convention. Replaces the reference's FlashInfer
paged prefill + decode pair and its merge_state cascade
(reference: scratchpad/nn/attention/flashinfer_backend.py:378-446).

The combined [total_pages, ps, 2*Hkv, D] cache is consumed directly; the
layer folds into the page index.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from scratchpad_tpu.executor.forward_meta import ForwardMeta
from scratchpad_tpu.memory.kv_cache import KVCache


@functools.partial(
    jax.jit,
    static_argnames=(
        "page_size",
        "sm_scale",
        "logit_cap",
        "sliding_window",
        "num_layers",
    ),
)
def _ragged_call(
    q,  # [T, Hq, D]
    kv_pages,  # [Pg, ps, 2Hkv, Dp]
    layer_idx,
    page_table,  # [B, P]
    seq_lens,  # [B]
    extend_lens,  # [B]
    *,
    page_size,
    sm_scale,
    logit_cap,
    sliding_window,
    num_layers,
):
    from jax.experimental.pallas.ops.tpu.ragged_paged_attention import (
        ragged_paged_attention,
    )

    T, Hq, D = q.shape
    Pg, ps, H2, Dp = kv_pages.shape
    B = seq_lens.shape[0]
    Ptot = Pg // num_layers
    pt_global = page_table + layer_idx.astype(jnp.int32) * Ptot

    # real request rows come first; padded rows have extend_lens == 0 and
    # are excluded via num_seqs, so their output rows are never computed
    # (and never read — logits are gathered at real rows only)
    num_seqs = jnp.sum(extend_lens > 0).astype(jnp.int32).reshape(1)
    kv_lens = jnp.maximum(seq_lens, 1)
    cu_q = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(extend_lens).astype(jnp.int32)]
    )

    if Dp != D:
        q = jnp.pad(q, [(0, 0), (0, 0), (0, Dp - D)])
    out = ragged_paged_attention(
        q * jnp.asarray(sm_scale, q.dtype),
        kv_pages,
        kv_lens.astype(jnp.int32),
        pt_global.astype(jnp.int32),
        cu_q,
        num_seqs,
        sm_scale=1.0,
        sliding_window=sliding_window,
        soft_cap=logit_cap,
    )
    return out[..., :D]


def attention_ragged(
    q: jax.Array,
    kv: KVCache,
    layer_idx: jax.Array,
    meta: ForwardMeta,
    *,
    page_size: int,
    sm_scale: float,
    logit_cap: Optional[float] = None,
    sliding_window: Optional[int] = None,
) -> jax.Array:
    """Backend entry for both EXTEND and DECODE."""
    assert kv.kv.dtype not in (jnp.int8, jnp.float8_e4m3fn), "int8 KV uses the XLA backend"
    return _ragged_call(
        q,
        kv.kv,
        jnp.asarray(layer_idx),
        meta.page_table,
        meta.seq_lens,
        meta.extend_lens,
        page_size=page_size,
        sm_scale=sm_scale,
        logit_cap=logit_cap,
        sliding_window=sliding_window,
        num_layers=kv.num_layers,
    )
