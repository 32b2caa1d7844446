"""Pallas paged flash-decode attention for TPU.

Replaces the reference's FlashInfer paged decode and its 2-stage Triton
flash-decode (reference: scratchpad/nn/attention/triton_attn/decode_attention.py:12-608)
with a single-pass online-softmax kernel over the paged cache:

- the [Hkv, L, S, D] cache is viewed as one global page pool
  [Hkv, L*Ptot, page_size, D]; the layer is folded into the page index
  host-side (global_page = layer * Ptot + page), so the kernel never slices
  a layer out of the cache
- grid (batch,): each program owns one request and all kv heads; pages are
  DMA'd HBM->VMEM per (head, page) — integer indexing only, which keeps
  every copied block's trailing dims full and tile-aligned — in chunks of
  CHUNK_PAGES with double buffering
- online softmax (m, l, acc) in f32; seq_len == 0 rows (batch padding)
  write zeros

Decode is HBM-bound: the kernel reads exactly the live KV (ceil to chunk)
instead of the padded dense gather the XLA backend does.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from scratchpad_tpu.executor.forward_meta import ForwardMeta

_NEG = -1e30
CHUNK_PAGES = 8  # pages per buffered chunk


def _decode_kernel(
    # scalar prefetch
    pt_ref,  # i32[B, P] global page table (layer folded in)
    len_ref,  # i32[B] seq lens
    # inputs
    q_ref,  # VMEM [B, Hq, D] (full array)
    k_hbm,  # ANY  [Hkv, Pglobal, ps, D]
    v_hbm,
    # output
    o_ref,  # VMEM [B, Hq, D]
    # scratch
    k_buf,  # VMEM [2, Hkv, CHUNK_PAGES, ps, D]
    v_buf,
    sems,  # DMA sems [2, 2]
    *,
    page_size: int,
    sm_scale: float,
    num_chunks: int,
    logit_cap: Optional[float],
    sliding_window: Optional[int],
):
    b = pl.program_id(0)
    seq_len = len_ref[b]
    CHUNK = CHUNK_PAGES * page_size
    Hq, D = q_ref.shape[1], q_ref.shape[2]
    Hkv = k_buf.shape[1]
    G = Hq // Hkv

    def chunk_dmas(c, slot):
        """One strided copy per page moving ALL heads' [ps, D] slabs at once
        (requires the lane-padded cache: trailing dims must be tile-aligned).
        8 DMAs per chunk instead of Hkv*CHUNK_PAGES*2."""
        out = []
        for j in range(CHUNK_PAGES):
            page = pt_ref[b, c * CHUNK_PAGES + j]
            out.append(
                pltpu.make_async_copy(
                    k_hbm.at[:, page], k_buf.at[slot, :, j], sems.at[slot, 0]
                )
            )
            out.append(
                pltpu.make_async_copy(
                    v_hbm.at[:, page], v_buf.at[slot, :, j], sems.at[slot, 1]
                )
            )
        return out

    def start_chunk(c, slot):
        for dma in chunk_dmas(c, slot):
            dma.start()

    def wait_chunk(c, slot):
        for dma in chunk_dmas(c, slot):
            dma.wait()

    q = q_ref[b].astype(jnp.float32).reshape(Hkv, G, D) * sm_scale

    @pl.when(seq_len > 0)
    def _():
        start_chunk(0, 0)

    def body(c, carry):
        m, l, acc = carry
        slot = c % 2

        @pl.when((c + 1) * CHUNK < seq_len)
        def _():
            start_chunk(c + 1, (c + 1) % 2)

        wait_chunk(c, slot)

        k = k_buf[slot].reshape(Hkv, CHUNK, D).astype(jnp.float32)
        v = v_buf[slot].reshape(Hkv, CHUNK, D).astype(jnp.float32)
        # batched over heads: [Hkv, G, D] x [Hkv, CHUNK, D] -> [Hkv, G, CHUNK]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        if logit_cap is not None:
            s = logit_cap * jnp.tanh(s / logit_cap)
        idx = c * CHUNK + jax.lax.broadcasted_iota(jnp.int32, (Hkv, G, CHUNK), 2)
        mask = idx < seq_len
        if sliding_window is not None:
            mask &= idx >= seq_len - sliding_window
        s = jnp.where(mask, s, _NEG)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p, v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        return m_new, l_new, acc_new

    m0 = jnp.full((Hkv, G, 1), _NEG, jnp.float32)
    l0 = jnp.zeros((Hkv, G, 1), jnp.float32)
    acc0 = jnp.zeros((Hkv, G, D), jnp.float32)
    live_chunks = jnp.minimum(pl.cdiv(seq_len, CHUNK), num_chunks)
    m, l, acc = jax.lax.fori_loop(0, live_chunks, body, (m0, l0, acc0))
    out = jnp.where(l > 0, acc / jnp.where(l > 0, l, 1.0), 0.0)
    o_ref[b] = out.reshape(Hq, D).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("page_size", "sm_scale", "logit_cap", "sliding_window"),
)
def _paged_decode_call(
    q, k_cache, v_cache, layer_idx, page_table, seq_lens,
    *, page_size, sm_scale, logit_cap, sliding_window,
):
    B, Hq, D = q.shape
    Hkv, L, S, _ = k_cache.shape
    Ptot = S // page_size
    # global page pool view; contiguous reshape, no copy
    k_pages = k_cache.reshape(Hkv, L * Ptot, page_size, D)
    v_pages = v_cache.reshape(Hkv, L * Ptot, page_size, D)
    P = page_table.shape[1]
    P_pad = -(-P // CHUNK_PAGES) * CHUNK_PAGES
    if P_pad != P:
        page_table = jnp.pad(page_table, ((0, 0), (0, P_pad - P)))
    # fold the layer into the page index (padding pages point at page 0 of
    # this layer — harmless, they are masked)
    page_table = page_table + layer_idx.astype(jnp.int32) * Ptot
    num_chunks = P_pad // CHUNK_PAGES

    kernel = functools.partial(
        _decode_kernel,
        page_size=page_size,
        sm_scale=sm_scale,
        num_chunks=num_chunks,
        logit_cap=logit_cap,
        sliding_window=sliding_window,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # q: full array
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, Hkv, CHUNK_PAGES, page_size, D), k_cache.dtype),
            pltpu.VMEM((2, Hkv, CHUNK_PAGES, page_size, D), v_cache.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hq, D), q.dtype),
        interpret=jax.default_backend() == "cpu",
    )(
        page_table.astype(jnp.int32),
        seq_lens.astype(jnp.int32),
        q,
        k_pages,
        v_pages,
    )
    return out


def decode_attention_pallas(
    q: jax.Array,  # [B, Hq, D]
    kv,  # KVCache with k/v [Hkv, L, S, D]
    layer_idx: jax.Array,
    meta: ForwardMeta,
    *,
    page_size: int,
    sm_scale: float,
    logit_cap: Optional[float] = None,
    sliding_window: Optional[int] = None,
) -> jax.Array:
    """Drop-in replacement for decode_attention_xla (same signature)."""
    k_cache, v_cache = kv.k, kv.v
    assert k_cache.dtype != jnp.int8, "int8 KV not supported by this kernel yet"
    D = q.shape[-1]
    Dp = k_cache.shape[-1]
    if Dp != D:  # cache head_dim is lane-padded
        q = jnp.pad(q, [(0, 0), (0, 0), (0, Dp - D)])
    out = _paged_decode_call(
        q,
        k_cache,
        v_cache,
        jnp.asarray(layer_idx),
        meta.page_table,
        meta.seq_lens,
        page_size=page_size,
        sm_scale=sm_scale,
        logit_cap=logit_cap,
        sliding_window=sliding_window,
    )
    return out[..., :D]
