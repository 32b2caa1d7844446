"""In-repo Pallas paged flash-decode attention for TPU.

Replaces the reference's FlashInfer paged decode and its 2-stage Triton
flash-decode (reference: scratchpad/nn/attention/triton_attn/decode_attention.py:12-608)
with a single-pass online-softmax kernel over the paged cache. The default
TPU backend is the unified ragged kernel (ragged_backend.py); this kernel is
the simpler decode-only in-repo alternative.

- combined cache [total_pages, ps, 2*Hkv, D] (K/V interleaved per head);
  the layer folds into the page index host-side
- grid (batch,): each program owns one request; ONE strided DMA per page
  moves all heads' K and V slabs at once (requires the lane-padded cache)
- double-buffered chunks of CHUNK_PAGES pages; online softmax in f32;
  seq_len == 0 rows (batch padding) write zeros
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from scratchpad_tpu.executor.forward_meta import ForwardMeta
from scratchpad_tpu.memory.kv_cache import KVCache

_NEG = -1e30
CHUNK_PAGES = 8  # pages per buffered chunk


def _decode_kernel(
    # scalar prefetch
    pt_ref,  # i32[B, P] global page table (layer folded in)
    len_ref,  # i32[B] seq lens
    # inputs
    q_ref,  # VMEM [B, Hq, D] (full array)
    kv_hbm,  # ANY  [Pglobal, ps, 2Hkv, D]
    # output
    o_ref,  # VMEM [B, Hq, D]
    # scratch
    kv_buf,  # VMEM [2, CHUNK_PAGES, ps, 2Hkv, D]
    sems,  # DMA sems [2]
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
    Hkv = kv_buf.shape[3] // 2
    G = Hq // Hkv

    def chunk_dmas(c, slot):
        """One copy per page moving the whole [ps, 2Hkv, D] page."""
        out = []
        for j in range(CHUNK_PAGES):
            page = pt_ref[b, c * CHUNK_PAGES + j]
            out.append(
                pltpu.make_async_copy(
                    kv_hbm.at[page], kv_buf.at[slot, j], sems.at[slot]
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

        arr = kv_buf[slot].reshape(CHUNK, 2 * Hkv, D)
        arr = arr.reshape(CHUNK, Hkv, 2, D).astype(jnp.float32)
        # head-major for the dots: Mosaic requires batch dims in the SAME
        # position on both operands ("batch dims must be equal")
        k = arr[:, :, 0, :].transpose(1, 0, 2)  # [Hkv, CHUNK, D]
        v = arr[:, :, 1, :].transpose(1, 0, 2)
        # batch over heads: q [Hkv, G, D] x k [Hkv, CHUNK, D] -> [Hkv, G, CHUNK]
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
    static_argnames=(
        "page_size", "sm_scale", "logit_cap", "sliding_window", "num_layers"
    ),
)
def _paged_decode_call(
    q, kv_pages, layer_idx, page_table, seq_lens,
    *, page_size, sm_scale, logit_cap, sliding_window, num_layers,
):
    B, Hq, D = q.shape
    Pg, ps, H2, Dp = kv_pages.shape
    Hkv = H2 // 2
    Ptot = Pg // num_layers
    P = page_table.shape[1]
    P_pad = -(-P // CHUNK_PAGES) * CHUNK_PAGES
    if P_pad != P:
        page_table = jnp.pad(page_table, ((0, 0), (0, P_pad - P)))
    page_table = page_table + layer_idx.astype(jnp.int32) * Ptot
    num_chunks = P_pad // CHUNK_PAGES

    if Dp != D:
        q = jnp.pad(q, [(0, 0), (0, 0), (0, Dp - D)])

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
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, CHUNK_PAGES, ps, H2, Dp), kv_pages.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hq, Dp), q.dtype),
        interpret=jax.default_backend() == "cpu",
    )(
        page_table.astype(jnp.int32),
        seq_lens.astype(jnp.int32),
        q,
        kv_pages,
    )
    return out[..., :D]


def decode_attention_pallas(
    q: jax.Array,  # [B, Hq, D]
    kv: KVCache,
    layer_idx: jax.Array,
    meta: ForwardMeta,
    *,
    page_size: int,
    sm_scale: float,
    logit_cap: Optional[float] = None,
    sliding_window: Optional[int] = None,
) -> jax.Array:
    """Drop-in replacement for decode_attention_xla (same signature)."""
    assert kv.kv.dtype not in (jnp.int8, jnp.float8_e4m3fn), "int8 KV not supported by this kernel yet"
    return _paged_decode_call(
        q,
        kv.kv,
        jnp.asarray(layer_idx),
        meta.page_table,
        meta.seq_lens,
        page_size=page_size,
        sm_scale=sm_scale,
        logit_cap=logit_cap,
        sliding_window=sliding_window,
        num_layers=kv.num_layers,
    )
