"""Reference paged attention in plain XLA ops.

Correctness backend: gathers KV pages into dense per-request form and runs
masked attention. Materialises score matrices, so it is only meant for tests,
CPU runs and small shapes; the Pallas kernels (ops/attention/pallas_*.py) are
the performance path on TPU. Mirrors what FlashInfer provides the reference
(reference: scratchpad/nn/attention/flashinfer_backend.py) and the in-repo
Triton kernels (reference: scratchpad/nn/attention/triton_attn/).

Cache layout: one combined [total_pages, ps, 2*Hkv, D] array with K/V
interleaved per head (see memory/kv_cache.py).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from scratchpad_tpu.executor.forward_meta import ForwardMeta
from scratchpad_tpu.memory.kv_cache import KVCache

_NEG = -1e30


def _quantize_rows(x: jax.Array, qdtype) -> tuple[jax.Array, jax.Array]:
    """Per-(token, head) symmetric low-bit storage:
    x [T, H, D] -> (int8 | float8_e4m3fn values, scale [T, H]).

    Scales are rounded to bf16 BEFORE the divide: the pool stores them in
    bf16 (f32 scale pages were 25-50% of the quantized read), and dividing
    by the exact stored value keeps code*scale consistent everywhere."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    if qdtype == jnp.int8:
        scale = jnp.maximum(amax / 127.0, 1e-8)
        scale = scale.astype(jnp.bfloat16).astype(jnp.float32)
        q = jnp.clip(
            jnp.round(x.astype(jnp.float32) / scale[..., None]), -127, 127
        ).astype(jnp.int8)
    else:  # fp8 e4m3
        scale = jnp.maximum(amax / 448.0, 1e-8)
        scale = scale.astype(jnp.bfloat16).astype(jnp.float32)
        scaled = x.astype(jnp.float32) / scale[..., None]
        # flush sub-normal e4m3 codes (|v| < 2^-6 = 1.5% of the row max):
        # the decode kernel then rebuilds values with the cheap normal-only
        # bit path (gqa_decode.py) — no denormal select per element. The
        # flushed entries carry < 2^-6 of the row's max and are within the
        # quantizer's own error floor.
        scaled = jnp.where(jnp.abs(scaled) < 2.0**-6, 0.0, scaled)
        q = scaled.astype(qdtype)
    return q, scale


_QUANT_KV_DTYPES = (jnp.int8, jnp.float8_e4m3fn)


def write_kv(
    kv: KVCache,
    k_new: jax.Array,  # [T, Hkv, D]
    v_new: jax.Array,
    layer_idx: jax.Array,  # scalar i32
    out_cache_loc: jax.Array,  # i32[T] per-layer slot indices
) -> KVCache:
    """Scatter new KV rows into the cache (set_kv_buffer analogue,
    reference: scratchpad/memory/pool.py:392-424). INT8 caches additionally
    store per-(row, head) scales — finer than the reference's static
    per-layer fp8 scales (pool.py:274-278)."""
    if kv.inline_scale:
        return _write_kv_inline(kv, k_new, v_new, layer_idx, out_cache_loc)
    if kv.lane_heads:
        return _write_kv_lanes(kv, k_new, v_new, layer_idx, out_cache_loc)
    Pg, ps, H2, Dp = kv.kv.shape
    T, Hkv, D = k_new.shape
    if kv.packed:
        # K in lanes [0, half), V in [half, 2*half) of one row per head
        half = Dp // 2
        pad = [(0, 0), (0, 0), (0, half - D)]
        if kv.kv.dtype in _QUANT_KV_DTYPES:
            # quantize the halves SEPARATELY so K and V keep their own
            # per-(token, head) scales (interleaved [k0, v0, ...] lanes of
            # the scale pool, same as the padded layout)
            kq, ks = _quantize_rows(jnp.pad(k_new, pad), kv.kv.dtype)
            vq, vs = _quantize_rows(jnp.pad(v_new, pad), kv.kv.dtype)
            upd = jnp.concatenate([kq, vq], axis=-1)  # [T, Hkv, Dp]
            sc = jnp.stack([ks, vs], axis=2).reshape(T, 2 * Hkv)
            SL = kv.scale.shape[-1]
            ns = kv.scale_shards
            per = SL // ns
            sc = jnp.pad(
                sc.reshape(T, ns, 2 * Hkv // ns),
                [(0, 0), (0, 0), (0, per - 2 * Hkv // ns)],
            ).reshape(T, SL)
            rows = layer_idx * kv.slots_per_layer + out_cache_loc
            scale = (
                kv.scale.reshape(Pg * ps, SL)
                .at[rows]
                .set(sc.astype(kv.scale.dtype))
                .reshape(Pg, ps, SL)
            )
            new_kv = (
                kv.kv.reshape(Pg * ps, H2, Dp)
                .at[rows]
                .set(upd)
                .reshape(Pg, ps, H2, Dp)
            )
            import dataclasses

            return dataclasses.replace(kv, kv=new_kv, scale=scale)
        upd = jnp.concatenate(
            [jnp.pad(k_new, pad), jnp.pad(v_new, pad)], axis=-1
        )  # [T, Hkv, Dp]
    else:
        if Dp != D:  # cache head_dim is lane-padded (kv_cache.padded_head_dim)
            pad = [(0, 0), (0, 0), (0, Dp - D)]
            k_new = jnp.pad(k_new, pad)
            v_new = jnp.pad(v_new, pad)
        # interleave per head: [T, Hkv, 2, Dp] -> [T, 2*Hkv, Dp]
        upd = jnp.stack([k_new, v_new], axis=2).reshape(T, H2, Dp)
    rows = layer_idx * kv.slots_per_layer + out_cache_loc  # global rows
    # scatter over ONE flattened leading dim (free leading-dim merge): on
    # quantized pools a 2-D (page, offset) index scatter made XLA:TPU pick
    # a transposed operand layout that conflicted with the gather/kernel
    # consumers (full-pool relayout copies, HBM OOM at serving sizes);
    # whole-row 1-D scatters keep the default layout everywhere
    scale = kv.scale
    if kv.kv.dtype in _QUANT_KV_DTYPES:
        upd, sc = _quantize_rows(upd, kv.kv.dtype)  # sc [T, 2Hkv]
        SL = scale.shape[-1]  # scale_shards lane-padded blocks (>= 128 each)
        ns = kv.scale_shards
        per = SL // ns
        # head slot h lands in block h // (H2/ns), lane h % (H2/ns) — each
        # tp shard's 128-lane block carries its own heads' scales, so the
        # update stays aligned with the pool's lane sharding
        sc = jnp.pad(
            sc.reshape(T, ns, H2 // ns),
            [(0, 0), (0, 0), (0, per - H2 // ns)],
        ).reshape(T, SL)
        scale = (
            scale.reshape(Pg * ps, SL).at[rows].set(sc.astype(scale.dtype)).reshape(Pg, ps, SL)
        )
    new_kv = (
        kv.kv.reshape(Pg * ps, H2, Dp)
        .at[rows]
        .set(upd.astype(kv.kv.dtype))
        .reshape(Pg, ps, H2, Dp)
    )
    import dataclasses

    return dataclasses.replace(kv, kv=new_kv, scale=scale)


def _write_kv_inline(
    kv: KVCache, k_new, v_new, layer_idx, out_cache_loc
) -> KVCache:
    """write_kv for inline-scale quantized pools (see
    memory/kv_cache.py KVCacheConfig.inline_scale): one whole-row scatter
    carries the quantized kv lanes AND the bf16 scales encoded as hi/lo
    byte planes in the last 256 lanes — page moves (radix, host tier) and
    the decode kernel then touch a single array."""
    import dataclasses

    Pg, ps, Ltot = kv.kv.shape
    H2 = kv.lane_head_slots
    kvL = kv.kv_lanes
    Dp = kvL // H2
    T, Hkv, D = k_new.shape
    if kv.packed:
        half = Dp // 2
        pad = [(0, 0), (0, 0), (0, half - D)]
        kq, ks = _quantize_rows(jnp.pad(k_new, pad), kv.kv.dtype)
        vq, vs = _quantize_rows(jnp.pad(v_new, pad), kv.kv.dtype)
        upd = jnp.concatenate([kq, vq], axis=-1)  # [T, Hkv, Dp]
    else:
        if Dp != D:
            pad = [(0, 0), (0, 0), (0, Dp - D)]
            k_new = jnp.pad(k_new, pad)
            v_new = jnp.pad(v_new, pad)
        rows3 = jnp.stack([k_new, v_new], axis=2).reshape(T, H2, Dp)
        upd, sc_all = _quantize_rows(rows3, kv.kv.dtype)
    if kv.packed:
        sc_all = jnp.stack([ks, vs], axis=2).reshape(T, 2 * Hkv)
    else:
        sc_all = sc_all  # [T, H2] == [T, 2Hkv]
    # bf16 scale -> hi/lo byte planes (128 lanes each, slot j at lane j)
    bits = jax.lax.bitcast_convert_type(
        sc_all.astype(jnp.bfloat16), jnp.uint16
    ).astype(jnp.int32)
    hi = (bits >> 8).astype(jnp.int8)
    lo = (bits & 0xFF).astype(jnp.int8)
    nsl = sc_all.shape[-1]
    hi = jnp.pad(hi, [(0, 0), (0, 128 - nsl)])
    lo = jnp.pad(lo, [(0, 0), (0, 128 - nsl)])
    if kv.kv.dtype != jnp.int8:
        # fp8 pools: BIT-preserve the byte planes (a value cast to e4m3
        # would destroy them)
        hi = jax.lax.bitcast_convert_type(hi, kv.kv.dtype)
        lo = jax.lax.bitcast_convert_type(lo, kv.kv.dtype)
    row = jnp.concatenate(
        [upd.astype(kv.kv.dtype).reshape(T, kvL), hi, lo], axis=-1
    )  # [T, kvL + 256]
    rows = layer_idx * kv.slots_per_layer + out_cache_loc
    new_kv = (
        kv.kv.reshape(Pg * ps, Ltot).at[rows].set(row).reshape(Pg, ps, Ltot)
    )
    return dataclasses.replace(kv, kv=new_kv)


def inline_scales_of(rows: jax.Array, n_slots: int) -> jax.Array:
    """Decode the hi/lo byte planes of inline-scale rows back to f32
    scales [..., n_slots] (inverse of _write_kv_inline's encoding; the
    Pallas kernels inline the same i32-shift+bitcast arithmetic)."""
    planes = rows[..., -256:]
    if planes.dtype != jnp.int8:  # fp8 pools: reinterpret, don't convert
        planes = jax.lax.bitcast_convert_type(planes, jnp.int8)
    hi = planes[..., :128].astype(jnp.int32) & 0xFF
    lo = planes[..., 128:].astype(jnp.int32) & 0xFF
    f = jax.lax.bitcast_convert_type(
        ((hi << 24) | (lo << 16)).astype(jnp.int32), jnp.float32
    )
    return f[..., :n_slots]


def _write_kv_lanes(
    kv: KVCache, k_new, v_new, layer_idx, out_cache_loc
) -> KVCache:
    """write_kv for the lane-folded pool [Pg, ps, 2Hkv*Dp] (see
    memory/kv_cache.py KVCacheConfig.lane_heads): rows carry the head
    slots as consecutive Dp-lane blocks, so the scatter writes whole
    flattened rows exactly like the 4-D path — same layout-landmine-safe
    1-D leading-dim scatter, just wider rows."""
    import dataclasses

    Pg, ps, L = kv.kv.shape
    H2 = kv.lane_head_slots
    Dp = L // H2
    T, Hkv, D = k_new.shape
    if Dp != D:
        pad = [(0, 0), (0, 0), (0, Dp - D)]
        k_new = jnp.pad(k_new, pad)
        v_new = jnp.pad(v_new, pad)
    # interleave per head: [T, Hkv, 2, Dp] -> [T, H2, Dp]
    upd = jnp.stack([k_new, v_new], axis=2).reshape(T, H2, Dp)
    rows = layer_idx * kv.slots_per_layer + out_cache_loc
    scale = kv.scale
    if kv.kv.dtype in _QUANT_KV_DTYPES:
        upd, sc = _quantize_rows(upd, kv.kv.dtype)  # sc [T, H2]
        SL = scale.shape[-1]
        ns = kv.scale_shards
        per = SL // ns
        sc = jnp.pad(
            sc.reshape(T, ns, H2 // ns),
            [(0, 0), (0, 0), (0, per - H2 // ns)],
        ).reshape(T, SL)
        scale = (
            scale.reshape(Pg * ps, SL).at[rows].set(sc.astype(scale.dtype)).reshape(Pg, ps, SL)
        )
    new_kv = (
        kv.kv.reshape(Pg * ps, L)
        .at[rows]
        .set(upd.astype(kv.kv.dtype).reshape(T, L))
        .reshape(Pg, ps, L)
    )
    return dataclasses.replace(kv, kv=new_kv, scale=scale)


def _gather_kv(kv: KVCache, layer_idx, meta: ForwardMeta, page_size: int, D: int):
    """Dense per-request KV: [B, S_max, Hkv, D], S_max = MAXP * page_size.
    Dequantizes int8 rows with their stored scales."""
    if kv.inline_scale:
        return _gather_kv_inline(kv, layer_idx, meta, page_size, D)
    if kv.lane_heads:
        return _gather_kv_lanes(kv, layer_idx, meta, page_size, D)
    Pg, ps, H2, Dp = kv.kv.shape
    B, maxp = meta.page_table.shape
    offsets = jnp.arange(page_size, dtype=jnp.int32)
    slots_per_layer = kv.slots_per_layer
    slots = (
        meta.page_table[:, :, None] * page_size + offsets[None, None, :]
    ).reshape(B, maxp * page_size)
    rows = layer_idx * slots_per_layer + slots  # [B, S_max] global
    # gather over ONE flattened leading dim: [Pg, ps, ...] -> [Pg*ps, ...]
    # is a free leading-dim merge, and whole-row gathers keep the pool in
    # its default layout (2-D index gathers on s8 pools made XLA:TPU pick a
    # transposed operand layout -> a full-pool relayout copy per call)
    Hd = kv.kv.shape[2]
    flat = kv.kv.reshape(Pg * ps, Hd, Dp)
    if kv.packed:
        g = jnp.take(flat, rows, axis=0)  # [B, S_max, Hkv, 128]
        half = Dp // 2
        if kv.kv.dtype in _QUANT_KV_DTYPES:
            SL = kv.scale.shape[-1]
            ns = kv.scale_shards
            sc = jnp.take(kv.scale.reshape(Pg * ps, SL), rows, axis=0)
            sc = sc.reshape(sc.shape[:-1] + (ns, SL // ns))[
                ..., : 2 * Hd // ns
            ].reshape(sc.shape[:-1] + (2 * Hd,))
            gf = g.astype(jnp.float32)
            k = gf[..., :D] * sc[..., 0::2][..., None]
            v = gf[..., half : half + D] * sc[..., 1::2][..., None]
            return k, v
        return g[..., :D], g[..., half : half + D]
    g = jnp.take(flat, rows, axis=0)[..., :D]  # [B, S_max, 2Hkv, D]
    if kv.kv.dtype in _QUANT_KV_DTYPES:
        SL = kv.scale.shape[-1]
        ns = kv.scale_shards
        sc = jnp.take(kv.scale.reshape(Pg * ps, SL), rows, axis=0)
        # undo the per-tp-shard 128-lane block layout (see KVCache.scale)
        sc = sc.reshape(sc.shape[:-1] + (ns, SL // ns))[..., : Hd // ns]
        sc = sc.reshape(sc.shape[:-2] + (Hd,))
        g = g.astype(jnp.float32) * sc[..., None]
    k = g[:, :, 0::2, :]
    v = g[:, :, 1::2, :]
    return k, v


def _gather_kv_lanes(
    kv: KVCache, layer_idx, meta: ForwardMeta, page_size: int, D: int
):
    """_gather_kv for the lane-folded pool: rows gather flat [2Hkv*Dp] and
    reshape into head blocks AFTER the gather (batch-sized, not pool-sized,
    so the pool keeps its default layout)."""
    Pg, ps, L = kv.kv.shape
    H2 = kv.lane_head_slots
    Dp = L // H2
    B, maxp = meta.page_table.shape
    offsets = jnp.arange(page_size, dtype=jnp.int32)
    slots = (
        meta.page_table[:, :, None] * page_size + offsets[None, None, :]
    ).reshape(B, maxp * page_size)
    rows = layer_idx * kv.slots_per_layer + slots
    flat = kv.kv.reshape(Pg * ps, L)
    g = jnp.take(flat, rows, axis=0)  # [B, S_max, L]
    g = g.reshape(B, g.shape[1], H2, Dp)[..., :D]
    if kv.kv.dtype in _QUANT_KV_DTYPES:
        SL = kv.scale.shape[-1]
        ns = kv.scale_shards
        sc = jnp.take(kv.scale.reshape(Pg * ps, SL), rows, axis=0)
        sc = sc.reshape(sc.shape[:-1] + (ns, SL // ns))[..., : H2 // ns]
        sc = sc.reshape(sc.shape[:-2] + (H2,))
        g = g.astype(jnp.float32) * sc[..., None]
    return g[:, :, 0::2, :], g[:, :, 1::2, :]


def _gather_kv_inline(
    kv: KVCache, layer_idx, meta: ForwardMeta, page_size: int, D: int
):
    """_gather_kv for inline-scale quantized pools: whole rows gather flat
    [kvL + 256], then the kv lanes dequantize with the scales decoded from
    the row's own byte planes (inline_scales_of)."""
    Pg, ps, Ltot = kv.kv.shape
    H2 = kv.lane_head_slots
    kvL = kv.kv_lanes
    Dp = kvL // H2
    B, maxp = meta.page_table.shape
    offsets = jnp.arange(page_size, dtype=jnp.int32)
    slots = (
        meta.page_table[:, :, None] * page_size + offsets[None, None, :]
    ).reshape(B, maxp * page_size)
    rows = layer_idx * kv.slots_per_layer + slots
    flat = kv.kv.reshape(Pg * ps, Ltot)
    g = jnp.take(flat, rows, axis=0)  # [B, S_max, kvL+256]
    Hkv = kv.num_kv_heads
    sc = inline_scales_of(g, 2 * Hkv)  # [B, S_max, 2Hkv]
    vals = g[..., :kvL].reshape(B, g.shape[1], H2, Dp)
    if vals.dtype == jnp.int8:
        vals = vals.astype(jnp.int32).astype(jnp.float32)
    else:
        vals = vals.astype(jnp.float32)
    if kv.packed:
        half = Dp // 2
        k = vals[..., :D] * sc[..., 0::2][..., None]
        v = vals[..., half : half + D] * sc[..., 1::2][..., None]
        return k, v
    vals = vals[..., :D] * sc[..., None]
    return vals[:, :, 0::2, :], vals[:, :, 1::2, :]


def _softcap(scores: jax.Array, cap: Optional[float]) -> jax.Array:
    if cap is None:
        return scores
    return cap * jnp.tanh(scores / cap)


def decode_attention_xla(
    q: jax.Array,  # [B, Hq, D]
    kv: KVCache,
    layer_idx: jax.Array,
    meta: ForwardMeta,
    *,
    page_size: int,
    sm_scale: float,
    logit_cap: Optional[float] = None,
    sliding_window: Optional[int] = None,
    sinks: Optional[jax.Array] = None,  # f32[Hq] learned sink logits
    chunk_size: Optional[int] = None,  # Llama4 chunked attention
) -> jax.Array:
    B, Hq, D = q.shape
    k, v = _gather_kv(kv, layer_idx, meta, page_size, D)
    S = k.shape[1]
    Hkv = k.shape[2]
    G = Hq // Hkv
    qg = q.reshape(B, Hkv, G, D)
    scores = jnp.einsum(
        "bhgd,bshd->bhgs", qg.astype(jnp.float32), k.astype(jnp.float32)
    )
    scores = _softcap(scores * sm_scale, logit_cap)
    kv_idx = jnp.arange(S, dtype=jnp.int32)
    valid = kv_idx[None, :] < meta.seq_lens[:, None]  # [B, S]
    if sliding_window is not None:
        valid &= kv_idx[None, :] >= meta.seq_lens[:, None] - sliding_window
    if chunk_size is not None:
        # attend only within the query's chunk (block-diagonal causal)
        valid &= kv_idx[None, :] // chunk_size == (
            (meta.seq_lens[:, None] - 1) // chunk_size
        )
    scores = jnp.where(valid[:, None, None, :], scores, _NEG)
    if sinks is not None:
        # attention sinks (GPT-OSS): a learned per-head logit joins the
        # softmax competition but contributes no value
        sk = jnp.broadcast_to(
            sinks.astype(jnp.float32).reshape(1, Hkv, G, 1), (B, Hkv, G, 1)
        )
        p = jax.nn.softmax(jnp.concatenate([scores, sk], axis=-1), axis=-1)
        p = p[..., :-1]
    else:
        p = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhgs,bshd->bhgd", p, v.astype(jnp.float32))
    return out.reshape(B, Hq, D).astype(q.dtype)


def extend_attention_xla(
    q: jax.Array,  # [T, Hq, D] flat new-token queries
    kv: KVCache,
    layer_idx: jax.Array,
    meta: ForwardMeta,
    *,
    page_size: int,
    sm_scale: float,
    logit_cap: Optional[float] = None,
    sliding_window: Optional[int] = None,
    sinks: Optional[jax.Array] = None,  # f32[Hq] learned sink logits
    chunk_size: Optional[int] = None,  # Llama4 chunked attention
) -> jax.Array:
    """Ragged extend attention: new tokens attend to (prefix + in-chunk causal).

    The new tokens' KV must already be in the cache (write before attend), so
    a single position-based causal mask covers both the cached prefix and the
    in-chunk part — the reference needs a two-kernel merge_state cascade for
    this (flashinfer_backend.py:419-440); here the paged cache unifies it.
    """
    T, Hq, D = q.shape
    B = meta.batch_size
    k, v = _gather_kv(kv, layer_idx, meta, page_size, D)
    S = k.shape[1]
    Hkv = k.shape[2]
    G = Hq // Hkv

    # scatter flat queries to padded [B, T, Hq, D] (E_max = T upper bound)
    starts = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(meta.extend_lens)[:-1]]
    )
    intra = jnp.arange(T, dtype=jnp.int32) - starts[meta.req_indices]
    qp = jnp.zeros((B, T, Hq, D), q.dtype)
    qp = qp.at[meta.req_indices, intra].set(q)
    pos_p = jnp.zeros((B, T), jnp.int32)
    pos_p = pos_p.at[meta.req_indices, intra].set(meta.positions)

    qg = qp.reshape(B, T, Hkv, G, D)
    scores = jnp.einsum(
        "bthgd,bshd->bhgts", qg.astype(jnp.float32), k.astype(jnp.float32)
    )
    scores = _softcap(scores * sm_scale, logit_cap)
    kv_idx = jnp.arange(S, dtype=jnp.int32)
    valid = kv_idx[None, None, :] <= pos_p[:, :, None]  # [B, T, S] causal+prefix
    valid &= kv_idx[None, None, :] < meta.seq_lens[:, None, None]
    if sliding_window is not None:
        valid &= kv_idx[None, None, :] > pos_p[:, :, None] - sliding_window
    if chunk_size is not None:
        valid &= (
            kv_idx[None, None, :] // chunk_size
            == pos_p[:, :, None] // chunk_size
        )
    if meta.mm_spans is not None:
        # Gemma3-MM: tokens of the same image span attend bidirectionally,
        # overriding causality and any sliding window (HF token-type mask;
        # reference: scratchpad/nn/models/gemma/gemma3_mm.py:212-232)
        s0 = meta.mm_spans[..., 0]  # [B, M]
        s1 = meta.mm_spans[..., 1]
        q_in = (pos_p[:, :, None] >= s0[:, None, :]) & (
            pos_p[:, :, None] < s1[:, None, :]
        )  # [B, T, M]
        kv_in = (kv_idx[None, None, :] >= s0[:, :, None]) & (
            kv_idx[None, None, :] < s1[:, :, None]
        )  # [B, M, S]
        same_span = (
            jnp.einsum(
                "btm,bms->bts",
                q_in.astype(jnp.float32),
                kv_in.astype(jnp.float32),
            )
            > 0
        )
        valid |= same_span & (
            kv_idx[None, None, :] < meta.seq_lens[:, None, None]
        )
    scores = jnp.where(valid[:, None, None, :, :], scores, _NEG)
    if sinks is not None:
        sk = jnp.broadcast_to(
            sinks.astype(jnp.float32).reshape(1, Hkv, G, 1, 1),
            scores.shape[:-1] + (1,),
        )
        p = jax.nn.softmax(jnp.concatenate([scores, sk], axis=-1), axis=-1)
        p = p[..., :-1]
    else:
        p = jax.nn.softmax(scores, axis=-1)
    outp = jnp.einsum("bhgts,bshd->bthgd", p, v.astype(jnp.float32))
    outp = outp.reshape(B, T, Hq, D)
    out = outp[meta.req_indices, intra]
    return out.astype(q.dtype)
