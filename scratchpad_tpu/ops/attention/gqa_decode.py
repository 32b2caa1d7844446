"""Block-diagonal paged GQA flash-decode kernel (decode v2).

Replaces the per-(seq, head) serial inner loops that make both the bundled
ragged-paged-attention kernel and the v1 in-repo kernel latency-bound at
decode shapes (reference analogue: the 2-stage Triton flash-decode,
scratchpad/nn/attention/triton_attn/decode_attention.py:12-608; see also
the bundled kernel jax/experimental/pallas/ops/tpu/ragged_paged_attention).

Decode is HBM-bound: the whole step should cost ~(live KV bytes / HBM BW).
The TPU has ONE core, so grid parallelism buys nothing — the design goals
are (a) large DMAs, (b) an unbroken DMA pipeline across sequences, and
(c) tiny, relayout-free compute per chunk:

- One DMA per page moves the whole 4-D page block [ps, 2*Hkv, Dp]; the
  chunk is flattened to [CHUNK, LANES] inside VMEM (reshaping the HBM
  array instead would relayout the entire pool per call).
- Per sequence, pages stream in CHUNK_PAGES-sized double-buffered chunks;
  when a sequence's last chunk is issued the NEXT sequence's first chunk
  is prefetched (cursor parity carried across grid steps in SMEM), so the
  DMA queue never drains at sequence boundaries.
- Q is expanded in-kernel into a block-diagonal [Hq, LANES] matrix:
  row h*G+g holds q_{h,g} in head h's K lanes and zeros elsewhere. Then
  ONE dot against the raw chunk [CHUNK, LANES] yields all heads' scores
  [Hq, CHUNK] — no strided loads, no transposes, no per-head loop. The
  wasted MXU flops (x 2*Hkv) are free: decode is bandwidth-bound.
- P@V is one dot back into [Hq, LANES]; each row's V block is selected at
  the end with Dp-aligned lane slices (the K-block and cross-head columns
  of the accumulator are simply never read).
- INT8 KV (per-(token, head) scales, memory/kv_cache.py): because row r's
  score only touches head(r)'s lanes, the scale factors OUT of the dots —
  s = (q_bd @ k_raw) * sel_k @ scales and p' = p * (sel_v @ scales). Two
  extra [Hq, CHUNK]-shaped multiplies; no per-lane dequant anywhere, and
  the streamed bytes halve vs bf16.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from scratchpad_tpu.executor.forward_meta import ForwardMeta
from scratchpad_tpu.memory.kv_cache import KVCache

_NEG = -1e30


def _dequant_chunk(raw, dt):
    """Low-bit chunk codes -> compute dtype (EXACT in bf16: int8 magnitudes
    <= 127 and normal fp8-e4m3 values carry <= 8 mantissa bits)."""
    if raw.dtype == jnp.int8:
        # direct s8 -> bf16/f32 cast: one VPU pass (the r2-era Mosaic
        # rejected it — "no direct int8->float" — but current Mosaic
        # compiles it, AOT-probed r5; the old 3-pass i32->f32->bf16 chain
        # was part of the int8 kernel's compute-bound floor)
        return raw.astype(dt)
    # fp8 e4m3 -> f32: v5e has no native fp8, so mosaic's direct cast is a
    # slow emulation. Rebuild the f32 bit pattern with native int ops:
    # placing (exp:4, man:3) at f32 bit 20 yields exactly value * 2^-120
    # for every NORMAL e4m3 (e4m3fn has no inf, and NaN never reaches a KV
    # pool; sub-normal codes are flushed at write time,
    # xla_backend._quantize_rows).
    xb = jax.lax.bitcast_convert_type(raw, jnp.int8).astype(jnp.int32)
    bits = ((xb & 0x80) << 24) | ((xb & 0x7F) << 20)
    return (
        jax.lax.bitcast_convert_type(bits, jnp.float32)
        * jnp.float32(2.0**120)
    ).astype(dt)


def _inline_scales(raw_all, lanes, sdt):
    """Decode inline-scale byte planes (rows [..., lanes + 256]) to
    [..., 128] scales: hi/lo s8 lanes -> bf16 bit pattern placed in the
    f32 exponent+mantissa top (same trick as the fp8 dequant above;
    Mosaic's native s8->bf16 bitcast merges sublanes, so byte planes are
    the lane-exact encoding — see memory/kv_cache.py inline_scale)."""
    planes = raw_all[:, lanes:]
    if planes.dtype != jnp.int8:  # fp8 pools: reinterpret, don't convert
        planes = jax.lax.bitcast_convert_type(planes, jnp.int8)
    hi = planes[:, :128].astype(jnp.int32) & 0xFF
    lo = planes[:, 128:].astype(jnp.int32) & 0xFF
    return jax.lax.bitcast_convert_type(
        (hi << 24) | (lo << 16), jnp.float32
    ).astype(sdt)


def _gqa_decode_kernel(
    # scalar prefetch
    pt_ref,  # i32[B, P] global page ids (layer folded in, padded with 0)
    len_ref,  # i32[B] kv lens (0 = padding row)
    *refs,
    page_size: int,
    chunk_pages: int,
    logit_cap: Optional[float],
    sliding_window: Optional[int],
    quantized: bool,
    dynamic_window: bool,
    chunk_size: Optional[int],
    with_sinks: bool,
    packed: bool = False,
    page_base: int = 0,
    head_slots: Optional[int] = None,
    n_slots: int = 2,
    clamp_dead: bool = False,
    inline: bool = False,
):
    if dynamic_window:
        # i32[1] per-CALL window (a per-layer value traced through the
        # model's layer scan — Gemma/GPT-OSS alternate local/global layers;
        # global layers pass a >= 2^30 sentinel)
        win_ref, *refs = refs
    else:
        win_ref = None
    q_ref, kv_hbm, *refs = refs
    if quantized and not inline:
        # sc_hbm [Pg, ps, SL] bf16: the scale pool lane-padded to SL >= 128
        # (16-lane pages are not DMA-sliceable in mosaic); scale pages
        # stream alongside the kv pages. Inline-scale pools carry the
        # scales INSIDE the kv pages (no second stream).
        sc_hbm, *refs = refs
    else:
        sc_hbm = None
    if with_sinks:
        # f32[Hq, 128] lane-tiled learned sink logits (GPT-OSS): the sink
        # joins the softmax denominator but contributes no value
        sinks_ref, *refs = refs
    else:
        sinks_ref = None
    o_ref, kv_buf, *refs = refs
    if quantized and not inline:
        sc_buf, *refs = refs
    else:
        sc_buf = None
    if quantized:
        const_sk, const_sv, *refs = refs
    else:
        const_sk = const_sv = None
    const_q, sems, cursor = refs
    b = pl.program_id(0)
    B = pl.num_programs(0)
    CP = chunk_pages
    CHUNK = CP * page_size
    Hq, Dp = q_ref.shape[1], q_ref.shape[2]
    # combined (K,V) head slots (= Hkv when packed). Lane-folded pools
    # ([Pg, ps, H2*Dp] — see memory/kv_cache.py lane_heads) carry a 3-D
    # VMEM block, so the slot count comes in statically; the flattened
    # [CHUNK, LANES] form below is IDENTICAL either way. Inline-scale rows
    # carry 256 extra byte-plane lanes past the kv lanes.
    H2 = head_slots if head_slots is not None else kv_buf.shape[3]
    LANES = H2 * Dp
    LT = LANES + 256 if inline else LANES
    G = Hq // H2 if packed else Hq // (H2 // 2)

    def nchunks(seq):
        # every row owns >= 1 chunk so the prefetch chain stays uniform;
        # padding rows stream the dump page and mask everything out
        return jnp.maximum(pl.cdiv(len_ref[seq], CHUNK), 1)

    def mask_start(seq_len):
        """First kv position the query may attend to (0 = unmasked)."""
        if chunk_size is not None:
            # Llama-4 chunked attention: only the chunk holding the query
            return jnp.maximum(seq_len - 1, 0) // chunk_size * chunk_size
        if dynamic_window:
            return jnp.maximum(seq_len - win_ref[0], 0)
        if sliding_window is not None:
            return jnp.maximum(seq_len - sliding_window, 0)
        return jnp.int32(0)

    def first_chunk(seq):
        # windowed/chunked layers skip whole masked-out chunks: the loop
        # (and the DMA stream) starts at the first live chunk, so a 128-wide
        # GPT-OSS sliding layer reads ~CHUNK tokens instead of the full
        # context
        c = mask_start(len_ref[seq]) // CHUNK
        return jnp.minimum(c, nchunks(seq) - 1)

    def chunk_dmas(seq, c, slot):
        """(live, dma) pairs for chunk c of seq. With clamping (opt-in,
        see CLAMP below) pages past the sequence's LIVE page count are
        never copied: the last chunk of every sequence (and every padding
        row) otherwise DMAs page-table padding — at ctx 192 / ps 16 /
        CP 16 that is 4 dump-page reads per 12 live pages, 33% wasted HBM
        traffic. start/wait compute the same predicates, so semaphore
        counts balance. OPT-IN because the first on-chip reading with the
        per-page predicates came in ~9% BELOW the unclamped sessions
        (within the cross-session variance band — needs a same-session
        A/B; dump-page reads may also be effectively free if the repeated
        page 0 stays resident)."""
        if clamp_dead:
            live_p = pl.cdiv(len_ref[seq], page_size)
        out = []
        for j in range(CP):
            # page_base: static per-layer page offset (unrolled layer
            # loops) — keeps the prefetched page table LAYER-INVARIANT so
            # one SMEM upload serves every layer's call (the per-call
            # [B, P] copy-start was ~56 us x layers x steps)
            page = pt_ref[seq, c * CP + j] + page_base
            live = (c * CP + j < live_p) if clamp_dead else None
            out.append(
                (
                    live,
                    pltpu.make_async_copy(
                        kv_hbm.at[page], kv_buf.at[slot, j], sems.at[slot]
                    ),
                )
            )
            if sc_hbm is not None:
                out.append(
                    (
                        live,
                        pltpu.make_async_copy(
                            sc_hbm.at[page], sc_buf.at[slot, j], sems.at[slot]
                        ),
                    )
                )
        return out

    def start_chunk(seq, c, slot):
        for live, dma in chunk_dmas(seq, c, slot):
            if live is None:
                dma.start()
            else:
                @pl.when(live)
                def _(dma=dma):
                    dma.start()

    def wait_chunk(seq, c, slot):
        for live, dma in chunk_dmas(seq, c, slot):
            if live is None:
                dma.wait()
            else:
                @pl.when(live)
                def _(dma=dma):
                    dma.wait()

    def adv(seq, c):
        """One step along the global chunk order (next chunk of seq, else
        the next sequence's first live chunk). Reads clamp at B-1 so
        walking past the batch end stays in bounds; callers guard on
        seq < B before starting DMAs."""
        sc_ = jnp.minimum(seq, B - 1)
        last = c + 1 >= nchunks(sc_)
        nseq = jnp.where(last, seq + 1, seq)
        nc = jnp.where(last, first_chunk(jnp.minimum(nseq, B - 1)), c + 1)
        return nseq, nc

    Hq_, LANES_ = const_q.shape

    @pl.when(b == 0)
    def _():
        cursor[0] = 0
        # fill the pipeline n_slots-1 deep before the first wait
        seq, c = jnp.int32(0), first_chunk(0)
        for k in range(n_slots - 1):
            if k > 0:
                seq, c = adv(seq, c)

            @pl.when(seq < B)
            def _(seq=seq, c=c, k=k):
                start_chunk(seq, c, k)

        # run-once constants (reused by every grid step; the builds overlap
        # the first chunks' DMA flight time). Block-diagonal lane mask: row
        # r keeps head slot kslot(r)'s lanes — see the layout comment below.
        # masks are built through an f32 select (the i1 compare carries a
        # 32-bit (8,128) layout; selecting 16-bit values directly forces an
        # unsupported i1 relayout to (16,128)) and then packed to the
        # compute dtype
        lane_i = jax.lax.broadcasted_iota(jnp.int32, (Hq_, LANES_), 1)
        row_i = jax.lax.broadcasted_iota(jnp.int32, (Hq_, LANES_), 0)
        kslot_i = (row_i // G) if packed else 2 * (row_i // G)
        const_q[...] = jnp.where(
            lane_i // Dp == kslot_i, 1.0, 0.0
        ).astype(q_ref.dtype)
        if quantized:
            SL_ = const_sk.shape[-1]
            jj = jax.lax.broadcasted_iota(jnp.int32, (Hq_, SL_), 1)
            rr = jax.lax.broadcasted_iota(jnp.int32, (Hq_, SL_), 0)
            const_sk[...] = jnp.where(
                jj == 2 * (rr // G), 1.0, 0.0
            ).astype(const_sk.dtype)
            const_sv[...] = jnp.where(
                jj == 2 * (rr // G) + 1, 1.0, 0.0
            ).astype(const_sv.dtype)

    slot0 = cursor[0]
    seq_len = len_ref[b]
    live = nchunks(b)
    c0 = first_chunk(b)

    # block-diagonal Q: row r = h*G+g carries q_{h,g} in combined slot 2h
    # (head h's K lanes), zeros elsewhere — lane l of the tiled copy holds
    # q[r, l % Dp], which is exactly q[r, l - 2h*Dp] inside the kept block.
    # Dots run in the NATIVE dtype (bf16 on TPU): the MXU computes bf16
    # products exactly and accumulates in f32, so the QK dot (and the
    # unquantized PV dot) is bit-identical to upcasting both operands to
    # f32 first — which would run the matmul at the ~8x slower f32 MXU
    # rate and spend a 2 MiB VMEM upcast per chunk. The QUANTIZED PV path
    # is not: `pq = (p * scale_v).astype(dt)` deliberately rounds the
    # scaled probabilities to bf16 before the matmul (~2^-9 relative
    # error on the attention output) to stay on the fast MXU path; see
    # tests/test_pallas_kernels.py bf16-tolerance coverage.
    # PACKED pools ([Pg, ps, Hkv, 128], K in lanes [0,64) and V in [64,128)
    # of one row per kv head) use the same construction: q arrives padded
    # to 128 lanes with zeros above D<=64, so placing it on combined slot
    # row//G puts q against the K half and ZEROS against the V half — the
    # QK dot ignores V for free. The PV dot then leaves row r's V output
    # in the HIGH half of its 128-lane block; the caller slices it out.
    dt = q_ref.dtype
    q = q_ref[0]  # [Hq, Dp]
    qt = jnp.concatenate([q] * H2, axis=1)  # [Hq, LANES]
    # block-diagonal Q via the hoisted 0/1 lane mask (built once at b == 0;
    # the per-step iota/compare chain was a measurable slice of the
    # per-sequence fixed cost, r4 microbench)
    q_bd = qt * const_q[...]

    if quantized:
        # head-slot selectors over the PADDED scale lanes (hoisted to
        # b == 0): row r reads combined slot 2*(r//G) for K and +1 for V;
        # one tiny dot turns the chunk's per-(token, slot) scales into
        # score-shaped factors. Selectors match the pool's scale dtype
        # (bf16 since r4); the 0/1 x bf16 dot accumulates in f32 exactly.
        SL = const_sk.shape[-1]
        sel_k = const_sk[...]  # [Hq, SL]
        sel_v = const_sv[...]

    def body(c, carry):
        m, l, acc = carry
        slot = jax.lax.rem(slot0 + c - c0, n_slots)

        # prefetch the chunk n_slots-1 ahead in the GLOBAL order (walking
        # across sequence boundaries) into the slot that frees this
        # iteration — the pipeline never drains mid-batch and deeper
        # buffering covers bursts of DMA-issue latency
        nseq, nc = b, c
        for _ in range(n_slots - 1):
            nseq, nc = adv(nseq, nc)

        @pl.when(nseq < B)
        def _():
            start_chunk(
                nseq, nc, jax.lax.rem(slot + n_slots - 1, n_slots)
            )

        wait_chunk(b, c, slot)

        if clamp_dead:
            # dead pages (past the sequence's live count) were never
            # DMA'd: zero their VMEM so stale bits can't poison the
            # masked math (0 x NaN = NaN through the PV dot / scale
            # selectors). Full chunks take no stores at all.
            live_p2 = pl.cdiv(len_ref[b], page_size)
            for j in range(CP):
                @pl.when(c * CP + j >= live_p2)
                def _(j=j):
                    kv_buf[slot, j] = jnp.zeros_like(kv_buf[slot, j])
                    if sc_buf is not None:
                        sc_buf[slot, j] = jnp.zeros_like(sc_buf[slot, j])

        # [CP, ps, H2, Dp] -> [CHUNK, LANES]: cheap in-VMEM relayout of ~1 MiB
        # (merging the last two dims of the HBM array instead would relayout
        # the ENTIRE pool per call — measured 26x slower end-to-end)
        raw_all = kv_buf[slot].reshape(CHUNK, LT)
        raw = raw_all[:, :LANES] if inline else raw_all
        if quantized:
            buf = _dequant_chunk(raw, dt)
            if inline:
                sc = _inline_scales(raw_all, LANES, sel_k.dtype)
            else:
                sc = sc_buf[slot].reshape(CHUNK, SL)  # [CHUNK, SL]
            scale_k = jax.lax.dot_general(
                sel_k, sc, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [Hq, CHUNK]
            scale_v = jax.lax.dot_general(
                sel_v, sc, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            buf = raw
        s = jax.lax.dot_general(
            q_bd,
            buf,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [Hq, CHUNK]
        if quantized:
            s = s * scale_k
        if logit_cap is not None:
            s = logit_cap * jnp.tanh(s / logit_cap)
        col = c * CHUNK + jax.lax.broadcasted_iota(jnp.int32, (Hq, CHUNK), 1)
        valid = (col < seq_len) & (col >= mask_start(seq_len))
        s = jnp.where(valid, s, _NEG)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        pq = (p * scale_v).astype(dt) if quantized else p.astype(buf.dtype)
        pv = jax.lax.dot_general(
            pq,
            buf,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [Hq, LANES]
        acc_new = acc * alpha + pv
        return m_new, l_new, acc_new

    m0 = jnp.full((Hq, 1), _NEG, jnp.float32)
    l0 = jnp.zeros((Hq, 1), jnp.float32)
    acc0 = jnp.zeros((Hq, LANES), jnp.float32)
    m, l, acc = jax.lax.fori_loop(c0, live, body, (m0, l0, acc0))
    cursor[0] = jax.lax.rem(slot0 + live - c0, n_slots)

    if with_sinks:
        # the sink competes in the softmax denominator only; padding rows
        # (m = -1e30) give exp(sink - m) = inf -> acc/inf = 0, masked below
        sink = sinks_ref[:, :1].astype(jnp.float32)  # [Hq, 1]
        l = l + jnp.exp(sink - m)
    l_safe = jnp.where(l > 0, l, 1.0)
    acc = acc / l_safe
    # pick each row's own V block: rows h*G..h*G+G-1 read combined slot
    # 2h+1 (padded) or slot h (packed, where lanes [0,64) of the block are
    # p@K garbage and the caller keeps only the high half); slices are
    # Dp(>=128)-aligned so this is relayout-free
    rows = jax.lax.broadcasted_iota(jnp.int32, (Hq, Dp), 0)
    out = jnp.zeros((Hq, Dp), jnp.float32)
    if packed:
        for j in range(H2):
            blk = acc[:, j * Dp : (j + 1) * Dp]
            out += jnp.where(rows // G == j, blk, 0.0)
    else:
        for j in range(1, H2, 2):
            blk = acc[:, j * Dp : (j + 1) * Dp]
            out += jnp.where(rows // G == j // 2, blk, 0.0)
    out = jnp.where(seq_len > 0, out, 0.0)
    o_ref[0] = out.astype(o_ref.dtype)


def _gqa_decode_grouped_kernel(
    # scalar prefetch
    pt_ref,  # i32[B, P] global page ids (layer folded in, padded with 0)
    len_ref,  # i32[B] kv lens (0 = padding row)
    *refs,
    page_size: int,
    sb: int,
    logit_cap: Optional[float],
    quantized: bool,
    with_sinks: bool,
    packed: bool,
    page_base: int,
    head_slots: Optional[int],
    n_slots: int,
    inline: bool = False,
):
    """Grouped single-chunk decode (v3): SB sequences per grid step.

    At serving-typical short contexts each sequence owns ~one chunk, so the
    per-sequence fixed costs of the v2 kernel — grid step, block-diagonal Q
    build, mask iotas, softmax epilogue, output write — dominate over the
    DMA time of its ~12 live pages (r4 microbench: 0.56 of SOL at ctx 192).
    This variant amortises ALL of them by SB: one grid step streams the
    WHOLE page table of SB sequences (one chunk each, no online softmax),
    builds one [SB*Hq, LANES] block-diagonal Q, runs one QK / one PV dot
    whose off-diagonal (cross-sequence) blocks are masked to -inf, and
    batches the softmax + V-block selection across the group. The extra
    MXU columns (each row dots against all SB chunks) trade against full
    M-dimension utilisation (SB*Hq rows vs Hq) — measured, not assumed:
    see tools/gqa_kernel_bench.py variants and PERF_r05.md.

    Constant tensors (block-diagonal lane mask, scale selectors, column
    position map) are built ONCE at grid step 0 into VMEM scratch and
    reused — the per-step iota/compare chains were a measurable slice of
    the v2 per-sequence cost.

    Reference analogue: the 2-stage split-KV flash-decode
    (scratchpad/nn/attention/triton_attn/decode_attention.py:547-608)
    attacks the same fixed-cost problem with cross-block grid parallelism;
    on a single-core TPU the equivalent is batching sequences into the
    grid step.
    """
    q_ref, kv_hbm, *refs = refs
    if quantized and not inline:
        sc_hbm, *refs = refs
    else:
        sc_hbm = None
    if with_sinks:
        sinks_ref, *refs = refs
    else:
        sinks_ref = None
    o_ref, kv_buf, *refs = refs
    if quantized and not inline:
        sc_buf, *refs = refs
    else:
        sc_buf = None
    if quantized:
        const_sk, const_sv, *refs = refs
    else:
        const_sk = const_sv = None
    const_q, const_pos, sems = refs

    g = pl.program_id(0)
    NG = pl.num_programs(0)
    SB = sb
    CP = pt_ref.shape[1]  # whole table = one chunk per sequence
    CHUNK = CP * page_size
    Hq, Dp = q_ref.shape[1], q_ref.shape[2]
    H2 = head_slots if head_slots is not None else kv_buf.shape[3]
    LANES = H2 * Dp
    LT = LANES + 256 if inline else LANES
    G = Hq // H2 if packed else Hq // (H2 // 2)
    SH = SB * Hq
    SC = SB * CHUNK
    dt = q_ref.dtype

    def start_group(gg, slot):
        for i in range(SB):
            for j in range(CP):
                page = pt_ref[gg * SB + i, j] + page_base
                pltpu.make_async_copy(
                    kv_hbm.at[page], kv_buf.at[slot, i * CP + j], sems.at[slot]
                ).start()
                if sc_hbm is not None:
                    pltpu.make_async_copy(
                        sc_hbm.at[page], sc_buf.at[slot, i * CP + j],
                        sems.at[slot],
                    ).start()

    def wait_group(gg, slot):
        for i in range(SB):
            for j in range(CP):
                page = pt_ref[gg * SB + i, j] + page_base
                pltpu.make_async_copy(
                    kv_hbm.at[page], kv_buf.at[slot, i * CP + j], sems.at[slot]
                ).wait()
                if sc_hbm is not None:
                    pltpu.make_async_copy(
                        sc_hbm.at[page], sc_buf.at[slot, i * CP + j],
                        sems.at[slot],
                    ).wait()

    @pl.when(g == 0)
    def _():
        # fill the DMA pipeline first — the constant builds below overlap
        # the flight time of the first groups' pages
        for k in range(n_slots - 1):
            if k < NG:
                start_group(k, k)
        # run-once constants (reused by every grid step). Masks go through
        # an f32 select (the i1 compare carries a 32-bit (8,128) layout;
        # selecting 16-bit values directly forces an unsupported i1
        # relayout) and then pack to the compute dtype.
        # Block-diagonal lane mask — row r keeps head slot kslot(r)'s lanes
        lane = jax.lax.broadcasted_iota(jnp.int32, (SH, LANES), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (SH, LANES), 0)
        hq = row % Hq
        kslot = (hq // G) if packed else 2 * (hq // G)
        const_q[...] = jnp.where(lane // Dp == kslot, 1.0, 0.0).astype(dt)
        # column position map: token position within the column's sequence
        # on the diagonal (row member == column member), else a sentinel
        # that always fails the `pos < len` test — one compare per step
        # replaces the member/positions iota chain
        cm = jax.lax.broadcasted_iota(jnp.int32, (SH, SC), 1)
        rm = jax.lax.broadcasted_iota(jnp.int32, (SH, SC), 0) // Hq
        const_pos[...] = jnp.where(
            cm // CHUNK == rm, cm % CHUNK, jnp.int32(2**30)
        )
        if quantized:
            SL = const_sk.shape[-1]
            jj = jax.lax.broadcasted_iota(jnp.int32, (SH, SL), 1)
            rr = jax.lax.broadcasted_iota(jnp.int32, (SH, SL), 0) % Hq
            const_sk[...] = jnp.where(
                jj == 2 * (rr // G), 1.0, 0.0
            ).astype(const_sk.dtype)
            const_sv[...] = jnp.where(
                jj == 2 * (rr // G) + 1, 1.0, 0.0
            ).astype(const_sv.dtype)

    slot = jax.lax.rem(g, n_slots)
    nxt = g + n_slots - 1

    @pl.when(nxt < NG)
    def _():
        start_group(nxt, jax.lax.rem(nxt, n_slots))

    wait_group(g, slot)

    # per-row (query) sequence lengths — also the final padding-row mask
    rowm = jax.lax.broadcasted_iota(jnp.int32, (SH, 1), 0) // Hq
    lrow = jnp.zeros((SH, 1), jnp.int32)
    for i in range(SB):
        lrow = jnp.where(rowm == i, len_ref[g * SB + i], lrow)

    q = q_ref[...].reshape(SH, Dp)
    qt = jnp.concatenate([q] * H2, axis=1)  # [SH, LANES]
    q_bd = qt * const_q[...]

    raw_all = kv_buf[slot].reshape(SC, LT)
    raw = raw_all[:, :LANES] if inline else raw_all
    if quantized:
        buf = _dequant_chunk(raw, dt)
        if inline:
            sc = _inline_scales(raw_all, LANES, const_sk.dtype)
        else:
            sc = sc_buf[slot].reshape(SC, sc_buf.shape[-1])
        scale_k = jax.lax.dot_general(
            const_sk[...], sc, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [SH, SC]
        scale_v = jax.lax.dot_general(
            const_sv[...], sc, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    else:
        buf = raw
    s = jax.lax.dot_general(
        q_bd, buf, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [SH, SC]
    if quantized:
        s = s * scale_k
    if logit_cap is not None:
        s = logit_cap * jnp.tanh(s / logit_cap)
    s = jnp.where(const_pos[...] < lrow, s, _NEG)

    # single chunk covers the whole sequence: plain softmax, no online
    # rescale chain
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    if with_sinks:
        sink = jnp.concatenate(
            [sinks_ref[:, :1].astype(jnp.float32)] * SB, axis=0
        )  # [SH, 1]
        l = l + jnp.exp(sink - m)
    pq = (p * scale_v).astype(dt) if quantized else p.astype(buf.dtype)
    acc = jax.lax.dot_general(
        pq, buf, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [SH, LANES]
    l_safe = jnp.where(l > 0, l, 1.0)
    acc = acc / l_safe

    rows = jax.lax.broadcasted_iota(jnp.int32, (SH, Dp), 0) % Hq
    out = jnp.zeros((SH, Dp), jnp.float32)
    if packed:
        for j in range(H2):
            blk = acc[:, j * Dp : (j + 1) * Dp]
            out += jnp.where(rows // G == j, blk, 0.0)
    else:
        for j in range(1, H2, 2):
            blk = acc[:, j * Dp : (j + 1) * Dp]
            out += jnp.where(rows // G == j // 2, blk, 0.0)
    out = jnp.where(lrow > 0, out, 0.0)
    o_ref[...] = out.reshape(SB, Hq, Dp).astype(o_ref.dtype)


def _grouped_sb(
    B: int, P: int, ps: int, lanes_bytes: int, want: int, Hq: int, lanes: int
) -> int:
    """Pick the per-grid-step sequence group size: the largest SB <= want
    dividing B whose double-buffered superchunk + score workspace stays
    within the VMEM budget (0/1 = use the per-sequence kernel). The
    estimate counts the kv scratch, ~8 score-shaped f32 temporaries and
    the accumulator/constant planes — sb=8 at the 1B geometry (24 MiB by
    this estimate) fails Mosaic VMEM allocation, sb=4 (10 MiB) compiles
    (AOT-probed, r5).

    SB=2 first on auto: the QK/PV dot cost grows with SB (each row dots
    against all SB members' columns) while the per-sequence fixed costs
    shrink as 1/SB — the r5 two-point microbench at the 1B ctx-192
    geometry put SB=2 at 0.865 of SOL vs 0.654 for SB=4 and 0.584 for the
    per-sequence kernel (KBENCH_r5.jsonl). A numeric want (forced via
    SPTPU_GQA_GROUP=N) is tried exactly first, then the auto order."""
    order = (want, 2, 4, 8) if want in (2, 4, 8) else (2, 4, 8)
    seen = set()
    for sb in order:
        if sb in seen or sb < 2 or B % sb:
            continue
        seen.add(sb)
        if sb * P > 128:  # DMA burst / dot column budget
            continue
        kv_bytes = 2 * sb * P * ps * lanes_bytes
        sh, sc = sb * Hq, sb * P * ps
        work = 8 * sh * sc * 4 + 3 * sh * lanes * 4
        if kv_bytes + work > 16 * 1024 * 1024:
            continue
        return sb
    return 1


def _gqa_decode_grouped(
    q,
    kv_pages,
    kv_scale,
    layer_idx,
    page_table,
    seq_lens,
    sinks,
    *,
    page_size,
    sm_scale,
    logit_cap,
    num_layers,
    packed,
    static_layer,
    lane_head_slots,
    sb,
    inline=False,
):
    """Setup + pallas_call for the grouped single-chunk kernel (traced from
    inside _gqa_decode_call, which owns the jit boundary and routing)."""
    import os

    B, Hq, D = q.shape
    if lane_head_slots is not None:
        Pg, ps, LT = kv_pages.shape
        H2 = lane_head_slots
        LANES = LT - 256 if inline else LT
        Dp = LANES // H2
    else:
        Pg, ps, H2, Dp = kv_pages.shape
        LANES = H2 * Dp
        LT = LANES
    Ptot = Pg // num_layers
    quantized = kv_scale is not None or inline
    with_sinks = sinks is not None
    P = page_table.shape[1]
    NSLOTS = max(2, int(os.environ.get("SPTPU_GQA_SLOTS", "2")))
    NG = B // sb
    NSLOTS = min(NSLOTS, max(NG, 1))

    if static_layer is not None:
        pt_global = page_table.astype(jnp.int32)
        page_base = int(static_layer) * Ptot
    else:
        pt_global = (page_table + layer_idx.astype(jnp.int32) * Ptot).astype(
            jnp.int32
        )
        page_base = 0

    qs = q * jnp.asarray(sm_scale, q.dtype)
    if Dp != D:
        qs = jnp.pad(qs, [(0, 0), (0, 0), (0, Dp - D)])

    kernel = functools.partial(
        _gqa_decode_grouped_kernel,
        page_size=page_size,
        sb=sb,
        logit_cap=logit_cap,
        quantized=quantized,
        with_sinks=with_sinks,
        packed=packed,
        page_base=page_base,
        head_slots=H2 if lane_head_slots is not None else None,
        n_slots=NSLOTS,
        inline=inline,
    )
    SH, SC = sb * Hq, sb * P * page_size
    in_specs = [
        pl.BlockSpec((sb, Hq, Dp), lambda g, *_: (g, 0, 0)),
        pl.BlockSpec(memory_space=pl.ANY),  # kv pages stay in HBM
    ]
    operands = [pt_global, seq_lens.astype(jnp.int32), qs, kv_pages]
    scratch = [
        pltpu.VMEM(
            (NSLOTS, sb * P, ps, LT)
            if lane_head_slots is not None
            else (NSLOTS, sb * P, ps, H2, Dp),
            kv_pages.dtype,
        ),
    ]
    if quantized and not inline:
        SL = kv_scale.shape[-1]
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        operands.append(kv_scale)
        scratch.append(pltpu.VMEM((NSLOTS, sb * P, ps, SL), kv_scale.dtype))
    if quantized:
        SL = 128 if inline else kv_scale.shape[-1]
        sdt = q.dtype if inline else kv_scale.dtype
        scratch += [
            pltpu.VMEM((SH, SL), sdt),  # const_sk
            pltpu.VMEM((SH, SL), sdt),  # const_sv
        ]
    if with_sinks:
        in_specs.append(pl.BlockSpec((Hq, 128), lambda g, *_: (0, 0)))
        operands.append(
            jnp.broadcast_to(sinks.astype(jnp.float32)[:, None], (Hq, 128))
        )
    scratch += [
        pltpu.VMEM((SH, LANES), q.dtype),  # const_q (block-diag lane mask)
        pltpu.VMEM((SH, SC), jnp.int32),  # const_pos (column position map)
        pltpu.SemaphoreType.DMA((NSLOTS,)),
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(NG,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((sb, Hq, Dp), lambda g, *_: (g, 0, 0)),
        scratch_shapes=scratch,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hq, Dp), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=jax.default_backend() == "cpu",
    )(*operands)
    if packed:
        half = Dp // 2
        return out[..., half : half + D]
    return out[..., :D]


@functools.partial(
    jax.jit,
    static_argnames=(
        "page_size",
        "sm_scale",
        "logit_cap",
        "sliding_window",
        "chunk_size",
        "num_layers",
        "packed",
        "static_layer",
        "lane_head_slots",
        "inline",
    ),
)
def _gqa_decode_call(
    q,  # [B, Hq, D]
    kv_pages,  # [Pg, ps, 2Hkv, Dp] (or [Pg, ps, 2Hkv*Dp] lane-folded)
    kv_scale,  # bf16[Pg, ps, SL>=128] for int8/fp8 pages, else None
    layer_idx,
    page_table,  # [B, P] per-layer page ids
    seq_lens,  # [B]
    window_dyn=None,  # i32[1] per-call window (traced per-layer), else None
    sinks=None,  # f32[Hq] learned sink logits (GPT-OSS), else None
    *,
    page_size,
    sm_scale,
    logit_cap,
    sliding_window,
    chunk_size=None,
    num_layers,
    packed=False,
    static_layer=None,
    lane_head_slots=None,
    inline=False,
):
    B, Hq, D = q.shape
    # SMEM budget guard: the scalar-prefetched [B, P] page table lives in
    # the 1 MiB SMEM — long-context serving shapes overflow it (measured:
    # bs64 x 4096 pages = exactly 1 MiB -> "Ran out of memory in memory
    # space smem", r5 serving capture). Split the batch and run halves;
    # recursion handles further splits. Env override for tests.
    import os as _os

    _smem_budget = int(
        _os.environ.get("SPTPU_GQA_SMEM_SPLIT", str(768 * 1024))
    )
    if B >= 2 and B * page_table.shape[1] * 4 > _smem_budget:
        h = B // 2
        kw = dict(
            page_size=page_size, sm_scale=sm_scale, logit_cap=logit_cap,
            sliding_window=sliding_window, chunk_size=chunk_size,
            num_layers=num_layers, packed=packed, static_layer=static_layer,
            lane_head_slots=lane_head_slots, inline=inline,
        )
        lo = _gqa_decode_call(
            q[:h], kv_pages, kv_scale, layer_idx, page_table[:h],
            seq_lens[:h], window_dyn, sinks, **kw,
        )
        hi_ = _gqa_decode_call(
            q[h:], kv_pages, kv_scale, layer_idx, page_table[h:],
            seq_lens[h:], window_dyn, sinks, **kw,
        )
        return jnp.concatenate([lo, hi_], axis=0)
    if lane_head_slots is not None:
        # lane-folded pool [Pg, ps, H2*Dp]: same bytes per row in the same
        # order as the flattened VMEM block the kernel computes on, but
        # sliceable on the lane axis at any tp (memory/kv_cache.py).
        # Inline-scale pools carry 256 extra byte-plane lanes.
        Pg, ps, LT_ = kv_pages.shape
        H2 = lane_head_slots
        Dp = (LT_ - 256 if inline else LT_) // H2
    else:
        Pg, ps, H2, Dp = kv_pages.shape
    Ptot = Pg // num_layers
    quantized = kv_scale is not None or inline
    # packed + quantized compose: scale lanes stay interleaved
    # [k0, v0, ...] so sel_k/sel_v hit head h's K/V scales while the
    # block-diagonal dots read the packed row's halves
    assert not packed or D <= Dp // 2, "packed rows hold two D<=64 vectors"
    dynamic_window = window_dyn is not None
    with_sinks = sinks is not None

    import os

    # grouped single-chunk kernel (v3): SB sequences per grid step when the
    # whole page table fits one chunk and the layer has no windowed/chunked
    # masking (sinks are fine — they only join the softmax denominator).
    # SPTPU_GQA_GROUP: "auto" (default) picks SB, "0" disables, N forces.
    group_env = os.environ.get("SPTPU_GQA_GROUP", "auto")
    P = page_table.shape[1]
    if (
        group_env != "0"
        and not dynamic_window
        and sliding_window is None
        and chunk_size is None
        and B >= 2
    ):
        want = 8 if group_env in ("auto", "") else int(group_env)
        lanes_bytes = H2 * Dp * jnp.dtype(kv_pages.dtype).itemsize
        sb = _grouped_sb(B, P, page_size, lanes_bytes, want, Hq, H2 * Dp)
        if sb >= 2:
            return _gqa_decode_grouped(
                q, kv_pages, kv_scale, layer_idx, page_table, seq_lens,
                sinks,
                page_size=page_size, sm_scale=sm_scale, logit_cap=logit_cap,
                num_layers=num_layers, packed=packed,
                static_layer=static_layer, lane_head_slots=lane_head_slots,
                sb=sb, inline=inline,
            )

    # chunk size: CP=16 default. The r4 two-point microbench put CP=32 at
    # +33% kernel-level on the packed 1B pool, but E2E the flip COST ~13%
    # on 3B W4A8 bs32 (6,086 -> 5,288 same-session A/B, AB_cpab_r4.jsonl):
    # at short contexts a CP-page chunk reads the page-table PADDING
    # (dump-page DMAs) past each sequence's live pages, and the overread
    # grows with CP. Keep CP=16; revisit with a live-page-clamped chunk
    # loop (nchunks already uses cdiv(len, CHUNK) but the last chunk still
    # DMAs all CP pages) for long-context serving.
    cp_env = int(os.environ.get("SPTPU_GQA_CP", "16"))
    CP = max(1, min(cp_env, page_table.shape[1]))
    # DMA pipeline depth: N slots buffer N-1 chunks ahead (global order,
    # across sequence boundaries) — deeper buffering rides out DMA-issue
    # bursts at short contexts where each sequence is ~one chunk
    NSLOTS = max(2, int(os.environ.get("SPTPU_GQA_SLOTS", "2")))
    P = page_table.shape[1]
    P_pad = -(-P // CP) * CP
    if P_pad != P:
        page_table = jnp.pad(page_table, ((0, 0), (0, P_pad - P)))
    if static_layer is not None:
        # unrolled layer loops pass a CONCRETE layer index: fold the layer
        # offset into the kernel as a static constant so the prefetched
        # page table stays identical across layers (and loop-invariant
        # across the fused decode window) — one SMEM upload instead of
        # layers x steps copy-starts
        pt_global = page_table.astype(jnp.int32)
        page_base = int(static_layer) * Ptot
    else:
        pt_global = (page_table + layer_idx.astype(jnp.int32) * Ptot).astype(
            jnp.int32
        )
        page_base = 0

    qs = q * jnp.asarray(sm_scale, q.dtype)
    if Dp != D:
        qs = jnp.pad(qs, [(0, 0), (0, 0), (0, Dp - D)])

    kernel = functools.partial(
        _gqa_decode_kernel,
        page_size=page_size,
        chunk_pages=CP,
        logit_cap=logit_cap,
        sliding_window=sliding_window,
        quantized=quantized,
        dynamic_window=dynamic_window,
        chunk_size=chunk_size,
        with_sinks=with_sinks,
        packed=packed,
        page_base=page_base,
        head_slots=H2 if lane_head_slots is not None else None,
        n_slots=NSLOTS,
        # live-page DMA clamping (skip + zero dead pages): opt-in pending
        # a same-session on-chip A/B (see chunk_dmas docstring)
        clamp_dead=os.environ.get("SPTPU_GQA_CLAMP", "0") == "1",
        inline=inline,
    )
    in_specs = [
        pl.BlockSpec((1, Hq, Dp), lambda b, *_: (b, 0, 0)),
        pl.BlockSpec(memory_space=pl.ANY),  # kv pages stay in HBM
    ]
    scratch = [
        pltpu.VMEM(
            (NSLOTS, CP, ps, H2 * Dp + (256 if inline else 0))
            if lane_head_slots is not None
            else (NSLOTS, CP, ps, H2, Dp),
            kv_pages.dtype,
        ),
    ]
    operands = [pt_global, seq_lens.astype(jnp.int32)]
    if dynamic_window:
        operands.append(window_dyn.astype(jnp.int32).reshape(1))
    operands += [qs, kv_pages]
    if quantized and not inline:
        SL = kv_scale.shape[-1]
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        scratch.append(pltpu.VMEM((NSLOTS, CP, ps, SL), kv_scale.dtype))
        operands.append(kv_scale)
    if quantized:
        SL = 128 if inline else kv_scale.shape[-1]
        sdt = q.dtype if inline else kv_scale.dtype
        scratch += [
            pltpu.VMEM((Hq, SL), sdt),  # const_sk
            pltpu.VMEM((Hq, SL), sdt),  # const_sv
        ]
    if with_sinks:
        # lane-tile the [Hq] sink vector so it lands in VMEM as a normal
        # (sublane, lane) block
        in_specs.append(pl.BlockSpec((Hq, 128), lambda b, *_: (0, 0)))
        operands.append(
            jnp.broadcast_to(
                sinks.astype(jnp.float32)[:, None], (Hq, 128)
            )
        )
    scratch += [
        pltpu.VMEM((Hq, H2 * Dp), q.dtype),  # const_q (block-diag mask)
        pltpu.SemaphoreType.DMA((NSLOTS,)),
        pltpu.SMEM((1,), jnp.int32),
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2 + int(dynamic_window),
        grid=(B,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, Hq, Dp), lambda b, *_: (b, 0, 0)),
        scratch_shapes=scratch,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hq, Dp), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=jax.default_backend() == "cpu",
    )(*operands)
    if packed:
        # packed blocks carry p@K garbage in the low half; the attention
        # output for row r lives in lanes [half, half + D)
        half = Dp // 2
        return out[..., half : half + D]
    return out[..., :D]


def decode_attention_gqa(
    q: jax.Array,  # [B, Hq, D]
    kv: KVCache,
    layer_idx: jax.Array,
    meta: ForwardMeta,
    *,
    page_size: int,
    sm_scale: float,
    logit_cap: Optional[float] = None,
    sliding_window=None,  # int (static), traced i32 scalar (per-layer), None
    sinks: Optional[jax.Array] = None,  # f32[Hq] learned sink logits
    chunk_size: Optional[int] = None,  # Llama-4 chunked attention
) -> jax.Array:
    """Drop-in replacement for decode_attention_xla (same signature).

    Per-layer dynamic windows (Gemma/GPT-OSS pass a traced scalar from the
    layer scan), attention sinks, and Llama-4 chunked masks all run
    in-kernel; windowed/chunked layers additionally skip whole masked-out
    KV chunks, so a 128-wide sliding layer streams ~one chunk instead of
    the full context."""
    scale = (
        kv.scale
        if kv.kv.dtype in (jnp.int8, jnp.float8_e4m3fn)
        and not kv.inline_scale
        else None
    )
    window_dyn = None
    if isinstance(sliding_window, jax.Array):
        window_dyn = sliding_window
        sliding_window = None
    # concrete layer index (unrolled layer loops): fold the page offset
    # into the kernel statically — see _gqa_decode_call
    static_layer = (
        int(layer_idx)
        if isinstance(layer_idx, (int, np.integer))
        else None
    )
    return _gqa_decode_call(
        q,
        kv.kv,
        scale,
        jnp.asarray(layer_idx),
        meta.page_table,
        meta.seq_lens,
        window_dyn,
        sinks,
        page_size=page_size,
        sm_scale=sm_scale,
        logit_cap=logit_cap,
        sliding_window=sliding_window,
        chunk_size=chunk_size,
        num_layers=kv.num_layers,
        packed=kv.packed,
        static_layer=static_layer,
        lane_head_slots=kv.lane_head_slots or None,
        inline=kv.inline_scale,
    )


def make_decode_attention_gqa_tp(mesh):
    """Decode v2 on a tensor-parallel mesh: heads are embarrassingly
    parallel, so each "tp" shard runs the unmodified kernel over its local
    Hq/tp query heads and Hkv/tp cached heads (same pattern as
    ragged_backend.make_attention_ragged_tp; requires tp | num_kv_heads).

    Quantized (int8/fp8) pools work too: the scale pool's lane axis is laid
    out as one 128-lane block per tp shard (memory/kv_cache.py
    KVCache.scale), so sharding it over "tp" hands each shard exactly the
    single-device scale layout for its local head slots — the kernel's
    in-VMEM scale folding runs unmodified per shard."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as PS

    def attend(
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
        quantized = kv.kv.dtype in (jnp.int8, jnp.float8_e4m3fn)
        if quantized:
            assert kv.scale_shards == mesh.shape["tp"], (
                "quantized TP decode needs the per-shard-block scale pool"
            )
        # lane-folded pools shard head slots on the LANE axis — each shard
        # sees [Pg, ps, (H2/tp)*Dp], tile-aligned for 8-bit dtypes at any
        # tp (memory/kv_cache.py lane_heads; the sublane-major layout
        # needs (2*Hkv)/tp % 4 == 0)
        local_slots = (
            kv.lane_head_slots // mesh.shape["tp"] if kv.lane_heads else None
        )

        def body(qq, kk, sc, li, pt, sl):
            return _gqa_decode_call(
                qq,
                kk,
                sc,
                li,
                pt,
                sl,
                page_size=page_size,
                sm_scale=sm_scale,
                logit_cap=logit_cap,
                sliding_window=sliding_window,
                num_layers=kv.num_layers,
                lane_head_slots=local_slots,
            )

        in_specs = [
            PS(None, "tp", None),        # q: heads sharded
            # kv pages: heads sharded (lane axis for lane-folded pools)
            PS(None, None, "tp") if kv.lane_heads else PS(None, None, "tp", None),
            # scale pool: one 128-lane block per shard, sharded with heads
            PS(None, None, "tp") if quantized else PS(),
            PS(), PS(), PS(),            # layer_idx, page_table, seq_lens
        ]
        operands = [
            q,
            kv.kv,
            kv.scale if quantized else jnp.zeros((), jnp.float32),
            jnp.asarray(layer_idx),
            meta.page_table,
            meta.seq_lens,
        ]
        if not quantized:
            body_fn = lambda qq, kk, _, li, pt, sl: body(
                qq, kk, None, li, pt, sl
            )
        else:
            body_fn = body
        return shard_map(
            body_fn,
            mesh=mesh,
            in_specs=tuple(in_specs),
            out_specs=PS(None, "tp", None),
            check_vma=False,
        )(*operands)

    return attend
