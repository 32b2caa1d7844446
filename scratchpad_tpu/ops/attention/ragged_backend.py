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
    if jax.default_backend() == "cpu":
        # tests: the jittable dense equivalent stands in for the Mosaic
        # kernel (same interface/masks — see _ragged_dense_ref)
        out = _ragged_dense_ref(
            q * jnp.asarray(sm_scale, q.dtype),
            kv_pages,
            kv_lens.astype(jnp.int32),
            pt_global.astype(jnp.int32),
            cu_q,
            num_seqs,
            sm_scale=1.0,
            logit_cap=logit_cap,
            sliding_window=sliding_window,
        )
    else:
        # raise the scoped-VMEM ceiling: the kernel's own block heuristic
        # overflows the 16 MiB default at long-context page tables
        # (P=8192: "scoped allocation 17.54M > 16M", r5 capture ladder);
        # v5e has 128 MiB VMEM — give the kernel half
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
            vmem_limit_bytes=64 * 1024 * 1024,
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


def make_window_cond_extend(static_window: int):
    """Extend attention for models that alternate a FIXED sliding window
    with full attention per layer (Gemma 2/3).

    The bundled ragged kernel takes the window statically, but the layer
    scan passes it as a traced scalar (>= 2^30 sentinel = global). Compile
    both variants and pick per layer with lax.cond — one branch executes
    at runtime, so windowed prefill rides the Pallas kernel instead of the
    XLA gather path."""

    def attend(
        q, kv, layer_idx, meta, *,
        page_size, sm_scale, logit_cap=None, sliding_window=None, **_,
    ):
        def local_fn(q_):
            return attention_ragged(
                q_, kv, layer_idx, meta, page_size=page_size,
                sm_scale=sm_scale, logit_cap=logit_cap,
                sliding_window=static_window,
            )

        def global_fn(q_):
            return attention_ragged(
                q_, kv, layer_idx, meta, page_size=page_size,
                sm_scale=sm_scale, logit_cap=logit_cap,
                sliding_window=None,
            )

        if sliding_window is None:
            return global_fn(q)
        return jax.lax.cond(
            jnp.asarray(sliding_window) < (1 << 29), local_fn, global_fn, q
        )

    return attend


# ---------------------------------------------------------------------------
# quantized-KV extend: dequantize the batch's pages, then run the kernel
# ---------------------------------------------------------------------------


def dequant_pages(kv: KVCache, layer_idx, page_table, out_dtype=jnp.bfloat16):
    """Gather + dequantize ONE layer's batch pages into a compact scratch
    pool [B*P, ps, 2Hkv, Dp] with an identity page table.

    The int8/fp8 pool stores per-(row, head) scales (memory/kv_cache.py);
    extend attention needs full-precision K/V tiles, so rather than teaching
    the ragged kernel about scales we materialise just the pages this batch
    touches (B*P pages vs the whole pool) and reuse the unmodified kernel.
    Traffic per layer ~= read quant pages + write/read bf16 scratch — far
    below the XLA gather path, which materialises dense f32 [B, S, H, D]
    K/V plus a [B, Hkv, G, T, S] score tensor.

    The gather is a whole-page axis-0 take: 1-D indices over the flattened
    leading dim keep the s8 pool in its default layout (see the layout
    landmine notes in xla_backend._gather_kv).
    """
    if kv.inline_scale:
        return _dequant_pages_inline(kv, layer_idx, page_table, out_dtype)
    Pg, ps, H2, Dp = kv.kv.shape
    Ptot = kv.pages_per_layer
    B, P = page_table.shape
    rows = (
        page_table.astype(jnp.int32) + jnp.asarray(layer_idx, jnp.int32) * Ptot
    ).reshape(-1)
    pages = jnp.take(kv.kv, rows, axis=0)  # [B*P, ps, H2, Dp] quantized
    sc = jnp.take(kv.scale, rows, axis=0)  # [B*P, ps, SL] f32
    # undo the per-tp-shard 128-lane block layout (see KVCache.scale)
    ns, SL = kv.scale_shards, sc.shape[-1]
    sc = sc.reshape(sc.shape[:-1] + (ns, SL // ns))[..., : H2 // ns]
    sc = sc.reshape(sc.shape[:-2] + (H2,))
    if pages.dtype == jnp.int8:
        # no direct int8 -> float on TPU; go via int32
        deq = pages.astype(jnp.int32).astype(jnp.float32)
    else:  # fp8 e4m3: direct cast
        deq = pages.astype(jnp.float32)
    deq = (deq * sc[..., None]).astype(out_dtype)
    new_pt = jnp.arange(B * P, dtype=jnp.int32).reshape(B, P)
    return deq, new_pt


def _dequant_pages_inline(kv: KVCache, layer_idx, page_table, out_dtype):
    """dequant_pages for INLINE-SCALE pools (memory/kv_cache.py
    inline_scale): rows carry kv lanes + scale byte planes; decode the
    scales from the gathered rows themselves and expand into the
    interleaved lane-padded scratch the bundled ragged kernel consumes."""
    from scratchpad_tpu.ops.attention.xla_backend import inline_scales_of

    Pg, ps, Ltot = kv.kv.shape
    H2 = kv.lane_head_slots
    kvL = kv.kv_lanes
    Dp = kvL // H2
    Hkv = kv.num_kv_heads
    Ptot = kv.pages_per_layer
    B, P = page_table.shape
    rows = (
        page_table.astype(jnp.int32) + jnp.asarray(layer_idx, jnp.int32) * Ptot
    ).reshape(-1)
    g = jnp.take(kv.kv, rows, axis=0)  # [B*P, ps, kvL+256]
    sc = inline_scales_of(g, 2 * Hkv)  # [B*P, ps, 2Hkv] f32
    vals = g[..., :kvL].reshape(B * P, ps, H2, Dp)
    if vals.dtype == jnp.int8:
        deq = vals.astype(jnp.int32).astype(jnp.float32)
    else:
        deq = vals.astype(jnp.float32)
    if kv.packed:
        half = Dp // 2
        k = deq[..., :half] * sc[..., 0::2, None]
        v = deq[..., half:] * sc[..., 1::2, None]
        pad = [(0, 0), (0, 0), (0, 0), (0, Dp - half)]
        scratch = jnp.stack(
            [jnp.pad(k, pad), jnp.pad(v, pad)], axis=3
        ).reshape(B * P, ps, 2 * Hkv, Dp)
    else:
        scratch = deq * sc[..., None]
    scratch = scratch.astype(out_dtype)
    new_pt = jnp.arange(B * P, dtype=jnp.int32).reshape(B, P)
    return scratch, new_pt


def attention_ragged_quant(
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
    """Extend attention over an int8/fp8 cache via a dequantized scratch
    pool + the bundled ragged kernel (the decode side reads quantized pages
    directly in the gqa kernel; extend tiles want full-precision K/V)."""
    scratch, new_pt = dequant_pages(kv, layer_idx, meta.page_table, q.dtype)
    return _ragged_call(
        q,
        scratch,
        jnp.int32(0),
        new_pt,
        meta.seq_lens,
        meta.extend_lens,
        page_size=page_size,
        sm_scale=sm_scale,
        logit_cap=logit_cap,
        sliding_window=sliding_window,
        num_layers=1,
    )


def make_attention_ragged_quant_tp(mesh):
    """EXTEND attention over an int8/fp8 cache on a tensor-parallel mesh.

    Same dequant-scratch trade as attention_ragged_quant, executed
    per-shard under shard_map: each "tp" shard gathers ITS pages' local
    head slots plus its local 128-lane scale block (memory/kv_cache.py
    KVCache.scale), dequantizes just the batch's pages into a local bf16
    scratch pool, and runs the unmodified ragged kernel over its local
    heads — no collectives, no full-pool dequant."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as PS

    use_kernel = jax.default_backend() not in ("cpu",)

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
        del page_size
        T, Hq, D = q.shape
        Dp = kv.head_dim  # lane-folded pools fold slots into the last dim
        Ptot = kv.pages_per_layer
        B, P = meta.page_table.shape
        pt_global = (
            meta.page_table + jnp.asarray(layer_idx, jnp.int32) * Ptot
        ).astype(jnp.int32)
        kv_lens = jnp.maximum(meta.seq_lens, 1).astype(jnp.int32)
        cu_q = jnp.concatenate(
            [jnp.zeros(1, jnp.int32),
             jnp.cumsum(meta.extend_lens).astype(jnp.int32)]
        )
        num_seqs = jnp.sum(meta.extend_lens > 0).astype(jnp.int32).reshape(1)
        if Dp != D:
            q = jnp.pad(q, [(0, 0), (0, 0), (0, Dp - D)])
        q = q * jnp.asarray(sm_scale, q.dtype)
        scratch_pt = jnp.arange(B * P, dtype=jnp.int32).reshape(B, P)

        lane_local = (
            kv.lane_head_slots // mesh.shape["tp"] if kv.lane_heads else 0
        )

        def body(qq, kk, sc_pool, kl, pt, cq, ns):
            rows = pt.reshape(-1)
            pages = jnp.take(kk, rows, axis=0)
            if lane_local:
                # lane-folded shard [Pg, ps, H2l*Dp]: expand the per-slot
                # scales across each slot's Dp lanes, dequantize flat, and
                # reshape the batch-sized scratch (not the pool) to the 4-D
                # form the ragged kernel consumes
                H2l = lane_local
                sc = jnp.take(sc_pool, rows, axis=0)[..., :H2l]
                sc_lanes = jnp.repeat(sc, Dp, axis=-1)  # [B*P, ps, H2l*Dp]
                if pages.dtype == jnp.int8:
                    deq = pages.astype(jnp.int32).astype(jnp.float32)
                else:
                    deq = pages.astype(jnp.float32)
                deq = (deq * sc_lanes).astype(qq.dtype)
                deq = deq.reshape(deq.shape[0], deq.shape[1], H2l, Dp)
            else:
                H2l = kk.shape[2]
                sc = jnp.take(sc_pool, rows, axis=0)[..., :H2l]  # local block
                if pages.dtype == jnp.int8:
                    deq = pages.astype(jnp.int32).astype(jnp.float32)
                else:  # fp8 e4m3: direct cast
                    deq = pages.astype(jnp.float32)
                deq = (deq * sc[..., None]).astype(qq.dtype)
            if use_kernel:
                from jax.experimental.pallas.ops.tpu.ragged_paged_attention import (  # noqa: E501
                    ragged_paged_attention,
                )

                return ragged_paged_attention(
                    qq, deq, kl, scratch_pt, cq, ns,
                    sm_scale=1.0,
                    sliding_window=sliding_window,
                    soft_cap=logit_cap,
                )
            return _ragged_dense_ref(
                qq, deq, kl, scratch_pt, cq, ns,
                sm_scale=1.0, logit_cap=logit_cap,
                sliding_window=sliding_window,
            )

        out = shard_map(
            body,
            mesh=mesh,
            in_specs=(
                PS(None, "tp", None),        # q: heads sharded
                # kv pages: heads sharded (lane axis for lane-folded pools)
                PS(None, None, "tp")
                if kv.lane_heads
                else PS(None, None, "tp", None),
                PS(None, None, "tp"),        # scale: per-shard lane blocks
                PS(), PS(), PS(), PS(),      # metadata replicated
            ),
            out_specs=PS(None, "tp", None),
            check_vma=False,
        )(q, kv.kv, kv.scale, kv_lens, pt_global, cu_q, num_seqs)
        return out[..., :D]

    return attend


# ---------------------------------------------------------------------------
# packed-KV extend: expand the batch's packed pages, then run the kernel
# ---------------------------------------------------------------------------


def unpack_pages(kv: KVCache, layer_idx, page_table, out_dtype=jnp.bfloat16):
    """Gather ONE layer's batch pages from a PACKED pool ([Pg, ps, Hkv, 128]
    with K in lanes [0, 64) and V in [64, 128) per kv head — see
    memory/kv_cache.py) and expand them into the interleaved lane-padded
    scratch layout the bundled ragged kernel consumes. Quantized packed
    pools additionally dequantize with their per-(token, head, half)
    scales.

    Same shape of trade as dequant_pages above: the packed pool halves the
    DECODE read (the dominant traffic), while extend pays a small
    expand-to-scratch for just the B*P pages this batch touches."""
    if kv.inline_scale:
        return _dequant_pages_inline(kv, layer_idx, page_table, out_dtype)
    Pg, ps, Hkv, Dp = kv.kv.shape
    half = Dp // 2
    Ptot = kv.pages_per_layer
    B, P = page_table.shape
    rows = (
        page_table.astype(jnp.int32) + jnp.asarray(layer_idx, jnp.int32) * Ptot
    ).reshape(-1)
    pages = jnp.take(kv.kv, rows, axis=0)  # [B*P, ps, Hkv, 128]
    if pages.dtype in (jnp.int8, jnp.float8_e4m3fn):
        sc = jnp.take(kv.scale, rows, axis=0)  # [B*P, ps, SL]
        ns, SL = kv.scale_shards, sc.shape[-1]
        sc = sc.reshape(sc.shape[:-1] + (ns, SL // ns))[..., : 2 * Hkv // ns]
        sc = sc.reshape(sc.shape[:-2] + (2 * Hkv,))
        if pages.dtype == jnp.int8:
            deq = pages.astype(jnp.int32).astype(jnp.float32)
        else:
            deq = pages.astype(jnp.float32)
        k = deq[..., :half] * sc[..., 0::2, None]
        v = deq[..., half:] * sc[..., 1::2, None]
        pages = jnp.concatenate([k, v], axis=-1).astype(out_dtype)
    pad = [(0, 0), (0, 0), (0, 0), (0, Dp - half)]
    k = jnp.pad(pages[..., :half], pad)
    v = jnp.pad(pages[..., half:], pad)
    scratch = jnp.stack([k, v], axis=3).reshape(B * P, ps, 2 * Hkv, Dp)
    new_pt = jnp.arange(B * P, dtype=jnp.int32).reshape(B, P)
    return scratch, new_pt


def attention_ragged_packed(
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
    """Extend attention over a packed K|V pool via an expanded scratch pool
    + the bundled ragged kernel (decode reads packed pages directly in the
    gqa kernel, ops/attention/gqa_decode.py)."""
    scratch, new_pt = unpack_pages(kv, layer_idx, meta.page_table, q.dtype)
    return _ragged_call(
        q,
        scratch,
        jnp.int32(0),
        new_pt,
        meta.seq_lens,
        meta.extend_lens,
        page_size=page_size,
        sm_scale=sm_scale,
        logit_cap=logit_cap,
        sliding_window=sliding_window,
        num_layers=1,
    )


# ---------------------------------------------------------------------------
# tensor-parallel wrapper: shard_map over the head axis
# ---------------------------------------------------------------------------


def _ragged_dense_ref(
    q, kv_pages, kv_lens, pt_global, cu_q, num_seqs, *, sm_scale, logit_cap,
    sliding_window,
):
    """Jittable pure-XLA equivalent of the ragged kernel (same interface).

    Used inside the shard_map body on CPU meshes, where the Mosaic kernel
    can't run; tiny-shape tests validate the TP wiring against it.
    """
    del num_seqs  # padding rows produce garbage that is never gathered
    T, Hq, Dp = q.shape
    B, P = pt_global.shape
    ps, H2 = kv_pages.shape[1], kv_pages.shape[2]
    Hkv = H2 // 2
    Gq = Hq // Hkv
    g = kv_pages[pt_global].reshape(B, P * ps, H2, Dp)
    k, v = g[:, :, 0::2], g[:, :, 1::2]  # [B, S, Hkv, Dp]
    t = jnp.arange(T, dtype=jnp.int32)
    row = jnp.clip(jnp.searchsorted(cu_q, t, side="right") - 1, 0, B - 1)
    q_len = cu_q[row + 1] - cu_q[row]
    abs_pos = kv_lens[row] - q_len + (t - cu_q[row])  # kv index of token t
    qh = q.reshape(T, Hkv, Gq, Dp).astype(jnp.float32)
    scores = jnp.einsum(
        "thgd,tshd->thgs", qh, k[row].astype(jnp.float32)
    )  # [T, Hkv, Gq, S]
    if logit_cap:
        scores = logit_cap * jnp.tanh(scores / logit_cap)
    s_idx = jnp.arange(P * ps, dtype=jnp.int32)
    mask = s_idx[None, :] <= abs_pos[:, None]
    if sliding_window is not None:
        mask &= s_idx[None, :] > abs_pos[:, None] - sliding_window
    mask |= s_idx[None, :] == 0  # keep padding-row softmax finite
    scores = jnp.where(mask[:, None, None, :], scores, -1e30)
    w = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("thgs,tshd->thgd", w, v[row].astype(jnp.float32))
    return out.reshape(T, Hq, Dp).astype(q.dtype)


def make_attention_ragged_tp(mesh):
    """Ragged attention for a tensor-parallel mesh.

    Heads are embarrassingly parallel: each "tp" shard attends its local
    Hq/tp query heads against its local Hkv/tp cached KV heads — no
    collectives, so the kernel runs unmodified per-shard under shard_map
    (pallas_call does not auto-partition under pjit the way XLA ops do).
    Requires tp | Hkv; dp>1 meshes use the XLA backend (the flat ragged
    token axis can't split across dp).
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as PS

    use_kernel = jax.default_backend() not in ("cpu",)

    def body(q, kv_pages, kv_lens, pt_global, cu_q, num_seqs,
             logit_cap, sliding_window):
        # q arrives pre-scaled; both paths use sm_scale = 1
        if use_kernel:
            from jax.experimental.pallas.ops.tpu.ragged_paged_attention import (
                ragged_paged_attention,
            )

            return ragged_paged_attention(
                q, kv_pages, kv_lens, pt_global, cu_q, num_seqs,
                sm_scale=1.0,
                sliding_window=sliding_window,
                soft_cap=logit_cap,
            )
        return _ragged_dense_ref(
            q, kv_pages, kv_lens, pt_global, cu_q, num_seqs,
            sm_scale=1.0, logit_cap=logit_cap,
            sliding_window=sliding_window,
        )

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
        del page_size
        T, Hq, D = q.shape
        Dp = kv.kv.shape[-1]
        Ptot = kv.kv.shape[0] // kv.num_layers
        pt_global = (
            meta.page_table + jnp.asarray(layer_idx, jnp.int32) * Ptot
        ).astype(jnp.int32)
        kv_lens = jnp.maximum(meta.seq_lens, 1).astype(jnp.int32)
        cu_q = jnp.concatenate(
            [jnp.zeros(1, jnp.int32),
             jnp.cumsum(meta.extend_lens).astype(jnp.int32)]
        )
        num_seqs = jnp.sum(meta.extend_lens > 0).astype(jnp.int32).reshape(1)
        if Dp != D:
            q = jnp.pad(q, [(0, 0), (0, 0), (0, Dp - D)])
        q = q * jnp.asarray(sm_scale, q.dtype)
        sharded = shard_map(
            lambda qq, kk, kl, pt, cq, ns: body(
                qq, kk, kl, pt, cq, ns, logit_cap, sliding_window
            ),
            mesh=mesh,
            in_specs=(
                PS(None, "tp", None),        # q: heads sharded
                PS(None, None, "tp", None),  # kv pages: heads sharded
                PS(), PS(), PS(), PS(),      # metadata replicated
            ),
            out_specs=PS(None, "tp", None),
            check_vma=False,
        )
        out = sharded(q, kv.kv, kv_lens, pt_global, cu_q, num_seqs)
        return out[..., :D]

    return attend
