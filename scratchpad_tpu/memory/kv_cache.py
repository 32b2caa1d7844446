"""Device-side paged KV cache.

TPU-native analogue of MHATokenToKVPool (reference: scratchpad/memory/pool.py:258-424).
All layers live in ONE combined array

    kv : [total_pages, page_size, 2 * num_kv_heads, head_dim]

with K and V interleaved on the head axis ([k0, v0, k1, v1, ...]) — the
layout consumed directly by the ragged-paged-attention kernel. The layer
folds into the page index: layer l's page p is global page
``l * pages_per_layer + p`` and token slot s is global row
``l * slots_per_layer + s``. Page p owns rows [p*page_size, (p+1)*page_size).

Writes are scatters at scheduler-computed slot indices; there is no
per-layer buffer list like the reference keeps.

Quantized KV (int8) stores int8 values plus per-(row, head) float scales —
finer than the reference's static per-layer fp8 scales (pool.py:274-278).

Sharding: the combined head axis is sharded over the mesh's "tp" axis,
matching the attention-head sharding of the model.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


# extra s8 lanes per row on inline-scale pools: a 128-lane hi-byte plane
# + a 128-lane lo-byte plane of the per-slot bf16 scales
INLINE_SCALE_LANES = 256


def padded_head_dim(d: int) -> int:
    """Round head_dim up to the 128-lane tile when a Pallas kernel needs to
    DMA per-page blocks (pages pack two-per-lane-row below 128 and become
    unsliceable)."""
    return max(128, -(-d // 128) * 128)


@dataclasses.dataclass(frozen=True)
class KVCacheConfig:
    num_layers: int
    num_pages: int  # per layer
    page_size: int
    num_kv_heads: int
    head_dim: int
    dtype: Any = jnp.bfloat16
    quantized: bool = False  # low-bit values + per-row scales
    quant_dtype: Any = jnp.int8  # int8 | float8_e4m3fn
    # packed K|V layout for head_dim <= 64: each kv head stores K in lanes
    # [0, 64) and V in lanes [64, 128) of ONE 128-lane row, so the pool is
    # [pages, ps, Hkv, 128] instead of the lane-padded [pages, ps, 2Hkv,
    # 128] — half the HBM bytes and half the decode-read traffic. XLA:TPU
    # tiles the last two dims to (8, 128), so a "tight" [.., 2Hkv, 64]
    # array would silently occupy the padded footprint anyway; packing two
    # 64-lane vectors per physical row is the only way to use those lanes.
    packed: bool = False
    # lane-folded head layout for QUANTIZED TP pools: [pages, ps, 2Hkv*Dp]
    # with each (K or V, head) slot one Dp(=128)-lane block, row lane order
    # [k0 | v0 | k1 | v1 | ...]. Sharding the LANE axis over "tp" hands
    # every shard [pages, ps, (2Hkv/tp)*128] — tile-aligned for 8-bit
    # dtypes at ANY tp (the sublane-major [.., 2Hkv/tp, 128] layout needs
    # (2Hkv)/tp % 4 == 0, i.e. tp <= 4 for Hkv=8; the lane layout carries
    # the same bytes in the order the gqa kernel's flattened [CHUNK, LANES]
    # block consumes, so page DMAs stay whole-leading-dim slices).
    lane_heads: bool = False
    # INLINE-SCALE quantized layout (single-device decode): each page
    # carries its per-(token, head, K/V-half) bf16 scales as 256 extra s8
    # lanes — one hi-byte plane and one lo-byte plane of 128 lanes each —
    # so the decode kernel streams ONE DMA per page instead of a kv+scale
    # pair (the second stream made int8 KV a net loss at small models,
    # r4). Pool shape [Pg, ps, H2*Dp + 256] with the kv lanes laid out
    # exactly like `lane_heads` (padded) or flattened `packed` rows; the
    # kernel rebuilds f32 scales with the same i32-shift+bitcast trick as
    # the fp8 dequant (Mosaic's native s8->bf16 bitcast merges SUBLANES,
    # not lanes, so byte planes are the expressible encoding).
    # Reference analogue: fp8 KV scales stored alongside the pool
    # (scratchpad/memory/pool.py:274-278).
    inline_scale: bool = False
    # MLA latent cache (reference: MLATokenToKVPool, memory/pool.py:427-474):
    # ONE vector per token per layer holding [c_kv(kv_lora_rank), k_rope],
    # i.e. head axis is 1 and head_dim is the latent width.
    mla: bool = False
    # cross-attention K/V slots (Mllama): [slots, cross_layers, S_img,
    # 2*Hkv, D], written once per request at prefill, read every decode.
    # slot 0 is the scratch row for requests without an image.
    cross_layers: int = 0
    cross_len: int = 0
    cross_slots: int = 0

    @property
    def num_slots(self) -> int:
        """Token slots per layer."""
        return self.num_pages * self.page_size

    @property
    def total_pages(self) -> int:
        return self.num_layers * self.num_pages

    def bytes_per_token(self) -> int:
        itemsize = 1 if self.quantized else jnp.dtype(self.dtype).itemsize
        if self.mla:
            heads = 1
        elif self.packed:
            heads = self.num_kv_heads  # one K|V row per head
        else:
            heads = 2 * self.num_kv_heads
        per = self.num_layers * heads * self.head_dim * itemsize
        if self.quantized:
            if self.inline_scale:
                # hi/lo byte planes inside the page rows
                per += self.num_layers * 256
            else:
                # per-(token, head, K/V-half) bf16 scales — packed rows
                # still carry separate K and V scales (bf16: the f32 scale
                # pages were 25-50% of the quantized read at small head
                # counts, r4)
                per += self.num_layers * 2 * self.num_kv_heads * 2
        return per


@dataclasses.dataclass
class KVCache:
    """Pytree of device arrays holding the paged cache."""

    kv: jax.Array  # [total_pages, ps, 2*Hkv, D], K/V interleaved per head
    # [total_pages, ps, scale_shards * SCALE_LANES] f32 for quantized
    # caches. The lane axis is laid out as `scale_shards` consecutive
    # 128-lane blocks so it shards over the mesh "tp" axis exactly like the
    # kv head axis: block i holds the scales of tp-shard i's local head
    # slots in its first (2*Hkv)/shards lanes. With scale_shards == 1 this
    # is the original single-device layout (first 2*Hkv lanes used). The
    # 128-lane pad makes per-page DMA slices expressible in mosaic and
    # keeps scatters/gathers on wide rows.
    scale: Optional[jax.Array] = None
    # per-request cross-attention K/V slots (Mllama)
    cross: Optional[jax.Array] = None  # [slots, Lx, S_img, 2*Hkv, D]
    num_layers: int = 1  # static: pages are laid out layer-major
    # packed K|V rows (see KVCacheConfig.packed): [pages, ps, Hkv, 128]
    packed: bool = False
    # number of 128-lane blocks the scale pool's lane axis is split into
    # (= the tp size the kv head axis shards over; 1 = unsharded)
    scale_shards: int = 1
    # lane-folded layout (see KVCacheConfig.lane_heads): kv is 3-D
    # [pages, ps, head_slots * head_dim]; 0 = the 4-D layouts above
    lane_head_slots: int = 0
    # inline-scale quantized pages (see KVCacheConfig.inline_scale): the
    # last INLINE_SCALE_LANES lanes of each row are the bf16 scale byte
    # planes; kv is 3-D and `scale` is None
    inline_scale: bool = False

    @property
    def lane_heads(self) -> bool:
        return self.lane_head_slots > 0 and not self.inline_scale

    @property
    def kv_lanes(self) -> int:
        """Lanes holding kv values (excludes inline scale planes)."""
        if self.inline_scale:
            return self.kv.shape[-1] - INLINE_SCALE_LANES
        return self.kv.shape[-1]

    @property
    def head_dim(self) -> int:
        if self.lane_head_slots > 0:
            return self.kv_lanes // self.lane_head_slots
        return self.kv.shape[-1]

    @property
    def num_kv_heads(self) -> int:
        if self.lane_head_slots > 0:
            if self.packed:
                return self.lane_head_slots
            return self.lane_head_slots // 2
        return self.kv.shape[-2] if self.packed else self.kv.shape[-2] // 2

    @property
    def slots_per_layer(self) -> int:
        return (self.kv.shape[0] // self.num_layers) * self.kv.shape[1]

    @property
    def pages_per_layer(self) -> int:
        return self.kv.shape[0] // self.num_layers


jax.tree_util.register_dataclass(
    KVCache,
    data_fields=["kv", "scale", "cross"],
    meta_fields=[
        "num_layers",
        "packed",
        "scale_shards",
        "lane_head_slots",
        "inline_scale",
    ],
)


def create_kv_cache(
    cfg: KVCacheConfig,
    mesh: Optional[Mesh] = None,
    tp_axis: Optional[str] = "tp",
) -> KVCache:
    """``tp_axis=None`` keeps the head axis unsharded (DP attention: every
    device attends its own token rows with full kv heads)."""
    if cfg.packed:
        assert not cfg.mla, "packed layout is MHA only"
        assert cfg.head_dim == 128, "packed rows are 128 lanes (2 x 64)"
        head_slots = cfg.num_kv_heads
    else:
        head_slots = 1 if cfg.mla else 2 * cfg.num_kv_heads
    if cfg.inline_scale:
        assert cfg.quantized and not cfg.mla, (
            "inline_scale is for quantized MHA pools"
        )
        assert mesh is None or tp_axis is None or tp_axis not in getattr(
            mesh, "axis_names", ()
        ), (
            "inline_scale pools are single-device (tp shards need the "
            "per-shard-block scale pool)"
        )
        assert cfg.head_dim % 128 == 0
        assert 2 * cfg.num_kv_heads <= 128, "scale byte planes hold <= 128 slots"
        shape = (
            cfg.total_pages,
            cfg.page_size,
            head_slots * cfg.head_dim + INLINE_SCALE_LANES,
        )
        kv = jnp.zeros(shape, cfg.quant_dtype)
        return KVCache(
            kv=kv,
            scale=None,
            cross=None,
            num_layers=cfg.num_layers,
            packed=cfg.packed,
            lane_head_slots=head_slots,
            inline_scale=True,
        )
    if cfg.lane_heads:
        assert not (cfg.packed or cfg.mla), "lane_heads is plain MHA only"
        assert cfg.head_dim % 128 == 0, "lane blocks must be lane-tiled"
        shape = (
            cfg.total_pages,
            cfg.page_size,
            head_slots * cfg.head_dim,
        )
    else:
        shape = (
            cfg.total_pages,
            cfg.page_size,
            head_slots,
            cfg.head_dim,
        )
    store_dtype = cfg.quant_dtype if cfg.quantized else cfg.dtype

    scale_shards = 1
    if mesh is not None:
        # MLA's latent cache has no head axis to shard — replicate it
        # (MQA-style: every tp shard attends the full latent). Meshes
        # without a tp axis (e.g. sp-only) replicate too.
        head_spec = (
            None
            if (cfg.mla or tp_axis is None or tp_axis not in mesh.axis_names)
            else tp_axis
        )
        # pipeline parallelism: the layer-major global page axis shards
        # exactly into per-stage layer blocks (parallel/pp.py)
        page_spec = "pp" if "pp" in mesh.axis_names else None
        if cfg.lane_heads:
            # lane-folded heads: shard the lane axis in Dp-lane-block units
            kv_sharding = NamedSharding(mesh, P(page_spec, None, head_spec))
        else:
            kv_sharding = NamedSharding(
                mesh, P(page_spec, None, head_spec, None)
            )
        # the scale pool's lane axis is laid out as one 128-lane block per
        # tp shard (see KVCache.scale) so it shards WITH the kv heads and
        # each shard's local view is exactly the single-device layout —
        # the gqa decode kernel streams its local scale pages unmodified
        if cfg.quantized and head_spec is not None:
            scale_shards = mesh.shape[head_spec]
        scale_sharding = NamedSharding(
            mesh,
            P(page_spec, None, head_spec if scale_shards > 1 else None),
        )
    else:
        kv_sharding = scale_sharding = None

    def _zeros(shape, dtype, sharding):
        if sharding is not None:
            return jax.jit(lambda: jnp.zeros(shape, dtype), out_shardings=sharding)()
        return jnp.zeros(shape, dtype)

    kv = _zeros(shape, store_dtype, kv_sharding)
    scale = None
    if cfg.quantized:
        # one scale per (token, head, K/V half) — 2*Hkv lanes even on
        # packed pools, interleaved [k0, v0, k1, v1, ...]
        scale_slots = 2 * cfg.num_kv_heads
        assert scale_slots % scale_shards == 0
        lanes = scale_shards * max(128, scale_slots // scale_shards)
        # bf16 scales: the 128-lane-padded f32 scale pages were 25-50% of
        # the quantized-pool read at small head counts (r4 finding — int8
        # KV measured net-negative at 1B); bf16 halves that. Quantizers
        # round the scale to bf16 BEFORE dividing so code/scale stay
        # consistent (xla_backend._quantize_rows).
        scale = _zeros(
            (cfg.total_pages, cfg.page_size, lanes),
            jnp.bfloat16,
            scale_sharding,
        )
    cross = None
    if cfg.cross_layers:
        cross = _zeros(
            (
                cfg.cross_slots,
                cfg.cross_layers,
                cfg.cross_len,
                2 * cfg.num_kv_heads,
                cfg.head_dim,
            ),
            cfg.dtype,
            None,
        )
    return KVCache(
        kv=kv,
        scale=scale,
        cross=cross,
        num_layers=cfg.num_layers,
        packed=cfg.packed,
        scale_shards=scale_shards,
        lane_head_slots=(2 * cfg.num_kv_heads) if cfg.lane_heads else 0,
    )
