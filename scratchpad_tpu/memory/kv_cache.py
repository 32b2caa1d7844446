"""Device-side paged KV cache.

TPU-native analogue of MHATokenToKVPool (reference: scratchpad/memory/pool.py:258-424).
All layers live in two stacked device arrays

    k_cache, v_cache : [num_kv_heads, num_layers, num_slots, head_dim]

where ``num_slots = num_pages * page_size`` and page ``p`` owns the contiguous
slot range ``[p*page_size, (p+1)*page_size)``. The head-major layout makes a
page's KV for one head a contiguous [page_size, head_dim] slab — the unit the
Pallas decode kernel DMAs from HBM — and putting layers *inside* the head
axis lets the (layer, page) pair fold into one global page index
``layer * pages_per_layer + page``, so paged-attention kernels see a single
[Hkv, total_pages, page_size, head_dim] pool with no per-layer slicing.

Writes are scatters at ``out_cache_loc`` slot indices computed by the
scheduler; there is no per-layer buffer list like the reference keeps
(scratchpad/memory/pool.py:258-424).

Quantized KV (int8) stores values as int8 plus per-slot-per-head float scales
(k_scale/v_scale: [num_kv_heads, num_layers, num_slots]); the reference
instead uses static per-layer scales for fp8 (pool.py:274-278).

Sharding: the leading kv-head axis is sharded over the mesh's "tp" axis,
matching the attention-head sharding of the model.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def padded_head_dim(d: int) -> int:
    """Round head_dim up to the 128-lane tile. Pallas paged kernels (ours
    and jax's) cannot express per-page [page_size, D] VMEM slices when
    D < 128 — mosaic packs two pages per lane row. Zero-padding the D axis
    costs nothing for D=128 models (Llama-8B/70B, Qwen) and 2x KV for small
    D=64 models."""
    return max(128, -(-d // 128) * 128)


@dataclasses.dataclass(frozen=True)
class KVCacheConfig:
    num_layers: int
    num_pages: int
    page_size: int
    num_kv_heads: int
    head_dim: int
    dtype: Any = jnp.bfloat16
    quantized: bool = False  # int8 values + per-slot scales

    @property
    def num_slots(self) -> int:
        return self.num_pages * self.page_size

    def bytes_per_token(self) -> int:
        itemsize = 1 if self.quantized else jnp.dtype(self.dtype).itemsize
        per = 2 * self.num_layers * self.num_kv_heads * self.head_dim * itemsize
        if self.quantized:
            per += 2 * self.num_layers * self.num_kv_heads * 4  # f32 scales
        return per


@dataclasses.dataclass
class KVCache:
    """Pytree of device arrays holding the paged cache."""

    k: jax.Array  # [Hkv, L, S, D]
    v: jax.Array  # [Hkv, L, S, D]
    k_scale: Optional[jax.Array] = None  # [Hkv, L, S] f32 when quantized
    v_scale: Optional[jax.Array] = None


jax.tree_util.register_dataclass(
    KVCache, data_fields=["k", "v", "k_scale", "v_scale"], meta_fields=[]
)


def create_kv_cache(
    cfg: KVCacheConfig, mesh: Optional[Mesh] = None, tp_axis: str = "tp"
) -> KVCache:
    shape = (cfg.num_kv_heads, cfg.num_layers, cfg.num_slots, cfg.head_dim)
    store_dtype = jnp.int8 if cfg.quantized else cfg.dtype

    if mesh is not None:
        kv_sharding = NamedSharding(mesh, P(tp_axis, None, None, None))
        scale_sharding = NamedSharding(mesh, P(tp_axis, None, None))
    else:
        kv_sharding = scale_sharding = None

    def _zeros(shape, dtype, sharding):
        if sharding is not None:
            return jax.jit(
                lambda: jnp.zeros(shape, dtype), out_shardings=sharding
            )()
        return jnp.zeros(shape, dtype)

    k = _zeros(shape, store_dtype, kv_sharding)
    v = _zeros(shape, store_dtype, kv_sharding)
    k_scale = v_scale = None
    if cfg.quantized:
        sshape = shape[:-1]
        k_scale = _zeros(sshape, jnp.float32, scale_sharding)
        v_scale = _zeros(sshape, jnp.float32, scale_sharding)
    return KVCache(k=k, v=v, k_scale=k_scale, v_scale=v_scale)
