"""AOT-compile the quantized-KV TP attention path for a v5e-8 mesh — no TPU
needed — and fail if XLA inserted full-pool relayout copies.

Why this exists: 2-D (page, offset) index scatters/gathers on s8 pools make
XLA:TPU pick transposed operand layouts that conflict with the Mosaic
kernels' default layout, producing whole-pool copy ops (multi-GiB allocs,
compile-time OOM at serving sizes). The engine avoids this by scattering/
gathering through ONE flattened leading dim (ops/attention/xla_backend.py
write_kv/_gather_kv); this tool is the regression check for the TP variant
(VERDICT r2 item 2), compiling

    write_kv (int8 quantize + scale-block scatter)
  + gqa_tp decode      (shard_map Pallas kernel, local scale blocks)
  + ragged_quant_tp extend (per-shard dequant scratch + ragged kernel)

on a virtual v5e-8 topology (jax.experimental.topologies) and counting
copy/transpose instructions whose operand is pool-sized.

Two configurations compile (VERDICT r3 item 4):
  tp=4  sublane-major pool [Pg, ps, 2Hkv, Dp]  ((2*Hkv)/tp % 4 == 0 holds)
  tp=8  lane-folded  pool [Pg, ps, 2Hkv*Dp]   (memory/kv_cache.py
        lane_heads — the layout that makes BASELINE config 3 expressible
        on a full v5e-8 host)

Run: python tools/aot_tp_quant_check.py   (exit 0 = clean)
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import topologies
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Llama-3.1-8B-ish attention shapes at serving size. TP = 4: 8-bit pools
# sublane-pack 4 head slots per (32, 128) tile, so the per-shard page DMA
# needs (2*Hkv)/tp % 4 == 0 — tp=8 leaves 2 local slots and Mosaic rejects
# the sublane slice ("must be aligned to tiling (4)"); tp=8 instead uses
# the lane-folded layout below.
B, Hq, Hkv, D, ps = 64, 32, 8, 128, 16
L, Ptot, PP = 32, 2048, 16  # layers, pages/layer, pages/req


def get_mesh(tp):
    topo = topologies.get_topology_desc(
        platform="tpu",
        topology_name="v5e:2x4",
        chips_per_host_bounds=(2, 4, 1),
        num_slices=1,
    )
    devs = np.array(topo.devices[:tp]).reshape(1, tp)
    return Mesh(devs, ("dp", "tp"))


def build(mesh, tp, lane_heads):
    from scratchpad_tpu.memory.kv_cache import KVCache
    from scratchpad_tpu.ops.attention.gqa_decode import (
        make_decode_attention_gqa_tp,
    )
    from scratchpad_tpu.ops.attention.ragged_backend import (
        make_attention_ragged_quant_tp,
    )
    from scratchpad_tpu.ops.attention.xla_backend import write_kv
    from scratchpad_tpu.executor.forward_meta import ForwardMeta, ForwardMode

    H2 = 2 * Hkv
    decode_tp = make_decode_attention_gqa_tp(mesh)
    extend_tp = make_attention_ragged_quant_tp(mesh)

    def step(kv_pool, kv_scale, q, k_new, v_new, page_table, seq_lens, loc):
        kv = KVCache(
            kv=kv_pool,
            scale=kv_scale,
            num_layers=L,
            scale_shards=tp,
            lane_head_slots=H2 if lane_heads else 0,
        )
        meta = ForwardMeta(
            mode=ForwardMode.DECODE,
            tokens=jnp.zeros((B,), jnp.int32),
            positions=seq_lens - 1,
            out_cache_loc=loc,
            req_indices=jnp.arange(B, dtype=jnp.int32),
            page_table=page_table,
            seq_lens=seq_lens,
            extend_lens=jnp.ones((B,), jnp.int32),
            last_token_idx=jnp.arange(B, dtype=jnp.int32),
        )
        kv = write_kv(kv, k_new, v_new, jnp.int32(3), loc)
        out_d = decode_tp(
            q, kv, jnp.int32(3), meta, page_size=ps, sm_scale=D**-0.5
        )
        out_e = extend_tp(
            q, kv, jnp.int32(3), meta, page_size=ps, sm_scale=D**-0.5
        )
        return out_d, out_e, kv.kv, kv.scale

    pool_shape = (
        (L * Ptot, ps, H2 * D) if lane_heads else (L * Ptot, ps, H2, D)
    )
    pool_spec = (
        P(None, None, "tp") if lane_heads else P(None, None, "tp", None)
    )
    shapes = dict(
        kv_pool=jax.ShapeDtypeStruct(pool_shape, jnp.int8),
        kv_scale=jax.ShapeDtypeStruct((L * Ptot, ps, tp * 128), jnp.bfloat16),
        q=jax.ShapeDtypeStruct((B, Hq, D), jnp.bfloat16),
        k_new=jax.ShapeDtypeStruct((B, Hkv, D), jnp.bfloat16),
        v_new=jax.ShapeDtypeStruct((B, Hkv, D), jnp.bfloat16),
        page_table=jax.ShapeDtypeStruct((B, PP), jnp.int32),
        seq_lens=jax.ShapeDtypeStruct((B,), jnp.int32),
        loc=jax.ShapeDtypeStruct((B,), jnp.int32),
    )
    shardings = dict(
        kv_pool=NamedSharding(mesh, pool_spec),
        kv_scale=NamedSharding(mesh, P(None, None, "tp")),
        q=NamedSharding(mesh, P(None, "tp", None)),
        k_new=NamedSharding(mesh, P(None, "tp", None)),
        v_new=NamedSharding(mesh, P(None, "tp", None)),
        page_table=NamedSharding(mesh, P()),
        seq_lens=NamedSharding(mesh, P()),
        loc=NamedSharding(mesh, P()),
    )
    # donate the pools like the serving step does (donate_argnames=("kv",));
    # without aliasing XLA must copy any param that is also an output
    jitted = jax.jit(
        step,
        in_shardings=tuple(shardings[k] for k in shapes),
        donate_argnums=(0, 1),
    )
    return jitted.lower(*shapes.values())


def check(txt: str) -> list:
    """Count copy/transpose/bitcast-convert instructions whose result is
    pool-sized (>= 1/4 of the full pool row count) — a layout conflict
    shows up as a whole-pool copy, not a page-sized one."""
    pool_rows = L * Ptot  # leading dim of the pool
    bad = []
    for m in re.finditer(r"^\s*(\S+)\s*=\s*\S+\s+(copy|transpose)\(", txt, re.M):
        line = txt[m.start() : txt.find("\n", m.start())]
        dims = re.search(r"(?:s8|f32|bf16)\[([\d,]+)\]", line)
        if not dims:
            continue
        shape = [int(x) for x in dims.group(1).split(",")]
        if shape and shape[0] >= pool_rows // 4:
            bad.append(line.strip()[:160])
    return bad


def run_one(tp, lane_heads) -> bool:
    tag = f"tp={tp} {'lane-folded' if lane_heads else 'sublane-major'}"
    mesh = get_mesh(tp)
    lowered = build(mesh, tp, lane_heads)
    compiled = lowered.compile()
    txt = compiled.as_text()
    bad = check(txt)
    n_copy = txt.count(" copy(")
    print(f"[{tag}] compiled ok: hlo {len(txt)} chars, {n_copy} copy instrs")
    if bad:
        print(f"[{tag}] POOL-SIZED RELAYOUT COPIES FOUND:")
        for line in bad:
            print(" ", line)
        return False
    print(f"[{tag}] no pool-sized relayout copies — clean")
    return True


def main():
    ok = run_one(4, lane_heads=False)
    ok &= run_one(8, lane_heads=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
