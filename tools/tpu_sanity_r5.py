"""On-chip sanity for round-5 kernel encodings (run BEFORE the A/B suites).

Real-Mosaic checks of the two byte-order assumptions that interpret mode
cannot prove:
  1. pltpu.bitcast(u8, int4) row order (4-bit W4 storage): low nibble ->
     row 2r, high nibble -> row 2r+1.
  2. inline-scale byte planes: the gqa kernel's i32-shift reconstruction
     matches the XLA gather fallback on the same inline pool.

Prints one PASS/FAIL line each; exits non-zero on failure.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main() -> None:
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", "/root/.cache/jax_comp_cache"
    )
    import jax.numpy as jnp

    ok = True

    # ---- 1. 4-bit matmul: u8-boundary bitcast kernel vs u8 v2 kernel
    from scratchpad_tpu.ops.quant.w4a16 import quantize_stacked
    from scratchpad_tpu.ops.quant.pallas_w4 import (
        to_4bit,
        w4_matmul_4bit,
        w4a16_matmul_pallas,
    )

    rng = np.random.default_rng(5)
    w = rng.normal(size=(2, 256, 256)).astype(np.float32)
    ql = quantize_stacked(jnp.asarray(w), group_size=128)
    q4 = to_4bit(ql)
    x = jnp.asarray(rng.normal(size=(8, 256)), jnp.bfloat16)
    ref = np.asarray(w4a16_matmul_pallas(x, ql, jnp.int32(1)), np.float32)
    out = np.asarray(w4_matmul_4bit(x, q4, jnp.int32(1), a8=False), np.float32)
    err = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
    good = err < 2e-2
    ok &= good
    print(f"{'PASS' if good else 'FAIL'} 4bit-bitcast vs u8 kernel "
          f"(rel err {err:.2e})", flush=True)

    # ---- 2. inline-scale decode kernel vs XLA gather on the same pool
    import dataclasses

    from scratchpad_tpu.executor.forward_meta import ForwardMeta, ForwardMode
    from scratchpad_tpu.memory.kv_cache import KVCacheConfig, create_kv_cache
    from scratchpad_tpu.ops.attention.gqa_decode import decode_attention_gqa
    from scratchpad_tpu.ops.attention.xla_backend import (
        decode_attention_xla,
        write_kv,
    )

    B, Hq, Hkv, D, ps, P = 8, 32, 8, 64, 16, 12
    Ptot = B * P + 2
    cfg = KVCacheConfig(
        num_layers=1, num_pages=Ptot, page_size=ps, num_kv_heads=Hkv,
        head_dim=128, quantized=True, quant_dtype=jnp.int8, packed=True,
        inline_scale=True,
    )
    kv = create_kv_cache(cfg)
    T = Ptot * ps
    k_new = jnp.asarray(rng.normal(size=(T, Hkv, D)), jnp.float32)
    v_new = jnp.asarray(rng.normal(size=(T, Hkv, D)), jnp.float32)
    kv = write_kv(kv, k_new, v_new, jnp.int32(0), jnp.arange(T))
    pt = np.zeros((B, P), np.int32)
    for b in range(B):
        pt[b] = np.arange(P) + b * P + 1
    seq_lens = np.full(B, P * ps - 3, np.int32)
    meta = ForwardMeta(
        mode=ForwardMode.DECODE,
        tokens=jnp.zeros(B, jnp.int32),
        positions=jnp.asarray(seq_lens - 1),
        out_cache_loc=jnp.zeros(B, jnp.int32),
        req_indices=jnp.arange(B, dtype=jnp.int32),
        page_table=jnp.asarray(pt),
        seq_lens=jnp.asarray(seq_lens),
        extend_lens=jnp.ones(B, jnp.int32),
        last_token_idx=jnp.arange(B, dtype=jnp.int32),
    )
    q = jnp.asarray(rng.normal(size=(B, Hq, D)), jnp.bfloat16)
    for group in ("0", "4"):
        os.environ["SPTPU_GQA_GROUP"] = group
        jax.clear_caches()
        out = np.asarray(
            decode_attention_gqa(
                q, kv, jnp.int32(0), meta, page_size=ps, sm_scale=0.125
            ),
            np.float32,
        )
        ref = np.asarray(
            decode_attention_xla(
                q.astype(jnp.float32), kv, jnp.int32(0), meta,
                page_size=ps, sm_scale=0.125,
            ),
            np.float32,
        )
        err = np.abs(out - ref).max()
        good = bool(np.isfinite(out).all()) and err < 5e-2
        ok &= good
        print(f"{'PASS' if good else 'FAIL'} inline-scale gqa group={group} "
              f"vs xla (abs err {err:.2e})", flush=True)

    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
