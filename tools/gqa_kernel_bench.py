"""Microbenchmark the gqa flash-decode kernel against its own HBM SOL.

The r3 profile put the kernel at ~0.6 of speed-of-light (VERDICT r3 weak 3).
This isolates it: a serving-shaped pool + page table, the kernel alone in a
jit loop, achieved GB/s vs the bytes it must stream (live KV + scale pages).

Run on the chip:  python tools/gqa_kernel_bench.py [preset] [ctx] [bs]
Sweeps SPTPU_GQA_CP (chunk pages); prints one JSON line per config.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    import jax.numpy as jnp

    from scratchpad_tpu.memory.kv_cache import KVCacheConfig, create_kv_cache
    from scratchpad_tpu.executor.forward_meta import ForwardMeta, ForwardMode
    from scratchpad_tpu.ops.attention.gqa_decode import decode_attention_gqa

    preset = sys.argv[1] if len(sys.argv) > 1 else "llama-3.2-1b"
    ctx = int(sys.argv[2]) if len(sys.argv) > 2 else 192
    B = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    kv_dtype = os.environ.get("KB_KV", "auto")
    packed = os.environ.get("KB_PACKED", "auto")

    from scratchpad_tpu.config.model_config import get_preset

    cfg = get_preset(preset, dtype="bfloat16")
    Hq, Hkv, D = cfg.num_attention_heads, cfg.num_kv_heads, cfg.head_dim
    ps = int(os.environ.get("KB_PS", "16"))
    L = 1  # single layer: the kernel is called per layer anyway
    pages_per_seq = -(-ctx // ps)
    Pg = B * pages_per_seq + 8

    use_packed = (packed == "1") or (packed == "auto" and D <= 64)
    quant = kv_dtype in ("int8", "fp8")
    inline = quant and os.environ.get("KB_INLINE", "0") == "1"
    kvc = KVCacheConfig(
        num_layers=L,
        num_pages=Pg,
        page_size=ps,
        num_kv_heads=Hkv,
        head_dim=128 if use_packed else max(128, D),
        dtype=jnp.bfloat16,
        quantized=quant,
        quant_dtype=jnp.int8 if kv_dtype != "fp8" else jnp.float8_e4m3fn,
        packed=use_packed,
        inline_scale=inline,
    )
    kv = create_kv_cache(kvc)
    # fill with noise so nothing special-cases zeros
    rng = jax.random.PRNGKey(0)
    kv.kv = (
        jax.random.randint(rng, kv.kv.shape, -100, 100, jnp.int32).astype(
            kv.kv.dtype
        )
        if quant and kvc.quant_dtype == jnp.int8
        else jax.random.normal(rng, kv.kv.shape, jnp.float32).astype(kv.kv.dtype)
    )
    if inline:
        # overwrite the byte planes with a valid bf16 scale (1/64: bits
        # 0x3C80 -> hi 0x3C, lo 0x80) so the masked softmax stays finite
        kvl = kv.kv_lanes
        kv.kv = kv.kv.at[..., kvl : kvl + 128].set(
            jnp.asarray(0x3C, kv.kv.dtype)
            if kv.kv.dtype == jnp.int8
            else jax.lax.bitcast_convert_type(
                jnp.full((), 0x3C, jnp.int8), kv.kv.dtype
            )
        )
        kv.kv = kv.kv.at[..., kvl + 128 :].set(
            jnp.asarray(-128, jnp.int32).astype(jnp.int8).astype(kv.kv.dtype)
            if kv.kv.dtype == jnp.int8
            else jax.lax.bitcast_convert_type(
                jnp.asarray(-128, jnp.int32).astype(jnp.int8), kv.kv.dtype
            )
        )
    elif kv.scale is not None:
        kv.scale = jnp.abs(jax.random.normal(rng, kv.scale.shape)) * 0.01

    # page table: sequential pages per request (allocator-typical)
    pt = np.zeros((B, pages_per_seq), np.int32)
    for b in range(B):
        pt[b] = np.arange(pages_per_seq) + b * pages_per_seq
    seq_lens = np.full(B, ctx, np.int32)
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
    q = jax.random.normal(rng, (B, Hq, D), jnp.bfloat16)

    # two-point measurement: the axon relay adds ~50 ms of fixed dispatch+
    # fetch latency per jit call, so a single loop count measures the relay
    # (r4 first attempt: "916 us/call" at a 35 us kernel). Timing N_LO and
    # N_HI iterations and differencing cancels the fixed offset exactly.
    N_LO = int(os.environ.get("KB_ITERS_LO", "100"))
    N_HI = int(os.environ.get("KB_ITERS_HI", "1100"))

    def make_many(iters):
        def many(q, kv_kv, kv_scale):
            import dataclasses as dc

            k = dc.replace(kv, kv=kv_kv, scale=kv_scale)

            def body(i, acc):
                o = decode_attention_gqa(
                    q + acc[:, :1, :1] * 0,  # chain: no DCE
                    k,
                    0,
                    meta,
                    page_size=ps,
                    sm_scale=D**-0.5,
                )
                return acc + o.astype(jnp.float32)

            return jax.lax.fori_loop(
                0, iters, body, jnp.zeros((B, Hq, D), jnp.float32)
            )

        return many

    # bytes the kernel must stream per call: each request's live pages
    page_bytes = int(np.prod(kv.kv.shape[1:])) * kv.kv.dtype.itemsize
    total = B * pages_per_seq * page_bytes
    if kv.scale is not None:
        total += (
            B
            * pages_per_seq
            * int(np.prod(kv.scale.shape[1:]))
            * kv.scale.dtype.itemsize
        )

    # sweep (chunk-pages, group-SB) variants: group=0 is the per-sequence
    # v2 kernel (CP applies), group>=2 the grouped single-chunk v3 kernel
    # (whole table per sequence, CP ignored). KB_SWEEP overrides, e.g.
    # "16:0,16:4" = v2 cp16 + grouped sb4.
    sweep = os.environ.get("KB_SWEEP", "8:0,16:0,32:0,0:2,0:4,0:8")
    combos = []
    for tok in sweep.split(","):
        cp_s, grp_s = tok.split(":")
        combos.append((int(cp_s), int(grp_s)))
    for cp, grp in combos:
        os.environ["SPTPU_GQA_CP"] = str(cp or 16)
        os.environ["SPTPU_GQA_GROUP"] = str(grp)
        jax.clear_caches()
        jlo = jax.jit(make_many(N_LO))
        jhi = jax.jit(make_many(N_HI))
        np.asarray(jlo(q, kv.kv, kv.scale))  # compile + warm
        np.asarray(jhi(q, kv.kv, kv.scale))

        def timed(f):
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                np.asarray(f(q, kv.kv, kv.scale))
                best = min(best, time.perf_counter() - t0)
            return best

        dt = (timed(jhi) - timed(jlo)) / (N_HI - N_LO)
        gbs = total / dt / 1e9
        print(
            json.dumps(
                {
                    "preset": preset, "ctx": ctx, "bs": B, "cp": cp,
                    "group": grp,
                    "kv": kv_dtype, "packed": use_packed, "ps": ps,
                    "slots": os.environ.get("SPTPU_GQA_SLOTS", "2"),
                    "us_per_call": round(dt * 1e6, 1),
                    "achieved_GBs": round(gbs, 1),
                    "frac_of_819": round(gbs / 819.0, 3),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
