"""Isolated W4A16 dequant-matmul sweep at Llama-8B decode shapes (VERDICT
r2 item 3: raise the 8B step from 0.42-0.54 to >= 0.60 of the HBM
roofline). Times ops/quant/pallas_w4.py across block sizes and kernel
variants on the real chip and prints achieved GB/s vs the 819 GB/s v5e
speed of light per matmul shape.

Timing note (CLAUDE.md): block_until_ready through the axon relay is
unreliable — each measurement fetches the result with np.asarray and we
amortise over ITERS calls chained by a data dependency.

Run: python tools/bench_w4_kernel.py [--bs 32] [--iters 8]
Env: SPTPU_W4_KERNEL=v1|v2, SPTPU_W4_OUT_BLOCK=...
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

# Llama-3.1-8B decode matmuls: (name, In, Out)
SHAPES = [
    ("qkv", 4096, 6144),
    ("o", 4096, 4096),
    ("gate_up", 4096, 28672),  # fused gate+up
    ("down", 14336, 4096),
]
HBM_GBPS = 819.0
L = 4  # stacked layers (enough to defeat any L1-resident effects)


def quantize(rng, In, Out, group_size=128):
    from scratchpad_tpu.ops.quant.w4a16 import quantize_stacked

    w = rng.standard_normal((L, In, Out)).astype(np.float32) * 0.02
    return quantize_stacked(jnp.asarray(w, jnp.bfloat16))


def bench_shape(name, In, Out, bs, iters, out_block):
    from scratchpad_tpu.ops.quant.pallas_w4 import w4a16_matmul_pallas

    rng = np.random.default_rng(0)
    ql = quantize(rng, In, Out)
    x0 = jnp.asarray(rng.standard_normal((bs, In)), jnp.bfloat16)

    @jax.jit
    def run(x):
        # chain iters calls through a data dependency so one fetch times
        # the whole sequence; cycle the layer index to defeat caching
        def body(i, x):
            y = w4a16_matmul_pallas(x, ql, i % L, out_block=out_block)
            # fold [bs, Out] back to [bs, In] to keep the chain shaped
            pad = (-Out) % In
            yf = jnp.pad(y, [(0, 0), (0, pad)]).reshape(bs, -1, In).sum(1)
            return (yf * 1e-3).astype(x.dtype)

        return jax.lax.fori_loop(0, iters, body, x)

    np.asarray(run(x0))  # compile + warm
    t0 = time.perf_counter()
    np.asarray(run(x0))
    dt = (time.perf_counter() - t0) / iters
    weight_bytes = In * Out / 2 + (In // 128) * Out * 4 * 2  # nibbles+s+z
    gbs = weight_bytes / dt / 1e9
    frac = gbs / HBM_GBPS
    print(
        f"{name:8s} In={In:6d} Out={Out:6d} out_blk={out_block:5d} "
        f"{dt * 1e6:8.1f} us  {gbs:7.1f} GB/s  {frac:.3f} of SOL"
    )
    return frac


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=32)
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--blocks", type=int, nargs="*", default=[256, 512, 1024])
    args = ap.parse_args()
    print(
        f"backend={jax.default_backend()} "
        f"kernel={os.environ.get('SPTPU_W4_KERNEL', 'v2')} bs={args.bs}"
    )
    worst = 1.0
    for blk in args.blocks:
        print(f"-- out_block {blk}")
        for name, In, Out in SHAPES:
            worst = min(worst, bench_shape(name, In, Out, args.bs, args.iters, blk))
    print(f"worst fraction: {worst:.3f}")


if __name__ == "__main__":
    main()
