import time, functools
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
from scratchpad_tpu.ops.attention.gqa_decode import _gqa_decode_call

L, Hkv, ps, Hq, D, Dp = 16, 8, 16, 32, 64, 128
pages_per_layer = 4096
Pg = pages_per_layer * L
kv = jnp.zeros((Pg, ps, 2*Hkv, Dp), jnp.bfloat16)
rng = np.random.default_rng(0)

def bench(B, ctx, tag):
    P = max(32, -(-ctx // ps))
    pt = jnp.asarray(rng.integers(0, pages_per_layer, (B, P)), jnp.int32)
    sl = jnp.full((B,), ctx, jnp.int32)
    q = jnp.asarray(rng.standard_normal((B, Hq, D)), jnp.bfloat16)
    call = functools.partial(_gqa_decode_call, page_size=ps, sm_scale=0.125,
        logit_cap=None, sliding_window=None, num_layers=L)
    @jax.jit
    def run16(q, kv, pt, sl):
        o = call(q, kv, None, jnp.int32(0), pt, sl)
        for l in range(1, L):
            o = call(o[..., :D], kv, None, jnp.int32(l), pt, sl)
        return o
    np.asarray(run16(q, kv, pt, sl))
    t0 = time.perf_counter(); N = 30
    for _ in range(N):
        o = run16(q, kv, pt, sl)
    np.asarray(o)
    dt = (time.perf_counter()-t0)/N
    live = B*ctx*L*2*Hkv*Dp*2
    print(f"{tag}: B={B} ctx={ctx}  {dt*1e3:.3f} ms  live {live/1e6:.0f} MB -> {live/dt/1e9:.0f} GB/s")

bench(64, 192, "base")
bench(16, 768, "fewseq")
bench(64, 768, "bigctx")
bench(64, 16, "tiny")
bench(64, 256, "ctx256")
