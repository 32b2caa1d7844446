import time, functools
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")

from scratchpad_tpu.ops.attention.gqa_decode import _gqa_decode_call

B, Hq, D, Dp = 64, 32, 64, 128
L, Hkv, ps = 16, 8, 16
pages_per_layer = 4096
Pg = pages_per_layer * L
kv = jnp.zeros((Pg, ps, 2*Hkv, Dp), jnp.bfloat16)
ctx = 192
P = 32  # page table width
rng = np.random.default_rng(0)
pt = jnp.asarray(rng.integers(0, pages_per_layer, (B, P)), jnp.int32)
sl = jnp.full((B,), ctx, jnp.int32)
q = jnp.asarray(rng.standard_normal((B, Hq, D)), jnp.bfloat16)

call = functools.partial(_gqa_decode_call, page_size=ps, sm_scale=0.125,
    logit_cap=None, sliding_window=None, num_layers=L)

@jax.jit
def run16(q, kv, pt, sl):
    out = q
    for l in range(L):
        out = call(out[..., :D] if out.shape[-1]!=D else out, kv, None, jnp.int32(l), pt, sl)
    return out

o = run16(q, kv, pt, sl); np.asarray(o)  # compile+warm
t0 = time.perf_counter()
N = 50
for _ in range(N):
    o = run16(q, kv, pt, sl)
res = np.asarray(o)
dt = (time.perf_counter() - t0) / N
live_bytes = B*ctx*L*2*Hkv*Dp*2
print(f"16-layer attn: {dt*1e3:.3f} ms  live KV {live_bytes/1e6:.0f} MB -> {live_bytes/dt/1e9:.0f} GB/s effective")
streamed = B*16*ps*L*2*Hkv*Dp*2  # 16 pages per chunk DMA
print(f"streamed (chunk-padded): {streamed/1e6:.0f} MB -> {streamed/dt/1e9:.0f} GB/s")
