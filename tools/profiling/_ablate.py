"""Ablate gqa_decode kernel stages to find the per-chunk bottleneck."""
import time, functools, sys
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")

_NEG = -1e30

def make_kernel(mode, page_size, chunk_pages):
    def kern(pt_ref, len_ref, q_ref, kv_hbm, o_ref, kv_buf, sems, cursor):
        b = pl.program_id(0)
        B = pl.num_programs(0)
        CP = chunk_pages
        CHUNK = CP * page_size
        Hq, Dp = q_ref.shape[1], q_ref.shape[2]
        H2 = kv_buf.shape[3]
        LANES = H2 * Dp
        G = Hq // (H2 // 2)

        def nchunks(seq):
            return jnp.maximum(pl.cdiv(len_ref[seq], CHUNK), 1)

        def chunk_dmas(seq, c, slot):
            return [pltpu.make_async_copy(kv_hbm.at[pt_ref[seq, c*CP+j]], kv_buf.at[slot, j], sems.at[slot]) for j in range(CP)]

        def start_chunk(seq, c, slot):
            for d in chunk_dmas(seq, c, slot): d.start()
        def wait_chunk(seq, c, slot):
            for d in chunk_dmas(seq, c, slot): d.wait()

        @pl.when(b == 0)
        def _():
            cursor[0] = 0
            start_chunk(0, 0, 0)

        slot0 = cursor[0]
        seq_len = len_ref[b]
        live = nchunks(b)
        dt = q_ref.dtype
        q = q_ref[0]
        qt = jnp.concatenate([q] * H2, axis=1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (Hq, LANES), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (Hq, LANES), 0)
        q_bd = jnp.where(lane // Dp == 2 * (row // G), qt, jnp.zeros((), dt))

        def body(c, carry):
            m, l, acc = carry
            slot = jax.lax.rem(slot0 + c, 2)
            last_of_seq = c + 1 >= live
            nseq = jnp.where(last_of_seq, b + 1, b)
            nc = jnp.where(last_of_seq, 0, c + 1)
            @pl.when(nseq < B)
            def _():
                start_chunk(nseq, nc, jax.lax.rem(slot + 1, 2))
            wait_chunk(b, c, slot)
            if mode == "dma_only":
                return m, l, acc + kv_buf[slot, 0, 0, 0, 0].astype(jnp.float32)
            raw = kv_buf[slot].reshape(CHUNK, LANES)
            if mode == "reshape_only":
                return m, l, acc + jnp.sum(raw.astype(jnp.float32), axis=0)[None, :]
            buf = raw
            s = jax.lax.dot_general(q_bd, buf, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
            if mode == "sdot_only":
                return m, l + jnp.sum(s, axis=-1, keepdims=True), acc
            col = c * CHUNK + jax.lax.broadcasted_iota(jnp.int32, (Hq, CHUNK), 1)
            s = jnp.where(col < seq_len, s, _NEG)
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            alpha = jnp.exp(m - m_new)
            p = jnp.exp(s - m_new)
            l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
            if mode == "no_pv":
                return m_new, l_new, acc
            pq = p.astype(buf.dtype)
            pv = jax.lax.dot_general(pq, buf, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
            acc_new = acc * alpha + pv
            return m_new, l_new, acc_new

        m0 = jnp.full((Hq, 1), _NEG, jnp.float32)
        l0 = jnp.zeros((Hq, 1), jnp.float32)
        acc0 = jnp.zeros((Hq, LANES if mode != "dma_only" else 1), jnp.float32)
        if mode == "reshape_only":
            acc0 = jnp.zeros((1, LANES), jnp.float32)
        m, l, acc = jax.lax.fori_loop(0, live, body, (m0, l0, acc0))
        cursor[0] = jax.lax.rem(slot0 + live, 2)
        stat = (m + l + acc[:1, :1]).astype(o_ref.dtype)  # [Hq,1] or [1,1]
        o_ref[0] = jnp.zeros((Hq, o_ref.shape[2]), o_ref.dtype) + stat
    return kern

def run(mode, B=64, ctx=192, L=16, Hkv=8, ps=16, Hq=32, Dp=128, CP=16):
    pages_per_layer = 4096
    kv = jnp.zeros((pages_per_layer*L, ps, 2*Hkv, Dp), jnp.bfloat16)
    rng = np.random.default_rng(0)
    P = 32
    pt = jnp.asarray(rng.integers(0, pages_per_layer*L, (B, P)), jnp.int32)
    sl = jnp.full((B,), ctx, jnp.int32)
    q = jnp.asarray(rng.standard_normal((B, Hq, Dp)), jnp.bfloat16)
    kern = make_kernel(mode, ps, CP)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(B,),
        in_specs=[pl.BlockSpec((1, Hq, Dp), lambda b, *_: (b, 0, 0)), pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, Hq, Dp), lambda b, *_: (b, 0, 0)),
        scratch_shapes=[pltpu.VMEM((2, CP, ps, 2*Hkv, Dp), kv.dtype), pltpu.SemaphoreType.DMA((2,)), pltpu.SMEM((1,), jnp.int32)],
    )
    f = pl.pallas_call(kern, grid_spec=grid_spec, out_shape=jax.ShapeDtypeStruct((B, Hq, Dp), q.dtype),
                       compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)))
    @jax.jit
    def run16(q, pt, sl):
        o = q
        for _ in range(L):
            o = f(pt, sl, o, kv)
        return o
    np.asarray(run16(q, pt, sl))
    N = 30
    t0 = time.perf_counter()
    for _ in range(N):
        o = run16(q, pt, sl)
    np.asarray(o)
    dt = (time.perf_counter()-t0)/N
    print(f"{mode:14s}: {dt*1e3:.3f} ms  ({dt*1e6/(B*L):.2f} us/chunk)")

for mode in ["dma_only", "reshape_only", "sdot_only", "no_pv", "full"]:
    run(mode)
