"""Packed K|V cache layout (memory/kv_cache.py packed=True).

For head_dim <= 64 GQA models the lane-padded pool wastes half of every
(8, 128) tile; the packed layout stores K in lanes [0, 64) and V in
[64, 128) of ONE row per kv head — [pages, ps, Hkv, 128] — halving KV HBM
and the decode read. These tests pin:
- write_kv/_gather_kv round-trips on a packed pool
- the gqa decode kernel's packed mode vs the XLA reference (interpret)
- the packed extend scratch (attention_ragged_packed) vs the XLA extend
- end-to-end engine greedy parity: kv_layout=packed vs padded vs xla
"""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from scratchpad_tpu.executor.forward_meta import ForwardMeta, ForwardMode
from scratchpad_tpu.memory.kv_cache import KVCache, KVCacheConfig, create_kv_cache
from scratchpad_tpu.ops.attention.gqa_decode import decode_attention_gqa
from scratchpad_tpu.ops.attention.xla_backend import (
    decode_attention_xla,
    extend_attention_xla,
    write_kv,
)


def make_pair(B=4, Hq=8, Hkv=2, D=64, ps=16, P=16, L=2, seed=0):
    """The same random KV content in a padded pool and a packed pool."""
    rng = np.random.default_rng(seed)
    Ptot = P * B + 1
    q = jnp.asarray(rng.normal(size=(B, Hq, D)), jnp.float32)
    k = rng.normal(size=(L * Ptot, ps, Hkv, D)).astype(np.float32)
    v = rng.normal(size=(L * Ptot, ps, Hkv, D)).astype(np.float32)
    padded = np.zeros((L * Ptot, ps, 2 * Hkv, 128), np.float32)
    padded[:, :, 0::2, :D] = k
    padded[:, :, 1::2, :D] = v
    pad64 = ((0, 0), (0, 0), (0, 0), (0, 64 - D))
    packed = np.concatenate(
        [np.pad(k, pad64), np.pad(v, pad64)], axis=-1
    )  # [Pg, ps, Hkv, 128]
    cache_pad = KVCache(kv=jnp.asarray(padded), num_layers=L)
    cache_pk = KVCache(kv=jnp.asarray(packed), num_layers=L, packed=True)
    pt = np.zeros((B, P), np.int32)
    seq_lens = rng.integers(1, P * ps, B).astype(np.int32)
    nxt = 1
    for b in range(B):
        for p in range(-(-int(seq_lens[b]) // ps)):
            pt[b, p] = nxt
            nxt += 1
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
    return q, cache_pad, cache_pk, meta


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("D", [64, 32])
def test_packed_decode_matches_xla(seed, D):
    q, cache_pad, cache_pk, meta = make_pair(seed=seed, D=D)
    kw = dict(page_size=16, sm_scale=0.125)
    ref = decode_attention_xla(q, cache_pad, jnp.int32(1), meta, **kw)
    out = decode_attention_gqa(q, cache_pk, jnp.int32(1), meta, **kw)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_packed_decode_padding_rows():
    q, _, cache_pk, meta = make_pair(B=4)
    seq = np.asarray(meta.seq_lens).copy()
    seq[2:] = 0
    meta = dataclasses.replace(meta, seq_lens=jnp.asarray(seq))
    out = np.asarray(
        decode_attention_gqa(
            q, cache_pk, jnp.int32(0), meta, page_size=16, sm_scale=0.125
        )
    )
    assert np.isfinite(out).all()
    assert np.abs(out[2:]).max() == 0.0


def test_packed_grouping():
    """Query group h must read kv head h//G out of the packed rows."""
    Hq, Hkv, D, ps = 4, 2, 64, 16
    Ptot = 16
    packed = np.ones((Ptot, ps, Hkv, 128), np.float32)
    packed[:, :, 0, 64:] = 5.0  # v of head 0
    packed[:, :, 1, 64:] = 7.0  # v of head 1
    cache = KVCache(kv=jnp.asarray(packed), num_layers=1, packed=True)
    q = jnp.ones((1, Hq, D), jnp.float32)
    meta = ForwardMeta(
        mode=ForwardMode.DECODE,
        tokens=jnp.zeros(1, jnp.int32),
        positions=jnp.asarray([31]),
        out_cache_loc=jnp.zeros(1, jnp.int32),
        req_indices=jnp.arange(1, dtype=jnp.int32),
        page_table=jnp.asarray([[1, 2, 0, 0]], jnp.int32),
        seq_lens=jnp.asarray([32]),
        extend_lens=jnp.ones(1, jnp.int32),
        last_token_idx=jnp.arange(1, dtype=jnp.int32),
    )
    out = np.asarray(
        decode_attention_gqa(
            q, cache, jnp.int32(0), meta, page_size=ps, sm_scale=0.125
        )
    )
    np.testing.assert_allclose(out[0, 0], 5.0, rtol=1e-6)
    np.testing.assert_allclose(out[0, 1], 5.0, rtol=1e-6)
    np.testing.assert_allclose(out[0, 2], 7.0, rtol=1e-6)
    np.testing.assert_allclose(out[0, 3], 7.0, rtol=1e-6)


@pytest.mark.parametrize("D", [64, 32])
def test_packed_write_gather_roundtrip(D):
    """write_kv packs rows; _gather_kv unpacks them bit-exactly."""
    from scratchpad_tpu.ops.attention.xla_backend import _gather_kv

    Hkv, ps, P, L, T = 2, 4, 8, 2, 10
    cfg = KVCacheConfig(
        num_layers=L,
        num_pages=P,
        page_size=ps,
        num_kv_heads=Hkv,
        head_dim=128,
        dtype=jnp.float32,
        packed=True,
    )
    kv = create_kv_cache(cfg)
    rng = np.random.default_rng(0)
    k = jnp.asarray(rng.normal(size=(T, Hkv, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(T, Hkv, D)), jnp.float32)
    # tokens land in page 1 (slots 4..13)
    loc = jnp.arange(4, 4 + T, dtype=jnp.int32)
    kv = write_kv(kv, k, v, jnp.int32(1), loc)
    meta = ForwardMeta(
        mode=ForwardMode.DECODE,
        tokens=jnp.zeros(1, jnp.int32),
        positions=jnp.asarray([T - 1]),
        out_cache_loc=jnp.zeros(1, jnp.int32),
        req_indices=jnp.zeros(1, jnp.int32),
        page_table=jnp.asarray([[1, 2, 3]], jnp.int32),
        seq_lens=jnp.asarray([4 + T]),
        extend_lens=jnp.ones(1, jnp.int32),
        last_token_idx=jnp.zeros(1, jnp.int32),
    )
    # the gather starts at page 1 (slot 4), so the writes sit at rows 0..T
    gk, gv = _gather_kv(kv, jnp.int32(1), meta, ps, D)
    np.testing.assert_array_equal(np.asarray(gk[0, :T]), np.asarray(k))
    np.testing.assert_array_equal(np.asarray(gv[0, :T]), np.asarray(v))
    # other layer untouched
    gk0, gv0 = _gather_kv(kv, jnp.int32(0), meta, ps, D)
    assert np.abs(np.asarray(gk0)).max() == 0.0


def test_packed_extend_scratch_matches_xla():
    """attention_ragged_packed (expand batch pages -> ragged kernel's dense
    CPU reference) vs the XLA gather extend on the same packed pool."""
    from scratchpad_tpu.ops.attention.ragged_backend import (
        attention_ragged_packed,
    )

    rng = np.random.default_rng(0)
    B, Hq, Hkv, D, ps, P, L = 2, 4, 2, 64, 4, 6, 2
    Ptot = 32
    packed = rng.normal(size=(L * Ptot, ps, Hkv, 128)).astype(np.float32)
    cache = KVCache(kv=jnp.asarray(packed), num_layers=L, packed=True)
    # request 0: 7 cached + 5 new; request 1: 0 cached + 9 new
    seq_lens = np.asarray([12, 9], np.int32)
    extend_lens = np.asarray([5, 9], np.int32)
    T = int(extend_lens.sum())
    pt = np.zeros((B, P), np.int32)
    pt[0, :3] = [1, 2, 3]
    pt[1, :3] = [4, 5, 6]
    positions = np.concatenate(
        [np.arange(7, 12, dtype=np.int32), np.arange(0, 9, dtype=np.int32)]
    )
    req_idx = np.concatenate([np.zeros(5, np.int32), np.ones(9, np.int32)])
    q = jnp.asarray(rng.normal(size=(T, Hq, D)), jnp.float32)
    meta = ForwardMeta(
        mode=ForwardMode.EXTEND,
        tokens=jnp.zeros(T, jnp.int32),
        positions=jnp.asarray(positions),
        out_cache_loc=jnp.zeros(T, jnp.int32),
        req_indices=jnp.asarray(req_idx),
        page_table=jnp.asarray(pt),
        seq_lens=jnp.asarray(seq_lens),
        extend_lens=jnp.asarray(extend_lens),
        last_token_idx=jnp.asarray([4, 13], jnp.int32),
    )
    kw = dict(page_size=ps, sm_scale=0.125)
    ref = extend_attention_xla(q, cache, jnp.int32(1), meta, **kw)
    out = attention_ragged_packed(q, cache, jnp.int32(1), meta, **kw)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_packed_engine_parity_and_pool_shape():
    """kv_layout=packed serves end-to-end, greedy-equal to padded gqa and
    to the XLA backend; the pool is half the padded footprint."""
    from scratchpad_tpu.config import ServerArgs
    from scratchpad_tpu.sampling.sampling_params import SamplingParams
    from scratchpad_tpu.server.engine import Engine

    rng = np.random.default_rng(0)
    prompts = [rng.integers(1, 500, n).tolist() for n in (9, 25, 14)]
    sp = SamplingParams(temperature=0.0, max_new_tokens=6)

    def run(backend, layout):
        eng = Engine(
            ServerArgs(
                preset="tiny-debug",
                random_weights=True,
                dtype="float32",
                page_size=4,
                max_total_tokens=2048,
                attention_backend=backend,
                kv_layout=layout,
            )
        )
        out = [
            o.output_ids
            for o in eng.generate(input_ids=prompts, sampling_params=[sp] * 3)
        ]
        shape = eng.scheduler.runner.kv_cache.kv.shape
        eng.scheduler.check_memory_leak()
        return out, shape

    out_pk, shape_pk = run("gqa", "packed")
    out_pad, shape_pad = run("gqa", "padded")
    out_xla, _ = run("xla", "auto")
    assert out_pk == out_pad == out_xla
    assert shape_pk[2] * shape_pk[3] * 2 == shape_pad[2] * shape_pad[3]


def test_packed_radix_reuse():
    """Prefix cache hits read packed pages written by an earlier request."""
    from scratchpad_tpu.config import ServerArgs
    from scratchpad_tpu.sampling.sampling_params import SamplingParams
    from scratchpad_tpu.server.engine import Engine

    eng = Engine(
        ServerArgs(
            preset="tiny-debug",
            random_weights=True,
            dtype="float32",
            page_size=4,
            max_total_tokens=2048,
            attention_backend="gqa",
            kv_layout="packed",
        )
    )
    sp = SamplingParams(temperature=0.0, max_new_tokens=5, ignore_eos=True)
    base = list(range(1, 33))
    first = eng.generate(input_ids=base, sampling_params=sp)
    again = eng.generate(input_ids=base, sampling_params=sp)
    assert again.cached_tokens > 0
    assert again.output_ids == first.output_ids
    eng.scheduler.check_memory_leak()


@pytest.mark.parametrize("kvdt", ["int8", "fp8"])
def test_packed_quantized_engine_parity(kvdt):
    """packed + int8/fp8 compose (r3): K and V quantize per-half with their
    own scales in the interleaved scale lanes; greedy output must equal the
    PADDED quantized engine (same quantized values + scales, kernel math
    identical in f32)."""
    from scratchpad_tpu.config import ServerArgs
    from scratchpad_tpu.sampling.sampling_params import SamplingParams
    from scratchpad_tpu.server.engine import Engine

    rng = np.random.default_rng(2)
    prompts = [rng.integers(1, 500, n).tolist() for n in (9, 25, 14)]
    sp = SamplingParams(temperature=0.0, max_new_tokens=6)

    def run(layout):
        eng = Engine(
            ServerArgs(
                preset="tiny-debug",
                random_weights=True,
                dtype="float32",
                page_size=4,
                max_total_tokens=2048,
                attention_backend="gqa",
                kv_layout=layout,
                kv_cache_dtype=kvdt,
            )
        )
        out = [
            o.output_ids
            for o in eng.generate(input_ids=prompts, sampling_params=[sp] * 3)
        ]
        kvshape = eng.scheduler.runner.kv_cache.kv.shape
        packed = eng.scheduler.runner.kv_cache.packed
        eng.scheduler.check_memory_leak()
        return out, kvshape, packed

    out_pk, shape_pk, is_pk = run("packed")
    out_pad, shape_pad, is_pad = run("padded")
    assert is_pk and not is_pad
    assert out_pk == out_pad
    # half the quantized value bytes (scales equal)
    assert shape_pk[2] * shape_pk[3] * 2 == shape_pad[2] * shape_pad[3]


def test_packed_quantized_radix_reuse():
    from scratchpad_tpu.config import ServerArgs
    from scratchpad_tpu.sampling.sampling_params import SamplingParams
    from scratchpad_tpu.server.engine import Engine

    eng = Engine(
        ServerArgs(
            preset="tiny-debug",
            random_weights=True,
            dtype="float32",
            page_size=4,
            max_total_tokens=2048,
            attention_backend="gqa",
            kv_layout="packed",
            kv_cache_dtype="int8",
        )
    )
    sp = SamplingParams(temperature=0.0, max_new_tokens=5, ignore_eos=True)
    base = list(range(1, 33))
    first = eng.generate(input_ids=base, sampling_params=sp)
    again = eng.generate(input_ids=base, sampling_params=sp)
    assert again.cached_tokens > 0
    assert again.output_ids == first.output_ids
    eng.scheduler.check_memory_leak()


@pytest.mark.parametrize("kvdt", ["int8", "fp8"])
def test_inline_scale_engine_parity(kvdt):
    """kv_layout=inline (scales as byte planes INSIDE the kv pages — one
    DMA stream at decode, VERDICT r4 item 2) serves end-to-end: greedy
    output must equal the separate-scale-pool engine (same quantizer, same
    codes, bf16 scales round-trip exactly through the byte planes)."""
    from scratchpad_tpu.config import ServerArgs
    from scratchpad_tpu.sampling.sampling_params import SamplingParams
    from scratchpad_tpu.server.engine import Engine

    rng = np.random.default_rng(4)
    prompts = [rng.integers(1, 500, n).tolist() for n in (9, 25, 14)]
    sp = SamplingParams(temperature=0.0, max_new_tokens=6)

    def run(layout):
        eng = Engine(
            ServerArgs(
                preset="tiny-debug",
                random_weights=True,
                dtype="float32",
                page_size=4,
                max_total_tokens=2048,
                attention_backend="gqa",
                kv_layout=layout,
                kv_cache_dtype=kvdt,
            )
        )
        out = [
            o.output_ids
            for o in eng.generate(input_ids=prompts, sampling_params=[sp] * 3)
        ]
        kvc = eng.scheduler.runner.kv_cache
        eng.scheduler.check_memory_leak()
        return out, kvc.inline_scale, kvc.scale is None

    out_inl, is_inl, no_scale = run("inline")
    assert is_inl and no_scale
    out_sep, is_sep, _ = run("padded")
    assert not is_sep
    assert out_inl == out_sep


def test_inline_scale_radix_reuse_and_resize():
    """Inline pages ride radix reuse + pool resize unchanged (the scales
    move WITH the pages — no separate scale pool to keep in sync)."""
    from scratchpad_tpu.config import ServerArgs
    from scratchpad_tpu.sampling.sampling_params import SamplingParams
    from scratchpad_tpu.server.engine import Engine

    eng = Engine(
        ServerArgs(
            preset="tiny-debug",
            random_weights=True,
            dtype="float32",
            page_size=4,
            max_total_tokens=2048,
            attention_backend="gqa",
            kv_layout="inline",
            kv_cache_dtype="int8",
        )
    )
    sp = SamplingParams(temperature=0.0, max_new_tokens=5, ignore_eos=True)
    base = list(range(1, 33))
    first = eng.generate(input_ids=base, sampling_params=sp)
    again = eng.generate(input_ids=base, sampling_params=sp)
    assert again.cached_tokens > 0
    assert again.output_ids == first.output_ids
    eng.scheduler.check_memory_leak()
