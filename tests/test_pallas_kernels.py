"""Paged attention kernels vs XLA reference backend (interpret mode on CPU)."""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from scratchpad_tpu.executor.forward_meta import ForwardMeta, ForwardMode
from scratchpad_tpu.memory.kv_cache import KVCache, padded_head_dim
from scratchpad_tpu.ops.attention.pallas_decode import decode_attention_pallas
from scratchpad_tpu.ops.attention.xla_backend import decode_attention_xla


def make_case(B=4, Hq=8, Hkv=2, D=64, ps=16, P=16, L=2, seed=0,
              dtype=jnp.float32, pad=True):
    rng = np.random.default_rng(seed)
    Ptot = P * B + 1  # pages per layer; page 0 reserved
    Dp = padded_head_dim(D) if pad else D
    q = jnp.asarray(rng.normal(size=(B, Hq, D)), dtype)
    # combined interleaved cache; padded-lane content is irrelevant
    kv_arr = jnp.asarray(rng.normal(size=(L * Ptot, ps, 2 * Hkv, Dp)), dtype)
    cache = KVCache(kv=kv_arr, num_layers=L)
    pt = np.zeros((B, P), np.int32)
    seq_lens = rng.integers(1, P * ps, B).astype(np.int32)
    next_page = 1
    for b in range(B):
        for p in range(-(-int(seq_lens[b]) // ps)):
            pt[b, p] = next_page
            next_page += 1
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
    return q, cache, meta


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("caps", [(None, None), (30.0, None)])
def test_decode_kernel_matches_xla(seed, caps):
    logit_cap, sliding_window = caps
    q, kv, meta = make_case(seed=seed)
    kw = dict(
        page_size=16,
        sm_scale=0.125,
        logit_cap=logit_cap,
        sliding_window=sliding_window,
    )
    ref = decode_attention_xla(q, kv, jnp.int32(1), meta, **kw)
    out = decode_attention_pallas(q, kv, jnp.int32(1), meta, **kw)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_decode_kernel_padding_rows():
    """Rows with seq_len == 0 (batch padding) must return zeros, not NaN."""
    q, kv, meta = make_case(B=4)
    seq = np.asarray(meta.seq_lens).copy()
    seq[2:] = 0
    meta = dataclasses.replace(meta, seq_lens=jnp.asarray(seq))
    out = decode_attention_pallas(
        q, kv, jnp.int32(0), meta, page_size=16, sm_scale=0.125
    )
    a = np.asarray(out)
    assert np.isfinite(a).all()
    assert np.abs(a[2:]).max() == 0.0


def test_decode_kernel_gqa_grouping():
    """Head group h of q must attend to kv head h//G; K/V interleave holds."""
    B, Hq, Hkv, D, ps, P, L = 1, 4, 2, 64, 16, 8, 1
    Ptot = 64
    Dp = padded_head_dim(D)
    # kv head 0: v = 5s; kv head 1: v = 7s; all k = 1s
    kv_arr = np.ones((L * Ptot, ps, 2 * Hkv, Dp), np.float32)
    kv_arr[:, :, 1, :] = 5.0  # v of head 0
    kv_arr[:, :, 3, :] = 7.0  # v of head 1
    cache = KVCache(kv=jnp.asarray(kv_arr), num_layers=L)
    q = jnp.ones((B, Hq, D), jnp.float32)
    meta = ForwardMeta(
        mode=ForwardMode.DECODE,
        tokens=jnp.zeros(B, jnp.int32),
        positions=jnp.asarray([31]),
        out_cache_loc=jnp.zeros(B, jnp.int32),
        req_indices=jnp.arange(B, dtype=jnp.int32),
        page_table=jnp.asarray([[1, 2, 0, 0, 0, 0, 0, 0]], jnp.int32),
        seq_lens=jnp.asarray([32]),
        extend_lens=jnp.ones(B, jnp.int32),
        last_token_idx=jnp.arange(B, dtype=jnp.int32),
    )
    out = np.asarray(
        decode_attention_pallas(
            q, cache, jnp.int32(0), meta, page_size=ps, sm_scale=0.125
        )
    )
    np.testing.assert_allclose(out[0, 0], 5.0, rtol=1e-6)
    np.testing.assert_allclose(out[0, 1], 5.0, rtol=1e-6)
    np.testing.assert_allclose(out[0, 2], 7.0, rtol=1e-6)
    np.testing.assert_allclose(out[0, 3], 7.0, rtol=1e-6)


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("caps", [(None, None), (30.0, None), (None, 64)])
def test_gqa_decode_v2_matches_xla(seed, caps):
    from scratchpad_tpu.ops.attention.gqa_decode import decode_attention_gqa

    logit_cap, sliding_window = caps
    q, kv, meta = make_case(seed=seed)
    kw = dict(
        page_size=16,
        sm_scale=0.125,
        logit_cap=logit_cap,
        sliding_window=sliding_window,
    )
    ref = decode_attention_xla(q, kv, jnp.int32(1), meta, **kw)
    out = decode_attention_gqa(q, kv, jnp.int32(1), meta, **kw)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_gqa_decode_v2_padding_rows():
    from scratchpad_tpu.ops.attention.gqa_decode import decode_attention_gqa

    q, kv, meta = make_case(B=4)
    seq = np.asarray(meta.seq_lens).copy()
    seq[2:] = 0
    meta = dataclasses.replace(meta, seq_lens=jnp.asarray(seq))
    out = decode_attention_gqa(
        q, kv, jnp.int32(0), meta, page_size=16, sm_scale=0.125
    )
    a = np.asarray(out)
    assert np.isfinite(a).all()
    assert np.abs(a[2:]).max() == 0.0


def test_gqa_decode_v2_grouping():
    from scratchpad_tpu.ops.attention.gqa_decode import decode_attention_gqa

    B, Hq, Hkv, D, ps, P, L = 1, 4, 2, 64, 16, 8, 1
    Ptot = 64
    Dp = padded_head_dim(D)
    kv_arr = np.ones((L * Ptot, ps, 2 * Hkv, Dp), np.float32)
    kv_arr[:, :, 1, :] = 5.0  # v of head 0
    kv_arr[:, :, 3, :] = 7.0  # v of head 1
    cache = KVCache(kv=jnp.asarray(kv_arr), num_layers=L)
    q = jnp.ones((B, Hq, D), jnp.float32)
    meta = ForwardMeta(
        mode=ForwardMode.DECODE,
        tokens=jnp.zeros(B, jnp.int32),
        positions=jnp.asarray([31]),
        out_cache_loc=jnp.zeros(B, jnp.int32),
        req_indices=jnp.arange(B, dtype=jnp.int32),
        page_table=jnp.asarray([[1, 2, 0, 0, 0, 0, 0, 0]], jnp.int32),
        seq_lens=jnp.asarray([32]),
        extend_lens=jnp.ones(B, jnp.int32),
        last_token_idx=jnp.arange(B, dtype=jnp.int32),
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


@pytest.mark.parametrize("group", ["0", "2", "4"])
def test_gqa_decode_grouped_vs_per_seq(group, monkeypatch):
    """The grouped single-chunk kernel (v3, SPTPU_GQA_GROUP>=2) and the
    per-sequence kernel (GROUP=0) must agree with the XLA backend bit-for-
    bit at the same shapes (B=4 divisible by both group sizes)."""
    from scratchpad_tpu.ops.attention.gqa_decode import decode_attention_gqa

    monkeypatch.setenv("SPTPU_GQA_GROUP", group)
    jax.clear_caches()
    try:
        q, kv, meta = make_case(B=4, seed=3)
        kw = dict(page_size=16, sm_scale=0.125)
        ref = decode_attention_xla(q, kv, jnp.int32(1), meta, **kw)
        out = decode_attention_gqa(q, kv, jnp.int32(1), meta, **kw)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
        )
    finally:
        jax.clear_caches()


def test_gqa_decode_grouped_padding_rows(monkeypatch):
    """Grouped path: whole groups of padding rows (len 0) stay zero."""
    from scratchpad_tpu.ops.attention.gqa_decode import decode_attention_gqa

    monkeypatch.setenv("SPTPU_GQA_GROUP", "2")
    jax.clear_caches()
    try:
        q, kv, meta = make_case(B=8, seed=5)
        seq = np.asarray(meta.seq_lens).copy()
        seq[3:] = 0  # pad rows split across groups of 2
        meta = dataclasses.replace(meta, seq_lens=jnp.asarray(seq))
        out = decode_attention_gqa(
            q, kv, jnp.int32(0), meta, page_size=16, sm_scale=0.125
        )
        a = np.asarray(out)
        assert np.isfinite(a).all()
        assert np.abs(a[3:]).max() == 0.0
        ref = decode_attention_xla(
            q, kv, jnp.int32(0), meta, page_size=16, sm_scale=0.125
        )
        np.testing.assert_allclose(
            a[:3], np.asarray(ref)[:3], rtol=2e-5, atol=2e-5
        )
    finally:
        jax.clear_caches()


def test_gqa_decode_smem_batch_split(monkeypatch):
    """Long-context serving shapes overflow the 1 MiB SMEM with the
    prefetched [B, P] page table (measured: bs64 x 4096 pages, r5). The
    call must split the batch transparently; force a tiny budget and
    check bit-equality with the unsplit path."""
    from scratchpad_tpu.ops.attention.gqa_decode import decode_attention_gqa

    q, kv, meta = make_case(B=8, seed=13)
    kw = dict(page_size=16, sm_scale=0.125)
    ref = decode_attention_gqa(q, kv, jnp.int32(1), meta, **kw)
    monkeypatch.setenv("SPTPU_GQA_SMEM_SPLIT", "64")  # force 4-way split
    jax.clear_caches()
    try:
        out = decode_attention_gqa(q, kv, jnp.int32(1), meta, **kw)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-6, atol=2e-6
        )
    finally:
        jax.clear_caches()


def test_gqa_decode_v2_multi_layer_and_long():
    """Layer folding + many chunks per sequence (exercises the DMA chain)."""
    from scratchpad_tpu.ops.attention.gqa_decode import decode_attention_gqa

    q, kv, meta = make_case(B=3, P=32, L=3, seed=7)
    seq = np.asarray(meta.seq_lens).copy()
    seq[0] = 32 * 16 - 1  # full table: 4 chunks of 8 pages
    seq[1] = 17  # just over one page
    meta = dataclasses.replace(meta, seq_lens=jnp.asarray(seq))
    for layer in (0, 2):
        kw = dict(page_size=16, sm_scale=0.125)
        ref = decode_attention_xla(q, kv, jnp.int32(layer), meta, **kw)
        out = decode_attention_gqa(q, kv, jnp.int32(layer), meta, **kw)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
        )


def test_ragged_reference_matches_xla_decode():
    """The ragged kernel's jax reference impl must agree with our XLA
    backend given the same combined cache (validates layout + semantics)."""
    from jax.experimental.pallas.ops.tpu.ragged_paged_attention import (
        ref_ragged_paged_attention,
    )

    q, kv, meta = make_case(B=4, seed=2)
    kw = dict(page_size=16, sm_scale=0.125, logit_cap=None, sliding_window=None)
    ref = decode_attention_xla(q, kv, jnp.int32(1), meta, **kw)
    B, Hq, D = q.shape
    Ptot = kv.kv.shape[0] // kv.num_layers
    pt = meta.page_table + 1 * Ptot
    cu = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(meta.extend_lens).astype(jnp.int32)]
    )
    Dp = kv.kv.shape[-1]
    qp = jnp.pad(q, [(0, 0), (0, 0), (0, Dp - D)]) if Dp != D else q
    out = ref_ragged_paged_attention(
        (qp.astype(jnp.float32) * 0.125).astype(qp.dtype),
        kv.kv,
        meta.seq_lens.astype(jnp.int32),
        pt.astype(jnp.int32),
        cu,
        jnp.asarray([B], jnp.int32),
        sm_scale=1.0,
    )[..., :D]
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


class TestRingAttention:
    """Sequence-parallel ring attention vs dense causal reference."""

    def _mesh(self, n=8):
        import jax
        from jax.sharding import Mesh

        devs = jax.devices("cpu")[:n]
        return Mesh(np.array(devs), ("sp",))

    @pytest.mark.parametrize("Hq,Hkv", [(4, 4), (8, 2)])
    def test_matches_dense_causal(self, Hq, Hkv):
        import jax.numpy as jnp
        from scratchpad_tpu.ops.attention.ring import sp_ring_attention

        T, D = 64, 16
        rng = np.random.default_rng(0)
        q = rng.standard_normal((T, Hq, D)).astype(np.float32)
        k = rng.standard_normal((T, Hkv, D)).astype(np.float32)
        v = rng.standard_normal((T, Hkv, D)).astype(np.float32)
        scale = D**-0.5

        mesh = self._mesh()
        out = np.asarray(
            sp_ring_attention(mesh, jnp.asarray(q), jnp.asarray(k),
                              jnp.asarray(v), scale)
        )

        # dense reference
        G = Hq // Hkv
        kf = np.repeat(k, G, axis=1)
        vf = np.repeat(v, G, axis=1)
        s = np.einsum("qhd,khd->hqk", q, kf) * scale
        mask = np.tril(np.ones((T, T), bool))
        s = np.where(mask[None], s, -np.inf)
        p = np.exp(s - s.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        ref = np.einsum("hqk,khd->qhd", p, vf)
        np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)

    def test_long_sequence_many_blocks(self):
        import jax.numpy as jnp
        from scratchpad_tpu.ops.attention.ring import sp_ring_attention

        T, Hq, D = 256, 2, 8
        rng = np.random.default_rng(1)
        q = rng.standard_normal((T, Hq, D)).astype(np.float32)
        k = rng.standard_normal((T, Hq, D)).astype(np.float32)
        v = rng.standard_normal((T, Hq, D)).astype(np.float32)
        mesh = self._mesh()
        out = np.asarray(
            sp_ring_attention(mesh, jnp.asarray(q), jnp.asarray(k),
                              jnp.asarray(v), D**-0.5)
        )
        s = np.einsum("qhd,khd->hqk", q, k) * D**-0.5
        s = np.where(np.tril(np.ones((T, T), bool))[None], s, -np.inf)
        p = np.exp(s - s.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        ref = np.einsum("hqk,khd->qhd", p, v)
        np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


def test_gqa_backend_engine_parity():
    """attention_backend='gqa' serves end-to-end (decode v2 kernel wired
    into the runner; extend stays XLA on CPU)."""
    from scratchpad_tpu.config import ServerArgs
    from scratchpad_tpu.sampling.sampling_params import SamplingParams
    from scratchpad_tpu.server.engine import Engine

    rng = np.random.default_rng(0)
    prompts = [rng.integers(1, 500, n).tolist() for n in (9, 25, 14)]
    sp = SamplingParams(temperature=0.0, max_new_tokens=6)

    def run(backend):
        eng = Engine(
            ServerArgs(
                preset="tiny-debug",
                random_weights=True,
                dtype="float32",
                page_size=4,
                max_total_tokens=2048,
                attention_backend=backend,
            )
        )
        out = [
            o.output_ids
            for o in eng.generate(input_ids=prompts, sampling_params=[sp] * 3)
        ]
        eng.scheduler.check_memory_leak()
        return out

    assert run("gqa") == run("xla")


def _inline_vs_separate_case(seed, packed, qdtype):
    """Build an inline-scale cache AND a separate-scale cache from the SAME
    K/V rows through write_kv, plus the meta/q of make_case's geometry."""
    import dataclasses as dc

    from scratchpad_tpu.memory.kv_cache import KVCacheConfig, create_kv_cache
    from scratchpad_tpu.ops.attention.xla_backend import write_kv

    B, Hq, Hkv, D, ps, P, L = 4, 8, 2, 64, 16, 16, 2
    q, _, meta = make_case(B=B, Hq=Hq, Hkv=Hkv, D=D, ps=ps, P=P, L=L,
                           seed=seed)
    Ptot = P * B + 1
    rng = np.random.default_rng(seed + 100)
    base = dict(
        num_layers=L, num_pages=Ptot, page_size=ps, num_kv_heads=Hkv,
        head_dim=128, quantized=True, quant_dtype=qdtype, packed=packed,
    )
    kv_inline = create_kv_cache(KVCacheConfig(inline_scale=True, **base))
    kv_sep = create_kv_cache(KVCacheConfig(**base))
    T = Ptot * ps  # write every slot of every page, per layer
    loc = jnp.arange(T, dtype=jnp.int32)
    for layer in range(L):
        k_new = jnp.asarray(rng.normal(size=(T, Hkv, D)), jnp.float32)
        v_new = jnp.asarray(rng.normal(size=(T, Hkv, D)), jnp.float32)
        kv_inline = write_kv(kv_inline, k_new, v_new, jnp.int32(layer), loc)
        kv_sep = write_kv(kv_sep, k_new, v_new, jnp.int32(layer), loc)
    return q, kv_inline, kv_sep, meta


@pytest.mark.parametrize("packed", [False, True])
@pytest.mark.parametrize("qdtype", [jnp.int8, jnp.float8_e4m3fn])
@pytest.mark.parametrize("group", ["0", "4"])
def test_gqa_decode_inline_scale_matches_separate(
    packed, qdtype, group, monkeypatch
):
    """Inline-scale pools (scales as byte planes inside the kv pages, ONE
    DMA stream) must reproduce the separate-scale-pool results exactly:
    same quantizer, same codes, same bf16 scales — on both the grouped and
    per-sequence kernels, and through the XLA gather fallback."""
    from scratchpad_tpu.ops.attention.gqa_decode import decode_attention_gqa

    monkeypatch.setenv("SPTPU_GQA_GROUP", group)
    jax.clear_caches()
    try:
        q, kv_inline, kv_sep, meta = _inline_vs_separate_case(
            11, packed, qdtype
        )
        kw = dict(page_size=16, sm_scale=0.125)
        ref_sep = decode_attention_gqa(q, kv_sep, jnp.int32(1), meta, **kw)
        out_inl = decode_attention_gqa(q, kv_inline, jnp.int32(1), meta, **kw)
        np.testing.assert_allclose(
            np.asarray(out_inl), np.asarray(ref_sep), rtol=2e-5, atol=2e-5
        )
        ref_xla = decode_attention_xla(q, kv_inline, jnp.int32(1), meta, **kw)
        np.testing.assert_allclose(
            np.asarray(out_inl), np.asarray(ref_xla), rtol=2e-4, atol=2e-4
        )
    finally:
        jax.clear_caches()


def test_inline_scale_roundtrip_exact():
    """The hi/lo byte-plane encoding must round-trip bf16 scales exactly."""
    from scratchpad_tpu.memory.kv_cache import KVCacheConfig, create_kv_cache
    from scratchpad_tpu.ops.attention.xla_backend import (
        _quantize_rows,
        inline_scales_of,
        write_kv,
    )

    rng = np.random.default_rng(0)
    cfg = KVCacheConfig(
        num_layers=1, num_pages=4, page_size=8, num_kv_heads=2,
        head_dim=128, quantized=True, quant_dtype=jnp.int8,
        inline_scale=True,
    )
    kv = create_kv_cache(cfg)
    T = 32
    k_new = jnp.asarray(rng.normal(size=(T, 2, 128)) * 7.3, jnp.float32)
    v_new = jnp.asarray(rng.normal(size=(T, 2, 128)) * 0.02, jnp.float32)
    kv = write_kv(kv, k_new, v_new, jnp.int32(0), jnp.arange(T))
    rows = kv.kv.reshape(4 * 8, -1)[:T]
    got = np.asarray(inline_scales_of(rows, 4))
    upd = jnp.stack([k_new, v_new], axis=2).reshape(T, 4, 128)
    _, sc_true = _quantize_rows(upd, jnp.int8)
    np.testing.assert_array_equal(
        got, np.asarray(sc_true, np.float32)
    )


def test_gqa_decode_v2_int8_kv_matches_xla():
    """INT8 paged KV with per-(token, head) scales: the kernel folds the
    scales into the score matrices post-dot; must match the XLA backend's
    dequant-then-attend within f32 tolerance."""
    from scratchpad_tpu.ops.attention.gqa_decode import decode_attention_gqa
    from scratchpad_tpu.ops.attention.xla_backend import _quantize_rows

    q, kv, meta = make_case(seed=3)
    Pg, ps, H2, Dp = kv.kv.shape
    flat = kv.kv.reshape(Pg * ps, H2, Dp)
    qvals, sc = _quantize_rows(flat, jnp.int8)
    kv_q = KVCache(
        kv=qvals.reshape(Pg, ps, H2, Dp),
        scale=sc.reshape(Pg, ps, H2),
        num_layers=kv.num_layers,
    )
    kw = dict(page_size=16, sm_scale=0.125)
    ref = decode_attention_xla(q, kv_q, jnp.int32(1), meta, **kw)
    out = decode_attention_gqa(q, kv_q, jnp.int32(1), meta, **kw)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
    )


def test_gqa_decode_v2_int8_kv_bf16_tolerance():
    """Quantized decode in bf16 (the TPU serving dtype): the kernel rounds
    p*scale_v to bf16 before the PV matmul (deliberate MXU-speed tradeoff,
    see gqa_decode.py), so the output is NOT bit-identical to the f32
    dequant reference — assert it stays within bf16-roundoff tolerance."""
    from scratchpad_tpu.ops.attention.gqa_decode import decode_attention_gqa
    from scratchpad_tpu.ops.attention.xla_backend import _quantize_rows

    q, kv, meta = make_case(seed=9)
    Pg, ps, H2, Dp = kv.kv.shape
    flat = kv.kv.reshape(Pg * ps, H2, Dp)
    qvals, sc = _quantize_rows(flat, jnp.int8)
    kv_q = KVCache(
        kv=qvals.reshape(Pg, ps, H2, Dp),
        scale=sc.reshape(Pg, ps, H2),
        num_layers=kv.num_layers,
    )
    kw = dict(page_size=16, sm_scale=0.125)
    # f32 dequant-then-attend reference (f32 query)
    ref = decode_attention_xla(q, kv_q, jnp.int32(1), meta, **kw)
    # bf16 query through the kernel: pq rounds to bf16 pre-PV
    out = decode_attention_gqa(
        q.astype(jnp.bfloat16), kv_q, jnp.int32(1), meta, **kw
    )
    # bf16 mantissa = 8 bits -> ~2^-8 relative per rounding, accumulated
    # over the online-softmax chunks; 3e-2 abs on ~N(0,1) outputs
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), rtol=3e-2, atol=3e-2
    )


def test_gqa_backend_int8_engine_parity():
    """attention_backend='gqa' + int8 KV serves end-to-end and matches the
    XLA backend with the same int8 cache."""
    from scratchpad_tpu.config import ServerArgs
    from scratchpad_tpu.sampling.sampling_params import SamplingParams
    from scratchpad_tpu.server.engine import Engine

    rng = np.random.default_rng(1)
    prompts = [rng.integers(1, 500, n).tolist() for n in (11, 23)]
    sp = SamplingParams(temperature=0.0, max_new_tokens=5)

    def run(backend):
        eng = Engine(
            ServerArgs(
                preset="tiny-debug",
                random_weights=True,
                dtype="float32",
                page_size=4,
                max_total_tokens=2048,
                kv_cache_dtype="int8",
                attention_backend=backend,
            )
        )
        out = [
            o.output_ids
            for o in eng.generate(input_ids=prompts, sampling_params=[sp] * 2)
        ]
        eng.scheduler.check_memory_leak()
        return out

    assert run("gqa") == run("xla")


def test_gqa_decode_v2_fp8_kv_matches_xla():
    """FP8-e4m3 paged KV on the gqa kernel (direct e4m3->f32 cast)."""
    from scratchpad_tpu.ops.attention.gqa_decode import decode_attention_gqa
    from scratchpad_tpu.ops.attention.xla_backend import _quantize_rows

    q, kv, meta = make_case(seed=5)
    Pg, ps, H2, Dp = kv.kv.shape
    flat = kv.kv.reshape(Pg * ps, H2, Dp)
    qvals, sc = _quantize_rows(flat, jnp.float8_e4m3fn)
    SL = max(128, H2)
    scale = np.zeros((Pg, ps, SL), np.float32)
    scale[..., :H2] = np.asarray(sc, np.float32).reshape(Pg, ps, H2)
    kv_q = KVCache(
        kv=qvals.reshape(Pg, ps, H2, Dp),
        scale=jnp.asarray(scale),
        num_layers=kv.num_layers,
    )
    kw = dict(page_size=16, sm_scale=0.125)
    ref = decode_attention_xla(q, kv_q, jnp.int32(1), meta, **kw)
    out = decode_attention_gqa(q, kv_q, jnp.int32(1), meta, **kw)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
    )


def _make_extend_case(B=3, Hq=8, Hkv=2, D=64, ps=16, P=8, L=2, seed=7,
                      qdtype=jnp.int8):
    """Quantized cache + a ragged extend batch whose new tokens are already
    written (write-before-attend), as the runner guarantees."""
    from scratchpad_tpu.ops.attention.xla_backend import _quantize_rows

    rng = np.random.default_rng(seed)
    Ptot = P * B + 1
    Dp = padded_head_dim(D)
    kv_f = rng.normal(size=(L * Ptot, ps, 2 * Hkv, Dp)).astype(np.float32)
    kv_f[..., D:] = 0.0  # padded lanes
    qvals, sc = _quantize_rows(jnp.asarray(kv_f.reshape(-1, 2 * Hkv, Dp)), qdtype)
    SL = max(128, 2 * Hkv)
    scale = np.zeros((L * Ptot, ps, SL), np.float32)
    scale[..., : 2 * Hkv] = np.asarray(sc, np.float32).reshape(
        L * Ptot, ps, 2 * Hkv
    )
    cache = KVCache(
        kv=qvals.reshape(L * Ptot, ps, 2 * Hkv, Dp),
        scale=jnp.asarray(scale),
        num_layers=L,
    )
    seq_lens = rng.integers(4, P * ps, B).astype(np.int32)
    extend_lens = np.minimum(rng.integers(1, 12, B), seq_lens).astype(np.int32)
    pt = np.zeros((B, P), np.int32)
    nxt = 1
    for b in range(B):
        for p in range(-(-int(seq_lens[b]) // ps)):
            pt[b, p] = nxt
            nxt += 1
    T = int(extend_lens.sum())
    q = jnp.asarray(rng.normal(size=(T, Hq, D)), jnp.float32)
    req_indices = np.repeat(np.arange(B, dtype=np.int32), extend_lens)
    starts = np.concatenate([[0], np.cumsum(extend_lens)[:-1]])
    intra = np.arange(T, dtype=np.int32) - starts[req_indices]
    positions = seq_lens[req_indices] - extend_lens[req_indices] + intra
    meta = ForwardMeta(
        mode=ForwardMode.EXTEND,
        tokens=jnp.zeros(T, jnp.int32),
        positions=jnp.asarray(positions.astype(np.int32)),
        out_cache_loc=jnp.zeros(T, jnp.int32),
        req_indices=jnp.asarray(req_indices),
        page_table=jnp.asarray(pt),
        seq_lens=jnp.asarray(seq_lens),
        extend_lens=jnp.asarray(extend_lens),
        last_token_idx=jnp.asarray(np.cumsum(extend_lens) - 1),
    )
    return q, cache, meta


@pytest.mark.parametrize("qdtype", [jnp.int8, jnp.float8_e4m3fn])
def test_quant_extend_dequant_pages_matches_xla(qdtype):
    """Quantized-KV extend path: dequant_pages + the bundled ragged kernel's
    reference impl must match the XLA gather backend on the same cache.
    (On TPU the Mosaic kernel consumes the identical operands — see
    ragged_backend.attention_ragged_quant.)"""
    from jax.experimental.pallas.ops.tpu.ragged_paged_attention import (
        ref_ragged_paged_attention,
    )
    from scratchpad_tpu.ops.attention.ragged_backend import dequant_pages
    from scratchpad_tpu.ops.attention.xla_backend import extend_attention_xla

    q, kv, meta = _make_extend_case(qdtype=qdtype)
    T, Hq, D = q.shape
    kw = dict(page_size=16, sm_scale=0.125)
    ref = extend_attention_xla(q, kv, jnp.int32(1), meta, **kw)

    scratch, new_pt = dequant_pages(kv, jnp.int32(1), meta.page_table, q.dtype)
    Dp = scratch.shape[-1]
    qp = jnp.pad(q, [(0, 0), (0, 0), (0, Dp - D)]) if Dp != D else q
    cu = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(meta.extend_lens).astype(jnp.int32)]
    )
    out = ref_ragged_paged_attention(
        (qp.astype(jnp.float32) * 0.125).astype(qp.dtype),
        scratch,
        meta.seq_lens.astype(jnp.int32),
        new_pt,
        cu,
        jnp.asarray([meta.seq_lens.shape[0]], jnp.int32),
        sm_scale=1.0,
    )[..., :D]
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
    )


# ---------------- dynamic-mask decode (per-layer windows / sinks / chunks)


@pytest.mark.parametrize("W", [48, 17, 1 << 30])
def test_gqa_decode_v2_dynamic_window_matches_xla(W):
    """Traced per-layer window (Gemma/GPT-OSS layer scan): equals the XLA
    backend's static-window mask, including the >= 2^30 'global' sentinel
    and windows that skip whole leading KV chunks."""
    from scratchpad_tpu.ops.attention.gqa_decode import decode_attention_gqa

    q, kv, meta = make_case(seed=4, P=24)
    kw = dict(page_size=16, sm_scale=0.125)
    ref = decode_attention_xla(
        q, kv, jnp.int32(1), meta,
        sliding_window=W if W < (1 << 29) else None, **kw
    )
    out = decode_attention_gqa(
        q, kv, jnp.int32(1), meta, sliding_window=jnp.int32(W), **kw
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_gqa_decode_v2_dynamic_window_under_scan():
    """The serving shape: window values scanned over layers (one traced
    scalar per step), all layers sharing one compiled kernel."""
    from scratchpad_tpu.ops.attention.gqa_decode import decode_attention_gqa

    q, kv, meta = make_case(seed=5)
    kw = dict(page_size=16, sm_scale=0.125)
    windows = jnp.asarray([13, 1 << 30], jnp.int32)

    def step(_, lw):
        lidx, w = lw
        return None, decode_attention_gqa(
            q, kv, lidx, meta, sliding_window=w, **kw
        )

    _, outs = jax.lax.scan(
        step, None, (jnp.arange(2, dtype=jnp.int32), windows)
    )
    for l, w in ((0, 13), (1, None)):
        ref = decode_attention_xla(
            q, kv, jnp.int32(l), meta, sliding_window=w, **kw
        )
        np.testing.assert_allclose(
            np.asarray(outs[l]), np.asarray(ref), rtol=2e-5, atol=2e-5
        )


def test_gqa_decode_v2_sinks_matches_xla():
    """Attention sinks (GPT-OSS): learned per-head logits join the softmax
    denominator in-kernel."""
    from scratchpad_tpu.ops.attention.gqa_decode import decode_attention_gqa

    rng = np.random.default_rng(11)
    q, kv, meta = make_case(seed=6)
    Hq = q.shape[1]
    sinks = jnp.asarray(rng.normal(size=(Hq,)), jnp.float32)
    kw = dict(page_size=16, sm_scale=0.125)
    ref = decode_attention_xla(q, kv, jnp.int32(0), meta, sinks=sinks, **kw)
    out = decode_attention_gqa(q, kv, jnp.int32(0), meta, sinks=sinks, **kw)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_gqa_decode_v2_sinks_dynamic_window():
    """GPT-OSS serving shape: sinks + traced sliding window together."""
    from scratchpad_tpu.ops.attention.gqa_decode import decode_attention_gqa

    rng = np.random.default_rng(12)
    q, kv, meta = make_case(seed=7, P=24)
    Hq = q.shape[1]
    sinks = jnp.asarray(rng.normal(size=(Hq,)), jnp.float32)
    kw = dict(page_size=16, sm_scale=0.125)
    ref = decode_attention_xla(
        q, kv, jnp.int32(1), meta, sinks=sinks, sliding_window=32, **kw
    )
    out = decode_attention_gqa(
        q, kv, jnp.int32(1), meta, sinks=sinks,
        sliding_window=jnp.int32(32), **kw
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_gqa_decode_v2_sinks_padding_rows():
    from scratchpad_tpu.ops.attention.gqa_decode import decode_attention_gqa

    q, kv, meta = make_case(B=4, seed=8)
    seq = np.asarray(meta.seq_lens).copy()
    seq[2:] = 0
    meta = dataclasses.replace(meta, seq_lens=jnp.asarray(seq))
    sinks = jnp.ones((q.shape[1],), jnp.float32)
    out = decode_attention_gqa(
        q, kv, jnp.int32(0), meta, page_size=16, sm_scale=0.125, sinks=sinks
    )
    a = np.asarray(out)
    assert np.isfinite(a).all()
    assert np.abs(a[2:]).max() == 0.0


def test_gqa_decode_v2_chunked_matches_xla():
    """Llama-4 chunked attention: only the chunk holding the query."""
    from scratchpad_tpu.ops.attention.gqa_decode import decode_attention_gqa

    q, kv, meta = make_case(seed=9, P=24)
    kw = dict(page_size=16, sm_scale=0.125, chunk_size=48)
    ref = decode_attention_xla(q, kv, jnp.int32(1), meta, **kw)
    out = decode_attention_gqa(q, kv, jnp.int32(1), meta, **kw)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_gqa_decode_v2_dynamic_window_int8_kv():
    """Dynamic window + quantized KV compose (Gemma with int8 cache)."""
    from scratchpad_tpu.ops.attention.gqa_decode import decode_attention_gqa
    from scratchpad_tpu.ops.attention.xla_backend import _quantize_rows

    q, kv, meta = make_case(seed=10, P=24)
    Pg, ps, H2, Dp = kv.kv.shape
    flat = kv.kv.reshape(Pg * ps, H2, Dp)
    qvals, sc = _quantize_rows(flat, jnp.int8)
    kv_q = KVCache(
        kv=qvals.reshape(Pg, ps, H2, Dp),
        scale=sc.reshape(Pg, ps, H2),
        num_layers=kv.num_layers,
    )
    kw = dict(page_size=16, sm_scale=0.125)
    ref = decode_attention_xla(
        q, kv_q, jnp.int32(1), meta, sliding_window=40, **kw
    )
    out = decode_attention_gqa(
        q, kv_q, jnp.int32(1), meta, sliding_window=jnp.int32(40), **kw
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
    )


def test_gqa_decode_v2_sinks_window_int8_kv():
    """GPT-OSS with a quantized cache: sinks + traced window + int8 pages
    compose in one kernel call."""
    from scratchpad_tpu.ops.attention.gqa_decode import decode_attention_gqa
    from scratchpad_tpu.ops.attention.xla_backend import _quantize_rows

    rng = np.random.default_rng(13)
    q, kv, meta = make_case(seed=14, P=24)
    Pg, ps, H2, Dp = kv.kv.shape
    flat = kv.kv.reshape(Pg * ps, H2, Dp)
    qvals, sc = _quantize_rows(flat, jnp.int8)
    kv_q = KVCache(
        kv=qvals.reshape(Pg, ps, H2, Dp),
        scale=sc.reshape(Pg, ps, H2),
        num_layers=kv.num_layers,
    )
    sinks = jnp.asarray(rng.normal(size=(q.shape[1],)), jnp.float32)
    kw = dict(page_size=16, sm_scale=0.125)
    ref = decode_attention_xla(
        q, kv_q, jnp.int32(1), meta, sinks=sinks, sliding_window=40, **kw
    )
    out = decode_attention_gqa(
        q, kv_q, jnp.int32(1), meta, sinks=sinks,
        sliding_window=jnp.int32(40), **kw
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
    )
