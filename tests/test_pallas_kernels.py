"""Pallas kernels vs XLA reference backend (interpret mode on CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from scratchpad_tpu.executor.forward_meta import ForwardMeta, ForwardMode
from scratchpad_tpu.memory.kv_cache import KVCache
from scratchpad_tpu.ops.attention.pallas_decode import decode_attention_pallas
from scratchpad_tpu.ops.attention.xla_backend import decode_attention_xla


def make_case(B=4, Hq=8, Hkv=2, D=64, ps=16, P=16, L=2, seed=0, dtype=jnp.float32):
    from scratchpad_tpu.memory.kv_cache import padded_head_dim

    rng = np.random.default_rng(seed)
    S = (P * B + 1) * ps  # enough distinct pages
    Dp = padded_head_dim(D)
    q = jnp.asarray(rng.normal(size=(B, Hq, D)), dtype)
    # cache head_dim is lane-padded; padded region content is irrelevant
    k = jnp.asarray(rng.normal(size=(Hkv, L, S, Dp)), dtype)
    v = jnp.asarray(rng.normal(size=(Hkv, L, S, Dp)), dtype)
    # distinct pages per request; page 0 reserved
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
    return q, KVCache(k=k, v=v), meta


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
    import dataclasses

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
    """Head group h of q must attend to kv head h//G (layout contract)."""
    B, Hq, Hkv, D, ps, P, L = 1, 4, 2, 64, 16, 8, 1
    S = 64 * ps
    # k/v distinct per head: head 0 KV = 1s, head 1 KV = 2s (values v likewise)
    from scratchpad_tpu.memory.kv_cache import padded_head_dim

    Dp = padded_head_dim(D)
    k = jnp.ones((Hkv, L, S, Dp), jnp.float32)
    v = jnp.concatenate(
        [jnp.full((1, L, S, Dp), 5.0), jnp.full((1, L, S, Dp), 7.0)], axis=0
    )
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
        decode_attention_pallas(q, KVCache(k=k, v=v), jnp.int32(0), meta, page_size=ps, sm_scale=0.125)
    )
    # uniform attention -> output equals the v constant of the right kv head
    np.testing.assert_allclose(out[0, 0], 5.0, rtol=1e-6)
    np.testing.assert_allclose(out[0, 1], 5.0, rtol=1e-6)
    np.testing.assert_allclose(out[0, 2], 7.0, rtol=1e-6)
    np.testing.assert_allclose(out[0, 3], 7.0, rtol=1e-6)
