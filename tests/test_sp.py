"""Sequence-parallel ring prefill: full model stack vs single-device extend."""

import numpy as np
import pytest

from scratchpad_tpu.config.model_config import ModelConfig
from scratchpad_tpu.executor.forward_meta import ForwardMeta, ForwardMode
from scratchpad_tpu.memory.kv_cache import KVCacheConfig, create_kv_cache


def tiny_cfg():
    return ModelConfig(
        architecture="LlamaForCausalLM",
        vocab_size=256,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        max_position_embeddings=512,
    )


def fresh_meta(T, ps, num_pages):
    pages = np.arange(1, T // ps + 1, dtype=np.int32)  # page 0 = dump
    loc = (pages[np.arange(T) // ps] * ps + np.arange(T) % ps).astype(np.int32)
    return ForwardMeta(
        mode=ForwardMode.EXTEND,
        tokens=None,  # filled by caller
        positions=np.arange(T, dtype=np.int32),
        out_cache_loc=loc,
        req_indices=np.zeros(T, np.int32),
        page_table=np.concatenate([pages, np.zeros(2, np.int32)])[None, :],
        seq_lens=np.array([T], np.int32),
        extend_lens=np.array([T], np.int32),
        last_token_idx=np.array([T - 1], np.int32),
    )


def test_sp_prefill_matches_single_device():
    import dataclasses

    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from scratchpad_tpu.models.llama import LlamaForCausalLM
    from scratchpad_tpu.parallel import sp_prefill

    cfg = tiny_cfg()
    model = LlamaForCausalLM(cfg)
    model.page_size = 8
    params = model.init_params(jax.random.PRNGKey(0), jnp.float32)

    T, ps = 64, 8
    kvc = KVCacheConfig(
        num_layers=cfg.num_hidden_layers,
        num_pages=T // ps + 2,
        page_size=ps,
        num_kv_heads=cfg.num_kv_heads,
        head_dim=cfg.head_dim,
        dtype=jnp.float32,
    )
    rng = np.random.default_rng(0)
    tokens = rng.integers(1, 256, T).astype(np.int32)
    meta = dataclasses.replace(fresh_meta(T, ps, kvc.num_pages), tokens=tokens)

    # single-device reference
    kv_ref, logits_ref = jax.jit(model)(params, create_kv_cache(kvc), meta)

    # sequence-parallel over an 8-device cpu mesh
    mesh = Mesh(np.array(jax.devices("cpu")[:8]), ("sp",))
    kv_sp, logits_sp = sp_prefill(model, params, create_kv_cache(kvc), meta, mesh)

    np.testing.assert_allclose(
        np.asarray(logits_sp), np.asarray(logits_ref), atol=3e-4, rtol=1e-3
    )
    # the paged cache must be identical: decode continues from these pages
    np.testing.assert_allclose(
        np.asarray(kv_sp.kv), np.asarray(kv_ref.kv), atol=3e-5, rtol=1e-4
    )


def test_sp_prefill_under_jit():
    """The whole sp step (shard_map inside jit) must compile as one unit."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from scratchpad_tpu.models.llama import LlamaForCausalLM
    from scratchpad_tpu.parallel import make_sp_extend_attention

    cfg = tiny_cfg()
    model = LlamaForCausalLM(cfg)
    model.page_size = 8
    params = model.init_params(jax.random.PRNGKey(1), jnp.float32)
    mesh = Mesh(np.array(jax.devices("cpu")[:8]), ("sp",))
    model.extend_attention = make_sp_extend_attention(mesh)

    T, ps = 128, 8
    kvc = KVCacheConfig(
        num_layers=cfg.num_hidden_layers,
        num_pages=T // ps + 2,
        page_size=ps,
        num_kv_heads=cfg.num_kv_heads,
        head_dim=cfg.head_dim,
        dtype=jnp.float32,
    )
    rng = np.random.default_rng(2)
    tokens = rng.integers(1, 256, T).astype(np.int32)
    meta = dataclasses.replace(fresh_meta(T, ps, kvc.num_pages), tokens=tokens)
    kv, logits = jax.jit(model)(params, create_kv_cache(kvc), meta)
    assert np.asarray(logits).shape == (1, cfg.vocab_size)
    assert np.isfinite(np.asarray(logits)).all()
