"""Sequence-parallel ring prefill: full model stack vs single-device extend."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

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


class TestSpServing:
    """Serving-loop SP autodispatch: fresh long prompts prefill unchunked
    through ring attention on an sp mesh, matching the chunked single-device
    engine token-for-token."""

    def _engine(self, mesh=None, **kw):
        from scratchpad_tpu.config import ServerArgs
        from scratchpad_tpu.server.engine import Engine

        args = ServerArgs(
            preset="tiny-debug",
            random_weights=True,
            dtype="float32",
            page_size=4,
            max_total_tokens=4096,
            chunked_prefill_size=64,
            max_prefill_tokens=256,
            **kw,
        )
        return Engine(args, mesh=mesh)

    def _mesh(self):
        import jax
        from jax.sharding import Mesh

        devs = jax.devices()
        if len(devs) < 4:
            pytest.skip("needs 4 devices")
        return Mesh(np.array(devs[:4]), ("sp",))

    def test_sp_serving_matches_single_device(self):
        from scratchpad_tpu.sampling.sampling_params import SamplingParams

        rng = np.random.default_rng(7)
        # one long fresh prompt (> chunked_prefill_size) + two short ones
        prompts = [
            rng.integers(1, 500, 200).tolist(),
            rng.integers(1, 500, 24).tolist(),
            rng.integers(1, 500, 180).tolist(),
        ]
        sp = SamplingParams(temperature=0.0, max_new_tokens=6)
        ref = [
            o.output_ids
            for o in self._engine().generate(
                input_ids=prompts, sampling_params=[sp] * 3
            )
        ]
        eng = self._engine(mesh=self._mesh(), enable_sp_prefill=True)
        assert eng.scheduler.runner.sp_prefill_tokens >= 256
        got = [
            o.output_ids
            for o in eng.generate(input_ids=prompts, sampling_params=[sp] * 3)
        ]
        assert got == ref
        eng.scheduler.check_memory_leak()

    def test_sp_prefix_hit_stays_correct(self):
        """A prompt with a cached radix prefix rides the ring with a
        replicated prefix block (round-2 widening); outputs must match the
        fresh run token-for-token."""
        from scratchpad_tpu.sampling.sampling_params import SamplingParams

        rng = np.random.default_rng(8)
        long_prompt = rng.integers(1, 500, 160).tolist()
        sp = SamplingParams(temperature=0.0, max_new_tokens=4)
        eng = self._engine(mesh=self._mesh(), enable_sp_prefill=True)
        first = eng.generate(input_ids=[long_prompt], sampling_params=[sp])
        # same prompt again: radix prefix hit -> chunked path
        second = eng.generate(input_ids=[long_prompt], sampling_params=[sp])
        assert first[0].output_ids == second[0].output_ids
        eng.scheduler.check_memory_leak()


class TestRingWidened:
    """Round-2 ring widening: multi-request block-diagonal masks, cached
    prefix block, softcap, sliding window — vs a dense masked reference."""

    def _dense_ref(self, q, k, v, mask, scale, cap=None):
        import jax.numpy as jnp

        G = q.shape[1] // k.shape[1]
        kf = np.repeat(k, G, axis=1).astype(np.float32)
        vf = np.repeat(v, G, axis=1).astype(np.float32)
        s = np.einsum("qhd,khd->qhk", q.astype(np.float32) * scale, kf)
        if cap:
            s = cap * np.tanh(s / cap)
        s = np.where(mask[:, None, :], s, -1e30)
        p = np.exp(s - s.max(-1, keepdims=True))
        p = np.where(mask[:, None, :], p, 0.0)
        p /= np.maximum(p.sum(-1, keepdims=True), 1e-30)
        return np.einsum("qhk,khd->qhd", p, vf)

    def _mesh(self, n=4):
        import jax
        from jax.sharding import Mesh

        devs = jax.devices()
        if len(devs) < n:
            pytest.skip(f"needs {n} devices")
        return Mesh(np.array(devs[:n]), ("sp",))

    def test_multi_request_block_diagonal(self):
        import jax.numpy as jnp
        from scratchpad_tpu.ops.attention.ring import sp_ring_attention

        rng = np.random.default_rng(3)
        T, Hq, Hkv, D = 32, 4, 2, 16
        q = rng.standard_normal((T, Hq, D), np.float32)
        k = rng.standard_normal((T, Hkv, D), np.float32)
        v = rng.standard_normal((T, Hkv, D), np.float32)
        # two packed fresh requests: 20 + 12 tokens
        req = np.array([0] * 20 + [1] * 12, np.int32)
        pos = np.array(list(range(20)) + list(range(12)), np.int32)
        got = sp_ring_attention(
            self._mesh(), jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            0.25, positions=jnp.asarray(pos), req_ids=jnp.asarray(req),
        )
        mask = (req[None, :] == req[:, None]) & (pos[None, :] <= pos[:, None])
        want = self._dense_ref(q, k, v, mask, 0.25)
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=1e-4)

    def test_prefix_block(self):
        import jax.numpy as jnp
        from scratchpad_tpu.ops.attention.ring import sp_ring_attention

        rng = np.random.default_rng(4)
        T, C, Cp, Hq, Hkv, D = 16, 11, 16, 4, 2, 16
        q = rng.standard_normal((T, Hq, D), np.float32)
        k = rng.standard_normal((T, Hkv, D), np.float32)
        v = rng.standard_normal((T, Hkv, D), np.float32)
        kp = rng.standard_normal((Cp, Hkv, D), np.float32)  # rows >= C = pad
        vp = rng.standard_normal((Cp, Hkv, D), np.float32)
        pos = np.arange(C, C + T, dtype=np.int32)
        got = sp_ring_attention(
            self._mesh(), jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            0.25, positions=jnp.asarray(pos),
            prefix_k=jnp.asarray(kp), prefix_v=jnp.asarray(vp),
            prefix_len=jnp.asarray(C, jnp.int32),
        )
        # dense reference over [valid prefix | new tokens]
        kall = np.concatenate([kp[:C], k], 0)
        vall = np.concatenate([vp[:C], v], 0)
        call_pos = np.concatenate([np.arange(C), pos])
        mask = call_pos[None, :] <= pos[:, None]
        want = self._dense_ref(q, kall, vall, mask, 0.25)
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=1e-4)

    def test_softcap_and_sliding_window(self):
        import jax.numpy as jnp
        from scratchpad_tpu.ops.attention.ring import sp_ring_attention

        rng = np.random.default_rng(5)
        T, Hq, Hkv, D, W = 32, 4, 2, 16, 9
        q = rng.standard_normal((T, Hq, D), np.float32)
        k = rng.standard_normal((T, Hkv, D), np.float32)
        v = rng.standard_normal((T, Hkv, D), np.float32)
        pos = np.arange(T, dtype=np.int32)
        got = sp_ring_attention(
            self._mesh(), jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            0.25, logit_cap=30.0, sliding_window=W,
        )
        mask = (pos[None, :] <= pos[:, None]) & (
            pos[:, None] - pos[None, :] < W
        )
        want = self._dense_ref(q, k, v, mask, 0.25, cap=30.0)
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=1e-4)


class TestSpServingWidened:
    """Serving: cached-prefix and Gemma-window prompts now ride sp."""

    def _engine(self, mesh=None, **kw):
        from scratchpad_tpu.config import ServerArgs
        from scratchpad_tpu.server.engine import Engine

        args = ServerArgs(
            preset="tiny-debug",
            random_weights=True,
            dtype="float32",
            page_size=4,
            max_total_tokens=4096,
            chunked_prefill_size=64,
            max_prefill_tokens=256,
            **kw,
        )
        return Engine(args, mesh=mesh)

    def _mesh(self, n=4):
        import jax
        from jax.sharding import Mesh

        devs = jax.devices()
        if len(devs) < n:
            pytest.skip(f"needs {n} devices")
        return Mesh(np.array(devs[:n]), ("sp",))

    def test_prefix_extension_rides_sp_and_matches(self):
        """Prompt B = cached prefix A + long fresh tail: the tail extend
        goes through the ring with the replicated prefix block and must
        match the single-device engine."""
        from scratchpad_tpu.sampling.sampling_params import SamplingParams

        rng = np.random.default_rng(9)
        prefix = rng.integers(1, 500, 96).tolist()
        full = prefix + rng.integers(1, 500, 120).tolist()
        sp = SamplingParams(temperature=0.0, max_new_tokens=5)

        ref_eng = self._engine()
        ref_eng.generate(input_ids=[prefix], sampling_params=[sp])
        ref = ref_eng.generate(input_ids=[full], sampling_params=[sp])

        eng = self._engine(mesh=self._mesh(), enable_sp_prefill=True)
        eng.generate(input_ids=[prefix], sampling_params=[sp])  # seed radix
        before = eng.scheduler.runner.sp_prefill_tokens
        assert before > 0
        got = eng.generate(input_ids=[full], sampling_params=[sp])
        assert got[0].output_ids == ref[0].output_ids
        assert got[0].cached_tokens > 0  # the prefix really was cached
        eng.scheduler.check_memory_leak()

    def test_two_fresh_long_prompts_one_sp_batch(self):
        from scratchpad_tpu.sampling.sampling_params import SamplingParams

        rng = np.random.default_rng(10)
        prompts = [
            rng.integers(1, 500, 150).tolist(),
            rng.integers(1, 500, 100).tolist(),
        ]
        sp = SamplingParams(temperature=0.0, max_new_tokens=5)
        ref = [
            o.output_ids
            for o in self._engine().generate(
                input_ids=prompts, sampling_params=[sp, sp]
            )
        ]
        eng = self._engine(mesh=self._mesh(), enable_sp_prefill=True)
        got = [
            o.output_ids
            for o in eng.generate(input_ids=prompts, sampling_params=[sp, sp])
        ]
        assert got == ref
        eng.scheduler.check_memory_leak()


def test_sp_serving_sliding_window_model():
    """Gemma-style windowed model rides sp prefill and matches the
    single-device engine (the ring applies the window in-mask)."""
    import jax
    from jax.sharding import Mesh

    from scratchpad_tpu.config import ServerArgs
    from scratchpad_tpu.config.model_config import get_preset
    from scratchpad_tpu.server.engine import Engine
    from scratchpad_tpu.sampling.sampling_params import SamplingParams

    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs 4 devices")
    cfg = get_preset(
        "tiny-debug", dtype="float32", sliding_window=48,
        attn_logit_softcap=30.0,
    )

    def make(mesh=None, **kw):
        args = ServerArgs(
            preset="tiny-debug",
            random_weights=True,
            dtype="float32",
            page_size=4,
            max_total_tokens=4096,
            chunked_prefill_size=64,
            max_prefill_tokens=256,
            **kw,
        )
        return Engine(args, mesh=mesh, model_config=get_preset(
            "tiny-debug", dtype="float32", sliding_window=48,
            attn_logit_softcap=30.0,
        ))

    rng = np.random.default_rng(11)
    prompt = rng.integers(1, 500, 170).tolist()
    sp = SamplingParams(temperature=0.0, max_new_tokens=5)
    ref = make().generate(input_ids=[prompt], sampling_params=[sp])
    eng = make(
        mesh=Mesh(np.array(devs[:4]), ("sp",)), enable_sp_prefill=True
    )
    assert eng.scheduler.runner.sp_prefill_tokens > 0  # gate now allows it
    got = eng.generate(input_ids=[prompt], sampling_params=[sp])
    assert got[0].output_ids == ref[0].output_ids
    eng.scheduler.check_memory_leak()
