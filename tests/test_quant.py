"""W4A16 quantization tests: packing math, matmul paths, e2e engine."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from scratchpad_tpu.ops.quant import (
    QuantizedLinear,
    dequantize_w4,
    quantize_model_params,
    quantize_w4,
    slice_layer,
    w4a16_matmul_xla,
)


class TestPacking:
    def test_roundtrip_error_bound(self):
        rng = np.random.default_rng(0)
        w = rng.normal(size=(512, 256)).astype(np.float32)
        ql = quantize_w4(w, group_size=128, dtype=jnp.float32)
        deq = np.asarray(dequantize_w4(ql, jnp.float32))
        # max error <= scale/2 per group
        scales = np.asarray(ql.s)  # [G, Out]
        err = np.abs(deq - w).reshape(4, 128, 256).max(axis=1)
        assert (err <= scales / 2 + 1e-5).all()

    def test_matmul_matches_dequant(self):
        rng = np.random.default_rng(1)
        w = rng.normal(size=(256, 128)).astype(np.float32)
        x = jnp.asarray(rng.normal(size=(4, 256)), jnp.float32)
        ql = quantize_w4(w, group_size=64, dtype=jnp.float32)
        ref = x @ dequantize_w4(ql, jnp.float32)
        out = w4a16_matmul_xla(x, ql)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)

    def test_pallas_matches_xla(self):
        from scratchpad_tpu.ops.quant.pallas_w4 import w4a16_matmul_pallas

        rng = np.random.default_rng(2)
        L, In, Out = 2, 256, 256
        w = rng.normal(size=(L, In, Out)).astype(np.float32)
        from scratchpad_tpu.ops.quant import quantize_stacked

        ql = quantize_stacked(w, group_size=128, dtype=jnp.float32)
        x = jnp.asarray(rng.normal(size=(8, In)), jnp.float32)
        for l in range(L):
            ref = w4a16_matmul_xla(x, slice_layer(ql, l))
            out = w4a16_matmul_pallas(x, ql, jnp.int32(l), out_block=128)
            np.testing.assert_allclose(
                np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
            )


class TestQuantizedEngine:
    def test_e2e_generation_quality(self):
        """Quantized tiny model must generate, and its logits must stay close
        to the fp32 model's (the <=0.1 ppl-delta analogue at toy scale)."""
        from scratchpad_tpu.config import ServerArgs
        from scratchpad_tpu.sampling.sampling_params import SamplingParams
        from scratchpad_tpu.server.engine import Engine

        common = dict(
            preset="tiny-debug",
            random_weights=True,
            dtype="float32",
            page_size=4,
            max_total_tokens=2048,
        )
        p = np.random.default_rng(3).integers(1, 500, 16).tolist()
        sp = SamplingParams(temperature=0.0, max_new_tokens=8)

        ref_eng = Engine(ServerArgs(**common))
        ref = ref_eng.generate(input_ids=p, sampling_params=sp, return_logprob=True)

        q_eng = Engine(ServerArgs(quantization="w4a16", **common))
        out = q_eng.generate(input_ids=p, sampling_params=sp, return_logprob=True)

        assert len(out.output_ids) == 8
        # logprob of chosen tokens should be in the same ballpark
        a = np.asarray(ref.output_token_logprobs)
        b = np.asarray(out.output_token_logprobs)
        assert np.isfinite(b).all()
        assert np.abs(a.mean() - b.mean()) < 0.7, (a, b)

    def test_quantize_model_params_structure(self):
        from scratchpad_tpu.config.model_config import get_preset
        from scratchpad_tpu.models.llama import LlamaForCausalLM

        cfg = get_preset("tiny-debug")
        model = LlamaForCausalLM(cfg)
        params = model.init_params(jax.random.PRNGKey(0), jnp.float32)
        qp = quantize_model_params(params)
        assert "wq" not in qp["layers"] and "down" not in qp["layers"]
        assert set(qp["layers_q"]) == {
            "wq", "wk", "wv", "wo", "gate", "up", "down"
        }
        ql = qp["layers_q"]["down"]
        assert ql.q.dtype == jnp.uint8
        # packed size is half the rows
        assert ql.q.shape[-2] == cfg.intermediate_size // 2


class TestInt8KV:
    def test_int8_kv_engine_quality(self):
        """INT8 KV with per-row scales: close logprobs, correct lengths."""
        from scratchpad_tpu.config import ServerArgs
        from scratchpad_tpu.sampling.sampling_params import SamplingParams
        from scratchpad_tpu.server.engine import Engine

        common = dict(
            preset="tiny-debug",
            random_weights=True,
            dtype="float32",
            page_size=4,
            max_total_tokens=2048,
        )
        p = np.random.default_rng(7).integers(1, 500, 24).tolist()
        sp = SamplingParams(temperature=0.0, max_new_tokens=8)

        ref = Engine(ServerArgs(**common)).generate(
            input_ids=p, sampling_params=sp, return_logprob=True
        )
        out = Engine(ServerArgs(kv_cache_dtype="int8", **common)).generate(
            input_ids=p, sampling_params=sp, return_logprob=True
        )
        assert len(out.output_ids) == 8
        a = np.asarray(ref.output_token_logprobs)
        b = np.asarray(out.output_token_logprobs)
        assert np.isfinite(b).all()
        assert abs(a.mean() - b.mean()) < 0.5, (a, b)


class TestFp8:
    def test_fp8_engine_quality(self):
        from scratchpad_tpu.config import ServerArgs
        from scratchpad_tpu.sampling.sampling_params import SamplingParams
        from scratchpad_tpu.server.engine import Engine

        common = dict(
            preset="tiny-debug",
            random_weights=True,
            dtype="float32",
            page_size=4,
            max_total_tokens=2048,
        )
        p = np.random.default_rng(9).integers(1, 500, 20).tolist()
        sp = SamplingParams(temperature=0.0, max_new_tokens=8)
        ref = Engine(ServerArgs(**common)).generate(
            input_ids=p, sampling_params=sp, return_logprob=True
        )
        out = Engine(ServerArgs(quantization="fp8", **common)).generate(
            input_ids=p, sampling_params=sp, return_logprob=True
        )
        assert len(out.output_ids) == 8
        a = np.asarray(ref.output_token_logprobs)
        b = np.asarray(out.output_token_logprobs)
        assert np.isfinite(b).all()
        # fp8 should track fp32 much tighter than w4
        assert abs(a.mean() - b.mean()) < 0.3, (a, b)

    def test_fp8_roundtrip(self):
        from scratchpad_tpu.ops.quant.fp8 import quantize_fp8_stacked

        rng = np.random.default_rng(4)
        w = rng.normal(size=(2, 64, 32)).astype(np.float32)
        fl = quantize_fp8_stacked(w)
        deq = np.asarray(fl.w8.astype(jnp.float32)) * np.asarray(fl.s)[:, None, :]
        rel = np.abs(deq - w).max() / np.abs(w).max()
        assert rel < 0.08  # e4m3 relative precision

    def test_fp8_kv_engine_quality(self):
        from scratchpad_tpu.config import ServerArgs
        from scratchpad_tpu.sampling.sampling_params import SamplingParams
        from scratchpad_tpu.server.engine import Engine

        common = dict(
            preset="tiny-debug",
            random_weights=True,
            dtype="float32",
            page_size=4,
            max_total_tokens=2048,
        )
        p = np.random.default_rng(13).integers(1, 500, 24).tolist()
        sp = SamplingParams(temperature=0.0, max_new_tokens=8)
        ref = Engine(ServerArgs(**common)).generate(
            input_ids=p, sampling_params=sp, return_logprob=True
        )
        out = Engine(ServerArgs(kv_cache_dtype="fp8", **common)).generate(
            input_ids=p, sampling_params=sp, return_logprob=True
        )
        a = np.asarray(ref.output_token_logprobs)
        b = np.asarray(out.output_token_logprobs)
        assert np.isfinite(b).all()
        assert abs(a.mean() - b.mean()) < 0.4, (a, b)
