"""W4A8 tests: int8-activation matmul paths + e2e engine.

W4A8 reuses W4A16's QuantizedLinear storage (checkpoint-compatible); only
the matmul swaps to per-token int8 activations with i32 group dots on the
s8 MXU (ops/quant/pallas_w4.py _w4a8_kernel). Reference analogue: triteia's
quantized GEMM (scratchpad/nn/layers/linear.py:24) — activation quant is a
TPU-side extension (the reference has no A8 path).
"""

import numpy as np
import jax
import jax.numpy as jnp

from scratchpad_tpu.ops.quant import (
    dequantize_w4,
    quantize_w4,
    quantize_stacked,
    slice_layer,
    w4a8_matmul_xla,
)


class TestW4A8Matmul:
    def test_xla_close_to_dequant_reference(self):
        rng = np.random.default_rng(0)
        w = rng.normal(size=(256, 128)).astype(np.float32)
        x = jnp.asarray(rng.normal(size=(4, 256)), jnp.float32)
        ql = quantize_w4(w, group_size=64, dtype=jnp.float32)
        ref = np.asarray(x @ dequantize_w4(ql, jnp.float32))
        out = np.asarray(w4a8_matmul_xla(x, ql))
        # int8 activation quantization: ~1% relative error budget
        scale = np.abs(ref).max()
        assert np.abs(out - ref).max() / scale < 0.02

    def test_zero_rows_are_safe(self):
        """Padding rows are all-zero; the amax guard must not produce NaN."""
        rng = np.random.default_rng(1)
        w = rng.normal(size=(128, 128)).astype(np.float32)
        ql = quantize_w4(w, group_size=64, dtype=jnp.float32)
        x = jnp.zeros((4, 128), jnp.float32)
        out = np.asarray(w4a8_matmul_xla(x, ql))
        assert np.isfinite(out).all() and np.abs(out).max() == 0.0

    def test_pallas_matches_xla(self):
        """Interpret-mode Pallas kernel vs the jnp reference: identical int
        math, near-exact agreement."""
        from scratchpad_tpu.ops.quant.pallas_w4 import w4a8_matmul_pallas

        rng = np.random.default_rng(2)
        L, In, Out = 2, 256, 256
        w = rng.normal(size=(L, In, Out)).astype(np.float32)
        ql = quantize_stacked(w, group_size=128, dtype=jnp.float32)
        x = jnp.asarray(rng.normal(size=(8, In)), jnp.float32)
        for l in range(L):
            ref = w4a8_matmul_xla(x, slice_layer(ql, l))
            out = w4a8_matmul_pallas(x, ql, jnp.int32(l), out_block=128)
            np.testing.assert_allclose(
                np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
            )

    def test_pallas_reduced_group_size(self):
        """Non-128 group sizes (quantize_stacked clamps g to In/2 for small
        layers; GPT-OSS lands on g=120) slice the int8 x lane dim and the
        i8 plane sublane dim at non-tile-aligned offsets — stricter under
        int8's (32, 128) Mosaic granularity than the proven bf16 path
        (ADVICE r3). Interpret-mode coverage for the slicing math; the
        on-chip compile is covered by the w4a8 MoE bench variant."""
        from scratchpad_tpu.ops.quant.pallas_w4 import w4a8_matmul_pallas

        rng = np.random.default_rng(7)
        L, In, Out, g = 2, 240, 256, 120
        w = rng.normal(size=(L, In, Out)).astype(np.float32)
        ql = quantize_stacked(w, group_size=g, dtype=jnp.float32)
        assert ql.group_size == g
        x = jnp.asarray(rng.normal(size=(8, In)), jnp.float32)
        for l in range(L):
            ref = w4a8_matmul_xla(x, slice_layer(ql, l))
            out = w4a8_matmul_pallas(x, ql, jnp.int32(l), out_block=128)
            np.testing.assert_allclose(
                np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
            )

    def test_out_true_slicing(self):
        """Padded Out (out_true) slices back like the w4a16 path."""
        rng = np.random.default_rng(3)
        w = rng.normal(size=(1, 128, 200)).astype(np.float32)
        ql = quantize_stacked(w, group_size=64, dtype=jnp.float32)
        assert ql.out_true == 200
        x = jnp.asarray(rng.normal(size=(4, 128)), jnp.float32)
        out = w4a8_matmul_xla(x, slice_layer(ql, 0))
        assert out.shape == (4, 200)


class TestW4A8Engine:
    def test_e2e_generation_quality(self):
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

        ref = Engine(ServerArgs(**common)).generate(
            input_ids=p, sampling_params=sp, return_logprob=True
        )
        out = Engine(ServerArgs(quantization="w4a8", **common)).generate(
            input_ids=p, sampling_params=sp, return_logprob=True
        )
        assert len(out.output_ids) == 8
        a = np.asarray(ref.output_token_logprobs)
        b = np.asarray(out.output_token_logprobs)
        assert np.isfinite(b).all()
        assert np.abs(a.mean() - b.mean()) < 0.7, (a, b)

    def test_moe_expert_stacks(self):
        """W4A8 on a MoE model exercises the [L*E]-flattened expert-stack
        slice_layer indexing. On CPU the engine routes to w4a8_matmul_xla
        (the Pallas kernel + its prefetch index map run on-chip only; the
        kernel's own math is covered by TestW4A8Matmul interpret tests)."""
        from scratchpad_tpu.config import ServerArgs
        from scratchpad_tpu.sampling.sampling_params import SamplingParams
        from scratchpad_tpu.server.engine import Engine

        common = dict(
            preset="tiny-gpt-oss",
            random_weights=True,
            dtype="float32",
            page_size=4,
            max_total_tokens=2048,
        )
        p = np.random.default_rng(5).integers(1, 400, 12).tolist()
        sp = SamplingParams(temperature=0.0, max_new_tokens=6)
        ref = Engine(ServerArgs(**common)).generate(
            input_ids=p, sampling_params=sp, return_logprob=True
        )
        out = Engine(ServerArgs(quantization="w4a8", **common)).generate(
            input_ids=p, sampling_params=sp, return_logprob=True
        )
        assert len(out.output_ids) == 6
        b = np.asarray(out.output_token_logprobs)
        assert np.isfinite(b).all()
        a = np.asarray(ref.output_token_logprobs)
        assert np.abs(a.mean() - b.mean()) < 1.0, (a, b)


class TestFourBitNative:
    """4-bit-native storage (pallas_w4.Quantized4bit): Mosaic-direct s4
    casts replace the u8 unpack chain. Interpret-mode parity vs the u8
    kernels / XLA reference (on-chip perf is measured by bench_ab)."""

    def _ql(self, rng, L=2, In=256, Out=256, g=128):
        w = rng.normal(size=(L, In, Out)).astype(np.float32)
        return quantize_stacked(w, group_size=g, dtype=jnp.float32), w

    def test_to_4bit_roundtrip(self):
        from scratchpad_tpu.ops.quant.pallas_w4 import to_4bit

        rng = np.random.default_rng(17)
        ql, _ = self._ql(rng)
        q4 = to_4bit(ql)
        # r5: uint8 at the jit boundary — adjacent-In-row nibble pairs
        # whose in-kernel pltpu.bitcast expands to s4 rows (2r, 2r+1)
        assert q4.q4.dtype == jnp.uint8
        assert q4.q4.shape == (2, 128, 256)
        lo = np.asarray(ql.q & 0xF, np.int32)
        hi = np.asarray(ql.q >> 4, np.int32)
        full = (np.concatenate([lo, hi], axis=1) - 8) & 0xF  # s4 patterns
        expect = full[:, 0::2] | (full[:, 1::2] << 4)
        np.testing.assert_array_equal(
            np.asarray(q4.q4, np.int32), expect
        )
        np.testing.assert_allclose(
            np.asarray(q4.z), np.asarray(ql.z, np.float32) - 8.0
        )

    def test_a8_matches_u8_kernel(self):
        from scratchpad_tpu.ops.quant.pallas_w4 import to_4bit, w4_matmul_4bit

        rng = np.random.default_rng(19)
        ql, _ = self._ql(rng)
        q4 = to_4bit(ql)
        x = jnp.asarray(rng.normal(size=(8, 256)), jnp.float32)
        for l in range(2):
            ref = w4a8_matmul_xla(x, slice_layer(ql, l))
            out = w4_matmul_4bit(x, q4, jnp.int32(l), a8=True, out_block=128)
            np.testing.assert_allclose(
                np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
            )

    def test_a16_matches_dequant_reference(self):
        from scratchpad_tpu.ops.quant.pallas_w4 import to_4bit, w4_matmul_4bit

        rng = np.random.default_rng(23)
        ql, _ = self._ql(rng)
        q4 = to_4bit(ql)
        x = jnp.asarray(rng.normal(size=(8, 256)), jnp.float32)
        for l in range(2):
            ref = x @ dequantize_w4(slice_layer(ql, l), jnp.float32)
            out = w4_matmul_4bit(x, q4, jnp.int32(l), a8=False, out_block=128)
            np.testing.assert_allclose(
                np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3
            )

    def test_out_true_slices(self):
        from scratchpad_tpu.ops.quant.pallas_w4 import to_4bit, w4_matmul_4bit

        rng = np.random.default_rng(29)
        w = rng.normal(size=(1, 256, 200)).astype(np.float32)
        ql = quantize_stacked(w, group_size=128, dtype=jnp.float32)
        q4 = to_4bit(ql)
        assert q4.out_true == 200
        x = jnp.asarray(rng.normal(size=(4, 256)), jnp.float32)
        out = w4_matmul_4bit(x, q4, jnp.int32(0), a8=False, out_block=128)
        assert out.shape == (4, 200)
