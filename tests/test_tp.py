"""Tensor-parallel engine correctness on the virtual CPU mesh."""

import numpy as np
import pytest
import jax
from jax.sharding import Mesh

from scratchpad_tpu.config import ServerArgs
from scratchpad_tpu.sampling.sampling_params import SamplingParams
from scratchpad_tpu.server.engine import Engine


def make_engine(mesh=None, **kw):
    args = ServerArgs(
        preset="tiny-debug",
        random_weights=True,
        dtype="float32",
        page_size=4,
        max_total_tokens=2048,
        **kw,
    )
    return Engine(args, mesh=mesh)


def tp_mesh(tp, dp=1):
    devs = jax.devices()
    if len(devs) < tp * dp:
        pytest.skip(f"needs {tp * dp} devices")
    return Mesh(np.array(devs[: tp * dp]).reshape(dp, tp), ("dp", "tp"))


def prompts():
    rng = np.random.default_rng(0)
    return [rng.integers(1, 500, n).tolist() for n in (9, 25, 14)]


class TestTensorParallel:
    def test_tp2_matches_single_device(self):
        sp = SamplingParams(temperature=0.0, max_new_tokens=6)
        ref = [
            o.output_ids
            for o in make_engine().generate(
                input_ids=prompts(), sampling_params=[sp] * 3
            )
        ]
        eng = make_engine(mesh=tp_mesh(2))
        got = [
            o.output_ids
            for o in eng.generate(input_ids=prompts(), sampling_params=[sp] * 3)
        ]
        assert got == ref
        eng.scheduler.check_memory_leak()

    def test_dp2_tp2_runs(self):
        sp = SamplingParams(temperature=0.0, max_new_tokens=4)
        eng = make_engine(mesh=tp_mesh(2, dp=2))
        outs = eng.generate(input_ids=prompts(), sampling_params=[sp] * 3)
        assert all(len(o.output_ids) == 4 for o in outs)

    def test_tp2_ragged_backend_matches(self):
        """shard_map-wrapped ragged attention == single-device XLA backend.

        On CPU the wrapper's body runs the jittable dense equivalent of the
        ragged kernel, so this validates the TP wiring (head sharding,
        replicated paging metadata) end-to-end on the virtual mesh.
        """
        sp = SamplingParams(temperature=0.0, max_new_tokens=6)
        ref = [
            o.output_ids
            for o in make_engine().generate(
                input_ids=prompts(), sampling_params=[sp] * 3
            )
        ]
        eng = make_engine(mesh=tp_mesh(2), attention_backend="ragged")
        assert eng.scheduler.runner.attention_backend == "ragged_tp"
        got = [
            o.output_ids
            for o in eng.generate(input_ids=prompts(), sampling_params=[sp] * 3)
        ]
        assert got == ref
        eng.scheduler.check_memory_leak()

    def test_tp2_gqa_backend_matches(self):
        """shard_map-wrapped GQA decode kernel (decode v2) == single-device
        XLA backend on the virtual TP mesh (interpret-mode kernel body)."""
        sp = SamplingParams(temperature=0.0, max_new_tokens=6)
        ref = [
            o.output_ids
            for o in make_engine().generate(
                input_ids=prompts(), sampling_params=[sp] * 3
            )
        ]
        eng = make_engine(mesh=tp_mesh(2), attention_backend="gqa")
        assert eng.scheduler.runner.attention_backend == "gqa_tp"
        got = [
            o.output_ids
            for o in eng.generate(input_ids=prompts(), sampling_params=[sp] * 3)
        ]
        assert got == ref
        eng.scheduler.check_memory_leak()

    def test_tp2_quantized_runs(self):
        sp = SamplingParams(temperature=0.0, max_new_tokens=4)
        eng = make_engine(mesh=tp_mesh(2), quantization="w4a16")
        outs = eng.generate(input_ids=prompts()[:2], sampling_params=[sp] * 2)
        assert all(len(o.output_ids) == 4 for o in outs)

    def test_tp2_int8_kv_gqa_matches(self):
        """INT8 KV on a pure-TP mesh rides the gqa_tp kernels: the scale
        pool shards into per-tp 128-lane blocks and both decode (in-kernel
        scale folding) and extend (per-shard dequant scratch) run under
        shard_map. Greedy outputs must match the single-device int8 engine
        (VERDICT r2 item 2: BASELINE config 3 on a mesh)."""
        sp = SamplingParams(temperature=0.0, max_new_tokens=6)
        ref = [
            o.output_ids
            for o in make_engine(
                kv_cache_dtype="int8", attention_backend="gqa"
            ).generate(input_ids=prompts(), sampling_params=[sp] * 3)
        ]
        eng = make_engine(
            mesh=tp_mesh(2), kv_cache_dtype="int8", attention_backend="gqa"
        )
        assert eng.scheduler.runner.attention_backend == "gqa_tp"
        assert eng.scheduler.runner.kv_cache.scale_shards == 2
        got = [
            o.output_ids
            for o in eng.generate(input_ids=prompts(), sampling_params=[sp] * 3)
        ]
        assert got == ref
        eng.scheduler.check_memory_leak()

    def test_tp2_fp8_kv_gqa_matches(self):
        sp = SamplingParams(temperature=0.0, max_new_tokens=5)
        ref = [
            o.output_ids
            for o in make_engine(
                kv_cache_dtype="fp8", attention_backend="gqa"
            ).generate(input_ids=prompts()[:2], sampling_params=[sp] * 2)
        ]
        eng = make_engine(
            mesh=tp_mesh(2), kv_cache_dtype="fp8", attention_backend="gqa"
        )
        assert eng.scheduler.runner.attention_backend == "gqa_tp"
        got = [
            o.output_ids
            for o in eng.generate(
                input_ids=prompts()[:2], sampling_params=[sp] * 2
            )
        ]
        assert got == ref
        eng.scheduler.check_memory_leak()

    def test_tp2_int8_kv_lane_layout_matches(self):
        """The lane-folded pool ([Pg, ps, 2Hkv*Dp], kv_layout=lanes) must be
        bit-identical to the single-device int8 engine. This is the layout
        that makes quantized KV sliceable at tp=8 on real chips (the
        sublane-major layout needs (2*Hkv)/tp % 4 == 0 — VERDICT r3 item 4,
        BASELINE config 3 at tp=8)."""
        sp = SamplingParams(temperature=0.0, max_new_tokens=6)
        ref = [
            o.output_ids
            for o in make_engine(
                kv_cache_dtype="int8", attention_backend="gqa"
            ).generate(input_ids=prompts(), sampling_params=[sp] * 3)
        ]
        eng = make_engine(
            mesh=tp_mesh(2),
            kv_cache_dtype="int8",
            attention_backend="gqa",
            kv_layout="lanes",
        )
        assert eng.scheduler.runner.attention_backend == "gqa_tp"
        assert eng.scheduler.runner.kv_cache.lane_heads
        assert eng.scheduler.runner.kv_cache.kv.ndim == 3
        got = [
            o.output_ids
            for o in eng.generate(input_ids=prompts(), sampling_params=[sp] * 3)
        ]
        assert got == ref
        eng.scheduler.check_memory_leak()

    def test_tp8_int8_kv_lane_layout_matches(self):
        """tp=8 + int8 KV + Hkv=8 — the BASELINE config-3 head geometry on a
        full v5e-8 host, inexpressible in the sublane layout ((2*8)/8 = 2
        head slots per shard). The lane-folded pool shards head slots as
        128-lane blocks, so every tp | 2*Hkv works."""
        from scratchpad_tpu.config.model_config import get_preset

        cfg = get_preset(
            "tiny-debug", num_key_value_heads=8, num_attention_heads=8
        )
        sp = SamplingParams(temperature=0.0, max_new_tokens=6)

        def engine(mesh=None, **kw):
            args = ServerArgs(
                preset="tiny-debug",
                random_weights=True,
                dtype="float32",
                page_size=4,
                max_total_tokens=2048,
                kv_cache_dtype="int8",
                attention_backend="gqa",
                **kw,
            )
            return Engine(args, mesh=mesh, model_config=cfg)

        ref = [
            o.output_ids
            for o in engine().generate(
                input_ids=prompts(), sampling_params=[sp] * 3
            )
        ]
        eng = engine(mesh=tp_mesh(8), kv_layout="lanes")
        assert eng.scheduler.runner.attention_backend == "gqa_tp"
        assert eng.scheduler.runner.kv_cache.lane_heads
        assert eng.scheduler.runner.kv_cache.scale_shards == 8
        got = [
            o.output_ids
            for o in eng.generate(input_ids=prompts(), sampling_params=[sp] * 3)
        ]
        assert got == ref
        eng.scheduler.check_memory_leak()

    def test_tp2_int8_kv_w4a16_runs(self):
        """The full BASELINE config-3 shape (W4A16 weights + INT8 KV) on a
        TP mesh keeps the fast kernels (no XLA-gather fallback)."""
        sp = SamplingParams(temperature=0.0, max_new_tokens=4)
        eng = make_engine(
            mesh=tp_mesh(2),
            kv_cache_dtype="int8",
            quantization="w4a16",
            attention_backend="gqa",
        )
        assert eng.scheduler.runner.attention_backend == "gqa_tp"
        outs = eng.generate(input_ids=prompts()[:2], sampling_params=[sp] * 2)
        assert all(len(o.output_ids) == 4 for o in outs)
        eng.scheduler.check_memory_leak()
