"""DP attention (enable_dp_attention) on the virtual CPU mesh.

Attention weights and the KV pool stay replicated, attention token rows
shard over BOTH mesh axes (dp, tp), and the MLP stays tensor-parallel —
XLA inserts the row gather at the boundary. The reference only carries the
flag + batch plumbing (reference: scratchpad/server/args.py:68,
model_executor/forward_info.py:221-237); this is an executing version, so
the test bar is greedy parity against the single-device engine.
"""

import numpy as np
import pytest
import jax
from jax.sharding import Mesh

from scratchpad_tpu.config import ServerArgs
from scratchpad_tpu.config.model_config import ModelConfig
from scratchpad_tpu.sampling.sampling_params import SamplingParams
from scratchpad_tpu.server.engine import Engine


def dp_tp_mesh(dp, tp):
    devs = jax.devices()
    if len(devs) < dp * tp:
        pytest.skip(f"needs {dp * tp} devices")
    return Mesh(np.array(devs[: dp * tp]).reshape(dp, tp), ("dp", "tp"))


def prompts():
    rng = np.random.default_rng(1)
    return [rng.integers(1, 500, n).tolist() for n in (9, 25, 14, 6)]


def make_llama_engine(mesh=None, **kw):
    args = ServerArgs(
        preset="tiny-debug",
        random_weights=True,
        dtype="float32",
        page_size=4,
        max_total_tokens=2048,
        **kw,
    )
    return Engine(args, mesh=mesh)


MLA_CFG = dict(
    vocab_size=512,
    hidden_size=64,
    intermediate_size=128,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=4,
    max_position_embeddings=1024,
    rms_norm_eps=1e-5,
    rope_theta=10000.0,
    tie_word_embeddings=False,
    kv_lora_rank=32,
    qk_nope_head_dim=16,
    qk_rope_head_dim=8,
    v_head_dim=16,
    q_lora_rank=24,
    num_experts=4,
    num_experts_per_tok=2,
    moe_intermediate_size=32,
    n_shared_experts=1,
    first_k_dense_replace=1,
)


def make_mla_engine(mesh=None, **kw):
    cfg = ModelConfig(architecture="DeepseekV2ForCausalLM", **MLA_CFG)
    args = ServerArgs(
        random_weights=True,
        dtype="float32",
        page_size=4,
        max_total_tokens=2048,
        **kw,
    )
    return Engine(args, model_config=cfg, mesh=mesh)


class TestDpAttention:
    def test_llama_dp2_tp2_matches_single_device(self):
        sp = SamplingParams(temperature=0.0, max_new_tokens=6, ignore_eos=True)
        n = len(prompts())
        ref = [
            o.output_ids
            for o in make_llama_engine().generate(
                input_ids=prompts(), sampling_params=[sp] * n
            )
        ]
        eng = make_llama_engine(
            mesh=dp_tp_mesh(2, 2), enable_dp_attention=True
        )
        runner = eng.scheduler.runner
        assert runner.dp_attention
        assert runner.attention_backend == "xla"
        # the KV pool must be fully replicated (no head sharding)
        kv_spec = runner.kv_cache.kv.sharding.spec
        assert all(p is None for p in kv_spec)
        # attention weights replicated, MLP weights still tp-sharded
        lspec = runner.params["layers"]["wq"].sharding.spec
        assert all(p is None for p in lspec)
        gspec = runner.params["layers"]["gate"].sharding.spec
        assert "tp" in jax.tree.leaves(tuple(gspec))
        got = [
            o.output_ids
            for o in eng.generate(input_ids=prompts(), sampling_params=[sp] * n)
        ]
        assert got == ref
        eng.scheduler.check_memory_leak()

    def test_mla_dp2_tp2_matches_single_device(self):
        """MLA is the headline case: the latent 'head' cannot shard over tp,
        so DP attention is the only way tp devices share attention work."""
        sp = SamplingParams(temperature=0.0, max_new_tokens=6, ignore_eos=True)
        n = len(prompts())
        ref = [
            o.output_ids
            for o in make_mla_engine().generate(
                input_ids=prompts(), sampling_params=[sp] * n
            )
        ]
        eng = make_mla_engine(mesh=dp_tp_mesh(2, 2), enable_dp_attention=True)
        assert eng.scheduler.runner.dp_attention
        got = [
            o.output_ids
            for o in eng.generate(input_ids=prompts(), sampling_params=[sp] * n)
        ]
        assert got == ref
        eng.scheduler.check_memory_leak()

    def test_pure_tp_mesh_falls_back(self):
        """No dp axis -> the flag is ignored (plain TP serving still works)."""
        devs = jax.devices()
        if len(devs) < 2:
            pytest.skip("needs 2 devices")
        mesh = Mesh(np.array(devs[:2]).reshape(1, 2), ("dp", "tp"))
        eng = make_llama_engine(mesh=mesh, enable_dp_attention=True)
        assert not eng.scheduler.runner.dp_attention
        sp = SamplingParams(temperature=0.0, max_new_tokens=4, ignore_eos=True)
        outs = eng.generate(input_ids=prompts()[:2], sampling_params=[sp] * 2)
        assert all(len(o.output_ids) == 4 for o in outs)


def make_moe_engine(arch, mesh=None, **kw):
    if arch == "mixtral":
        cfg = ModelConfig(
            architecture="MixtralForCausalLM",
            vocab_size=512, hidden_size=64, intermediate_size=128,
            moe_intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, head_dim=16,
            num_experts=4, num_experts_per_tok=2,
            max_position_embeddings=1024, rms_norm_eps=1e-5,
            rope_theta=10000.0, tie_word_embeddings=False, dtype="float32",
        )
    else:  # gpt-oss
        from scratchpad_tpu.config.model_config import get_preset

        cfg = get_preset("tiny-gpt-oss", dtype="float32")
    args = ServerArgs(
        random_weights=True, dtype="float32", page_size=4,
        max_total_tokens=2048, **kw,
    )
    return Engine(args, model_config=cfg, mesh=mesh)


@pytest.mark.parametrize("arch", ["mixtral", "gpt-oss"])
def test_moe_dp2_tp2_matches_single_device(arch):
    sp = SamplingParams(temperature=0.0, max_new_tokens=6, ignore_eos=True)
    n = len(prompts())
    ref = [
        o.output_ids
        for o in make_moe_engine(arch).generate(
            input_ids=prompts(), sampling_params=[sp] * n
        )
    ]
    eng = make_moe_engine(arch, mesh=dp_tp_mesh(2, 2), enable_dp_attention=True)
    assert eng.scheduler.runner.dp_attention
    got = [
        o.output_ids
        for o in eng.generate(input_ids=prompts(), sampling_params=[sp] * n)
    ]
    assert got == ref
    eng.scheduler.check_memory_leak()
