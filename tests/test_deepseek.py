"""DeepSeek-V2 (MLA + MoE) parity vs HF torch."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from scratchpad_tpu.config import ServerArgs
from scratchpad_tpu.config.model_config import ModelConfig
from scratchpad_tpu.executor.model_runner import ModelRunner

from tests.utils import greedy_generate

BASE = dict(
    vocab_size=512,
    hidden_size=64,
    intermediate_size=128,
    num_hidden_layers=2,
    num_attention_heads=4,
    max_position_embeddings=1024,
    rms_norm_eps=1e-5,
    rope_theta=10000.0,
    tie_word_embeddings=False,
    kv_lora_rank=32,
    qk_nope_head_dim=16,
    qk_rope_head_dim=8,
    v_head_dim=16,
)


def build_pair(q_lora_rank, moe, topk_method="greedy", seed=0):
    torch = pytest.importorskip("torch")
    from transformers import DeepseekV2Config
    from transformers.models.deepseek_v2.modeling_deepseek_v2 import (
        DeepseekV2ForCausalLM as HFDeepseek,
    )

    L = BASE["num_hidden_layers"]
    hf_kw = dict(
        BASE,
        num_key_value_heads=BASE["num_attention_heads"],
        q_lora_rank=q_lora_rank,
        attn_implementation="eager",
        aux_loss_alpha=0.0,
    )
    ours_kw = dict(BASE, num_key_value_heads=BASE["num_attention_heads"],
                   q_lora_rank=q_lora_rank)
    if moe:
        moe_kw = dict(
            n_routed_experts=4,
            num_experts_per_tok=2,
            moe_intermediate_size=32,
            n_shared_experts=1,
            first_k_dense_replace=1,
            routed_scaling_factor=1.0,
            norm_topk_prob=False,
            topk_method=topk_method,
            n_group=2,
            topk_group=1,
        )
        hf_kw.update(moe_kw)
        ours_kw.update(
            num_experts=4,
            num_experts_per_tok=2,
            moe_intermediate_size=32,
            n_shared_experts=1,
            first_k_dense_replace=1,
            routed_scaling_factor=1.0,
            topk_method=topk_method,
            n_group=2,
            topk_group=1,
        )
    else:
        hf_kw.update(n_routed_experts=None, first_k_dense_replace=L)

    torch.manual_seed(seed)
    hf = HFDeepseek(DeepseekV2Config(**hf_kw)).eval().to(torch.float32)
    state = {k: v.detach().numpy() for k, v in hf.state_dict().items()}

    cfg = ModelConfig(architecture="DeepseekV2ForCausalLM", **ours_kw)
    from scratchpad_tpu.models.registry import get_model_class

    params = get_model_class("DeepseekV2ForCausalLM")(cfg).convert_hf_state(
        state, dtype="float32"
    )
    args = ServerArgs(max_total_tokens=4096, page_size=4, dtype="float32")
    runner = ModelRunner(cfg, args, params=params)
    return hf, runner


def check_greedy(hf, runner, n_new=8, seed=7):
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(seed)
    prompt = rng.integers(1, 500, 13).tolist()
    ours = greedy_generate(runner, prompt, n_new)
    with torch.no_grad():
        hf_out = hf.generate(
            torch.tensor([prompt]),
            max_new_tokens=n_new,
            do_sample=False,
            temperature=None,
            top_p=None,
            top_k=None,
        )
    theirs = hf_out[0, len(prompt) :].tolist()
    assert ours == theirs, f"{ours} vs {theirs}"


def test_dense_no_qlora_parity():
    hf, runner = build_pair(q_lora_rank=None, moe=False)
    assert runner.kv_config.mla
    assert runner.kv_cache.kv.shape[-2:] == (1, 32 + 8)
    check_greedy(hf, runner)


def test_dense_qlora_parity():
    hf, runner = build_pair(q_lora_rank=24, moe=False, seed=1)
    check_greedy(hf, runner, seed=8)


def test_moe_shared_experts_parity():
    hf, runner = build_pair(q_lora_rank=None, moe=True, seed=2)
    check_greedy(hf, runner, seed=9)


def test_moe_group_limited_parity():
    hf, runner = build_pair(
        q_lora_rank=None, moe=True, topk_method="group_limited_greedy", seed=3
    )
    check_greedy(hf, runner, seed=10)


def build_v3_pair(seed=3):
    """Tiny DeepseekV3 (sigmoid noaux-tc router) vs HF, random bias."""
    torch = pytest.importorskip("torch")
    from transformers import DeepseekV3Config
    from transformers.models.deepseek_v3.modeling_deepseek_v3 import (
        DeepseekV3ForCausalLM as HFDeepseekV3,
    )

    kw = dict(
        BASE,
        num_key_value_heads=BASE["num_attention_heads"],
        q_lora_rank=None,
        n_routed_experts=4,
        num_experts_per_tok=2,
        moe_intermediate_size=32,
        n_shared_experts=1,
        first_k_dense_replace=1,
        routed_scaling_factor=2.5,
        norm_topk_prob=True,
        n_group=2,
        topk_group=1,
        attn_implementation="eager",
    )
    torch.manual_seed(seed)
    hf = HFDeepseekV3(DeepseekV3Config(**kw)).eval().to(torch.float32)
    # the correction bias initialises to zeros; randomise it so the test
    # actually exercises the biased group/expert selection
    sd = hf.state_dict()
    for k in sd:
        if "e_score_correction_bias" in k:
            sd[k] = torch.randn_like(sd[k])
    hf.load_state_dict(sd)
    state = {k: v.detach().numpy() for k, v in hf.state_dict().items()}

    cfg = ModelConfig(
        architecture="DeepseekV3ForCausalLM",
        **dict(BASE, num_key_value_heads=BASE["num_attention_heads"]),
        q_lora_rank=None,
        num_experts=4,
        num_experts_per_tok=2,
        moe_intermediate_size=32,
        n_shared_experts=1,
        first_k_dense_replace=1,
        routed_scaling_factor=2.5,
        norm_topk_prob=True,
        topk_method="noaux_tc",
        n_group=2,
        topk_group=1,
    )
    from scratchpad_tpu.models.registry import get_model_class

    model_cls = get_model_class("DeepseekV3ForCausalLM")
    assert model_cls(cfg).noaux_tc
    params = model_cls(cfg).convert_hf_state(state, dtype="float32")
    args = ServerArgs(max_total_tokens=4096, page_size=4, dtype="float32")
    runner = ModelRunner(cfg, args, params=params)
    return hf, runner


def test_v3_noaux_tc_parity():
    hf, runner = build_v3_pair(seed=3)
    check_greedy(hf, runner, seed=11)


def test_v3_noaux_tc_parity_second_seed():
    hf, runner = build_v3_pair(seed=4)
    check_greedy(hf, runner, n_new=10, seed=12)


def test_engine_e2e_mla():
    """Scheduler-level run with chunked prefill + radix over the MLA cache."""
    from scratchpad_tpu.sampling.sampling_params import SamplingParams
    from scratchpad_tpu.server.engine import Engine

    cfg = ModelConfig(
        architecture="DeepseekV2ForCausalLM",
        **dict(BASE, num_key_value_heads=4, q_lora_rank=24),
        num_experts=4,
        num_experts_per_tok=2,
        moe_intermediate_size=32,
        n_shared_experts=1,
        first_k_dense_replace=1,
    )
    args = ServerArgs(
        random_weights=True,
        dtype="float32",
        page_size=4,
        max_total_tokens=2048,
        chunked_prefill_size=8,
    )
    eng = Engine(args, model_config=cfg)
    sp = SamplingParams(temperature=0.0, max_new_tokens=6, ignore_eos=True)
    rng = np.random.default_rng(0)
    prompts = [rng.integers(1, 500, n).tolist() for n in (19, 7, 26)]
    outs = eng.generate(input_ids=prompts, sampling_params=[sp] * 3)
    assert all(len(o.output_ids) == 6 for o in outs)
    # shared prefix must radix-hit across the MLA latent cache
    o1 = eng.generate(input_ids=prompts[2], sampling_params=sp)
    assert o1.cached_tokens > 0
    assert o1.output_ids == outs[2].output_ids
    eng.scheduler.check_memory_leak()
