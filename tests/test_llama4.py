"""Llama-4 text parity vs HF torch on identical tiny weights (NoPE layers
with temperature tuning, chunked attention, sigmoid input-scaled MoE
routing + shared expert, interleaved dense/MoE layers, L2 qk-norm)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from scratchpad_tpu.config import ServerArgs
from scratchpad_tpu.config.model_config import ModelConfig
from scratchpad_tpu.executor.model_runner import ModelRunner

from tests.utils import greedy_generate


def test_llama4_greedy_parity():
    torch = pytest.importorskip("torch")
    from transformers import Llama4TextConfig
    from transformers.models.llama4.modeling_llama4 import Llama4ForCausalLM

    hf_cfg = Llama4TextConfig(
        vocab_size=512,
        hidden_size=128,
        intermediate_size=96,
        intermediate_size_mlp=160,
        num_hidden_layers=4,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=32,
        num_local_experts=4,
        num_experts_per_tok=2,
        interleave_moe_layer_step=2,  # dense/MoE alternate
        use_qk_norm=True,
        attn_temperature_tuning=True,
        floor_scale=8,  # small so tuning actually varies over the prompt
        attention_chunk_size=8,  # chunked mask clips at test lengths
        max_position_embeddings=1024,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
        rope_scaling=None,
        tie_word_embeddings=False,
        attention_bias=False,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    hf = Llama4ForCausalLM(hf_cfg).eval().to(torch.float32)
    state = {k: v.numpy() for k, v in hf.state_dict().items()}

    cfg = ModelConfig.from_hf_config(
        {**hf_cfg.to_dict(), "architectures": ["Llama4ForCausalLM"]},
        dtype="float32",
    )
    assert cfg.num_experts == 4
    assert cfg.no_rope_layers == list(hf_cfg.no_rope_layers)
    from scratchpad_tpu.models.registry import get_model_class

    model = get_model_class("Llama4ForCausalLM")(cfg)
    assert model.moe_layers == {1, 3}
    params = model.convert_hf_state(state, dtype="float32")
    args = ServerArgs(max_total_tokens=4096, page_size=4, dtype="float32")
    runner = ModelRunner(cfg, args, params=params)
    rng = np.random.default_rng(8)
    # long enough that the chunk mask (8) and NoPE tuning (floor 8) engage
    prompt = rng.integers(1, 500, 21).tolist()
    ours = greedy_generate(runner, prompt, 8)
    with torch.no_grad():
        hf_out = hf.generate(
            torch.tensor([prompt]),
            max_new_tokens=8,
            do_sample=False,
            temperature=None,
            top_p=None,
            top_k=None,
        )
    theirs = hf_out[0, len(prompt) :].tolist()
    assert ours == theirs, f"{ours} vs {theirs}"
