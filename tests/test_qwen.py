"""Qwen2/Qwen3 parity vs HF torch on identical tiny weights."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from scratchpad_tpu.config import ServerArgs
from scratchpad_tpu.config.model_config import ModelConfig
from scratchpad_tpu.executor.model_runner import ModelRunner

from tests.utils import greedy_generate

COMMON = dict(
    vocab_size=512,
    hidden_size=128,
    intermediate_size=256,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    head_dim=32,
    max_position_embeddings=1024,
    rms_norm_eps=1e-5,
    rope_theta=10000.0,
    tie_word_embeddings=False,
)


def _runner_and_hf(arch: str):
    torch = pytest.importorskip("torch")
    if arch == "Qwen2ForCausalLM":
        from transformers import Qwen2Config as HFConfig, Qwen2ForCausalLM as HFModel

        hf_kwargs = dict(COMMON)
    else:
        from transformers import Qwen3Config as HFConfig, Qwen3ForCausalLM as HFModel

        hf_kwargs = dict(COMMON)
    hf_cfg = HFConfig(**hf_kwargs)
    torch.manual_seed(0)
    hf_model = HFModel(hf_cfg).eval().to(torch.float32)
    state = {k: v.numpy() for k, v in hf_model.state_dict().items()}

    cfg = ModelConfig(architecture=arch, **COMMON)
    from scratchpad_tpu.models.registry import get_model_class

    model_cls = get_model_class(arch)
    params = model_cls(cfg).convert_hf_state(state, dtype="float32")
    # model_cls mutated cfg flags (bias/qk-norm) in __init__
    args = ServerArgs(max_total_tokens=4096, page_size=4, dtype="float32")
    runner = ModelRunner(cfg, args, params=params)
    return runner, hf_model


@pytest.mark.parametrize("arch", ["Qwen2ForCausalLM", "Qwen3ForCausalLM"])
def test_qwen_greedy_parity(arch):
    torch = pytest.importorskip("torch")
    runner, hf_model = _runner_and_hf(arch)
    rng = np.random.default_rng(2)
    prompt = rng.integers(1, 500, 13).tolist()
    ours = greedy_generate(runner, prompt, 8)
    with torch.no_grad():
        hf_out = hf_model.generate(
            torch.tensor([prompt]),
            max_new_tokens=8,
            do_sample=False,
            temperature=None,
            top_p=None,
            top_k=None,
        )
    theirs = hf_out[0, len(prompt) :].tolist()
    assert ours == theirs, f"{arch}: {ours} vs {theirs}"


def test_phi3_greedy_parity():
    """Phi-3 fused qkv/gate_up checkpoints split onto the Llama decoder."""
    torch = pytest.importorskip("torch")
    from transformers import Phi3Config
    from transformers import Phi3ForCausalLM as HFPhi3

    kw = dict(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, rms_norm_eps=1e-5, rope_theta=10000.0,
        tie_word_embeddings=False,
    )
    hcfg = Phi3Config(**kw, pad_token_id=0, bos_token_id=1, eos_token_id=2)
    hcfg._attn_implementation = "eager"
    torch.manual_seed(0)
    hf = HFPhi3(hcfg).eval().to(torch.float32)

    from scratchpad_tpu.config import ServerArgs
    from scratchpad_tpu.config.model_config import ModelConfig
    from scratchpad_tpu.sampling.sampling_params import SamplingParams
    from scratchpad_tpu.server.engine import Engine

    cfg = ModelConfig(architecture="Phi3ForCausalLM", **kw)
    eng = Engine(
        ServerArgs(max_total_tokens=2048, page_size=4, dtype="float32"),
        model_config=cfg,
    )
    state = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    ok, msg = eng.scheduler.runner.update_weights(state)
    assert ok, msg

    rng = np.random.default_rng(1)
    prompt = rng.integers(1, 500, 13).tolist()
    sp = SamplingParams(temperature=0.0, max_new_tokens=8, ignore_eos=True)
    out = eng.generate(input_ids=prompt, sampling_params=sp)
    with torch.no_grad():
        hf_out = hf.generate(
            input_ids=torch.tensor([prompt]), max_new_tokens=8,
            do_sample=False, temperature=None, top_p=None, top_k=None,
        )
    assert out.output_ids == hf_out[0, len(prompt):].tolist()
