"""Gemma3-MM (SigLIP VLM) parity vs HF torch, incl. the bidirectional
image-span attention mask and chunk alignment around spans."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from scratchpad_tpu.config import ServerArgs
from scratchpad_tpu.config.model_config import ModelConfig

TEXT_KW = dict(
    vocab_size=512,
    hidden_size=64,
    intermediate_size=128,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    head_dim=16,
    max_position_embeddings=1024,
    rms_norm_eps=1e-6,
)
VISION_KW = dict(
    hidden_size=32,
    intermediate_size=64,
    num_hidden_layers=2,
    num_attention_heads=4,
    image_size=28,
    patch_size=7,  # -> 4x4 = 16 patches
    num_channels=3,
)
MM_TOKENS = 4  # pool 4x4 patches -> 2x2 soft tokens
IMG_TOK = 500


def build_hf(seed=0):
    torch = pytest.importorskip("torch")
    from transformers import Gemma3Config
    from transformers.models.gemma3.modeling_gemma3 import (
        Gemma3ForConditionalGeneration as HFGemma3,
    )

    cfg = Gemma3Config(
        text_config=dict(TEXT_KW, attn_implementation="eager"),
        vision_config=dict(VISION_KW),
        mm_tokens_per_image=MM_TOKENS,
        image_token_index=IMG_TOK,
        boi_token_index=498,
        eoi_token_index=499,
    )
    torch.manual_seed(seed)
    return HFGemma3(cfg).eval().to(torch.float32), cfg


def our_config(hf_cfg):
    return ModelConfig.from_hf_config(
        {
            **hf_cfg.to_dict(),
            "architectures": ["Gemma3ForConditionalGeneration"],
        },
        dtype="float32",
    )


def make_runner(hf, hf_cfg, **akw):
    from scratchpad_tpu.executor.model_runner import ModelRunner
    from scratchpad_tpu.models.registry import get_model_class

    state = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    cfg = our_config(hf_cfg)
    model = get_model_class(cfg.architecture)(cfg)
    params = model.convert_hf_state(state, dtype="float32")
    args = ServerArgs(max_total_tokens=4096, page_size=4, dtype="float32", **akw)
    return ModelRunner(cfg, args, params=params), cfg


def test_vision_features_match_hf():
    torch = pytest.importorskip("torch")
    hf, hf_cfg = build_hf()
    runner, _ = make_runner(hf, hf_cfg)
    rng = np.random.default_rng(0)
    px = rng.standard_normal((2, 3, 28, 28)).astype(np.float32)
    ours = runner.encode_images(px)
    with torch.no_grad():
        theirs = hf.model.get_image_features(torch.tensor(px)).numpy()
    assert ours.shape == theirs.shape == (2, MM_TOKENS, 64)
    np.testing.assert_allclose(ours, theirs, atol=3e-4)


def _hf_generate(hf, prompt_expanded, px, n_new):
    import torch

    ids = torch.tensor([prompt_expanded])
    token_type_ids = (ids == IMG_TOK).long()  # 1 = image token (bidir mask)
    with torch.no_grad():
        out = hf.generate(
            input_ids=ids,
            pixel_values=torch.tensor(px),
            token_type_ids=token_type_ids,
            max_new_tokens=n_new,
            do_sample=False,
            temperature=None,
            top_p=None,
            top_k=None,
        )
    return out[0, len(prompt_expanded) :].tolist()


def test_gemma3_mm_greedy_parity():
    pytest.importorskip("torch")
    hf, hf_cfg = build_hf(seed=1)
    from scratchpad_tpu.sampling.sampling_params import SamplingParams
    from scratchpad_tpu.server.engine import Engine

    cfg = our_config(hf_cfg)
    args = ServerArgs(max_total_tokens=4096, page_size=4, dtype="float32")
    eng = Engine(args, model_config=cfg)
    state = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    ok, msg = eng.scheduler.runner.update_weights(state)
    assert ok, msg

    rng = np.random.default_rng(2)
    px = rng.standard_normal((1, 3, 28, 28)).astype(np.float32) * 0.5
    prompt = [3, 7, IMG_TOK, 11, 13, 17]
    n_new = 8
    sp = SamplingParams(temperature=0.0, max_new_tokens=n_new, ignore_eos=True)
    out = eng.generate(input_ids=prompt, sampling_params=sp, image_data=px)

    expanded = []
    for t in prompt:
        expanded.extend([IMG_TOK] * MM_TOKENS if t == IMG_TOK else [t])
    theirs = _hf_generate(hf, expanded, px, n_new)
    assert out.output_ids == theirs, f"{out.output_ids} vs {theirs}"
    eng.scheduler.check_memory_leak()


def test_gemma3_mm_chunked_prefill_spans():
    """Chunk boundaries never split an image span: a chunk size that would
    land mid-span must produce the same output as unchunked prefill."""
    pytest.importorskip("torch")
    hf, hf_cfg = build_hf(seed=3)
    from scratchpad_tpu.sampling.sampling_params import SamplingParams
    from scratchpad_tpu.server.engine import Engine

    cfg = our_config(hf_cfg)
    state = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    rng = np.random.default_rng(4)
    px = rng.standard_normal((2, 3, 28, 28)).astype(np.float32) * 0.5
    # spans: image 1 at rows [5, 9), image 2 at rows [10, 14); chunk size 6
    # would split the first span at row 6 without the clamp
    prompt = [3, 7, 9, 11, 2, IMG_TOK, 4, IMG_TOK, 6, 8, 12, 14]
    sp = SamplingParams(temperature=0.0, max_new_tokens=6, ignore_eos=True)

    outs = []
    for chunk in (None, 6):
        akw = dict(max_total_tokens=4096, page_size=4, dtype="float32")
        if chunk:
            akw["chunked_prefill_size"] = chunk
        eng = Engine(ServerArgs(**akw), model_config=our_config(hf_cfg))
        ok, msg = eng.scheduler.runner.update_weights(dict(state))
        assert ok, msg
        outs.append(
            eng.generate(
                input_ids=prompt, sampling_params=sp, image_data=px
            ).output_ids
        )
        eng.scheduler.check_memory_leak()
    assert outs[0] == outs[1], outs

    expanded = []
    for t in prompt:
        expanded.extend([IMG_TOK] * MM_TOKENS if t == IMG_TOK else [t])
    theirs = _hf_generate(hf, expanded, px, 6)
    assert outs[0] == theirs, f"{outs[0]} vs {theirs}"
