"""Llava VLM parity vs HF torch + engine multimodal e2e."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from scratchpad_tpu.config import ServerArgs
from scratchpad_tpu.config.model_config import ModelConfig

IMG_TOK = 500  # placeholder id inside the tiny vocab

TEXT_KW = dict(
    vocab_size=512,
    hidden_size=64,
    intermediate_size=128,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    head_dim=16,
    max_position_embeddings=1024,
    rms_norm_eps=1e-5,
    rope_theta=10000.0,
    tie_word_embeddings=False,
)
VISION_KW = dict(
    hidden_size=32,
    intermediate_size=64,
    num_hidden_layers=3,
    num_attention_heads=4,
    image_size=24,
    patch_size=8,  # -> 3x3 = 9 patches
    num_channels=3,
)


def our_config():
    return ModelConfig(
        architecture="LlavaForConditionalGeneration",
        **TEXT_KW,
        multimodal=dict(
            vision_config=dict(VISION_KW),
            image_token_index=IMG_TOK,
            vision_feature_layer=-2,
            vision_feature_select_strategy="default",
            projector_hidden_act="gelu",
        ),
    )


def build_hf(seed=0):
    torch = pytest.importorskip("torch")
    from transformers import CLIPVisionConfig, LlamaConfig, LlavaConfig
    from transformers import LlavaForConditionalGeneration as HFLlava

    cfg = LlavaConfig(
        vision_config=CLIPVisionConfig(**VISION_KW).to_dict(),
        text_config=LlamaConfig(**TEXT_KW, attn_implementation="eager").to_dict(),
        image_token_index=IMG_TOK,
        vision_feature_layer=-2,
        vision_feature_select_strategy="default",
        projector_hidden_act="gelu",
    )
    torch.manual_seed(seed)
    hf = HFLlava(cfg).eval().to(torch.float32)
    return hf


def make_runner(hf):
    from scratchpad_tpu.executor.model_runner import ModelRunner
    from scratchpad_tpu.models.registry import get_model_class

    state = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    cfg = our_config()
    model = get_model_class(cfg.architecture)(cfg)
    params = model.convert_hf_state(state, dtype="float32")
    args = ServerArgs(max_total_tokens=4096, page_size=4, dtype="float32")
    return ModelRunner(cfg, args, params=params)


def test_vision_features_match_hf():
    torch = pytest.importorskip("torch")
    hf = build_hf()
    runner = make_runner(hf)
    rng = np.random.default_rng(0)
    px = rng.standard_normal((2, 3, 24, 24)).astype(np.float32)
    ours = runner.encode_images(px)
    with torch.no_grad():
        theirs = hf.model.get_image_features(torch.tensor(px))
        theirs = torch.stack(list(theirs)).numpy()
    assert ours.shape == theirs.shape == (2, 9, 64)
    np.testing.assert_allclose(ours, theirs, atol=2e-4)


def test_llava_greedy_parity():
    torch = pytest.importorskip("torch")
    hf = build_hf(seed=1)
    runner = make_runner(hf)

    from scratchpad_tpu.sampling.sampling_params import SamplingParams
    from scratchpad_tpu.server.engine import Engine

    args = ServerArgs(max_total_tokens=4096, page_size=4, dtype="float32")
    eng = Engine(args, model_config=our_config())
    # swap in the HF weights through the update-weights RPC path
    state = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    ok, msg = eng.scheduler.runner.update_weights(state)
    assert ok, msg

    rng = np.random.default_rng(2)
    px = rng.standard_normal((1, 3, 24, 24)).astype(np.float32) * 0.5
    prompt = [3, 7, IMG_TOK, 11, 13, 17]
    n_new = 8

    sp = SamplingParams(temperature=0.0, max_new_tokens=n_new, ignore_eos=True)
    out = eng.generate(input_ids=prompt, sampling_params=sp, image_data=px)

    with torch.no_grad():
        # HF expects the prompt pre-expanded to one token per patch
        expanded = []
        for t in prompt:
            expanded.extend([IMG_TOK] * 9 if t == IMG_TOK else [t])
        hf_out = hf.generate(
            input_ids=torch.tensor([expanded]),
            pixel_values=torch.tensor(px),
            max_new_tokens=n_new,
            do_sample=False,
            temperature=None,
            top_p=None,
            top_k=None,
        )
    theirs = hf_out[0, len(expanded) :].tolist()
    assert out.output_ids == theirs, f"{out.output_ids} vs {theirs}"
    eng.scheduler.check_memory_leak()


def test_images_do_not_radix_alias():
    """Two prompts differing only in image content must not share KV."""
    hf = build_hf(seed=3)
    from scratchpad_tpu.sampling.sampling_params import SamplingParams
    from scratchpad_tpu.server.engine import Engine

    args = ServerArgs(
        max_total_tokens=4096,
        page_size=4,
        dtype="float32",
        random_weights=True,
    )
    eng = Engine(args, model_config=our_config())
    rng = np.random.default_rng(4)
    px1 = rng.standard_normal((1, 3, 24, 24)).astype(np.float32)
    px2 = rng.standard_normal((1, 3, 24, 24)).astype(np.float32)
    prompt = [IMG_TOK, 5, 9]
    sp = SamplingParams(temperature=0.0, max_new_tokens=4, ignore_eos=True)
    a = eng.generate(input_ids=prompt, sampling_params=sp, image_data=px1)
    b = eng.generate(input_ids=prompt, sampling_params=sp, image_data=px2)
    assert b.cached_tokens == 0  # different image -> no prefix hit
    # identical image DOES hit (page-aligned prefix)
    c = eng.generate(input_ids=prompt, sampling_params=sp, image_data=px1)
    assert c.cached_tokens > 0
    assert c.output_ids == a.output_ids
    eng.scheduler.check_memory_leak()


def test_chunked_prefill_with_images():
    """Image rows must survive chunk boundaries mid-image."""
    from scratchpad_tpu.sampling.sampling_params import SamplingParams
    from scratchpad_tpu.server.engine import Engine

    args = ServerArgs(
        max_total_tokens=4096,
        page_size=4,
        dtype="float32",
        random_weights=True,
        chunked_prefill_size=5,  # splits the 9-patch image across chunks
    )
    eng = Engine(args, model_config=our_config())
    rng = np.random.default_rng(5)
    px = rng.standard_normal((1, 3, 24, 24)).astype(np.float32)
    prompt = [3, IMG_TOK, 11]
    sp = SamplingParams(temperature=0.0, max_new_tokens=4, ignore_eos=True)
    chunked = eng.generate(input_ids=prompt, sampling_params=sp, image_data=px)
    eng.flush_cache()
    # same request on a non-chunking engine must match
    args2 = ServerArgs(
        max_total_tokens=4096, page_size=4, dtype="float32", random_weights=True
    )
    eng2 = Engine(args2, model_config=our_config())
    whole = eng2.generate(input_ids=prompt, sampling_params=sp, image_data=px)
    assert chunked.output_ids == whole.output_ids
    eng.scheduler.check_memory_leak()


def test_parallel_sampling_with_images():
    """n>1 expands into clones that share the image prefix via the warmup."""
    from scratchpad_tpu.sampling.sampling_params import SamplingParams
    from scratchpad_tpu.server.engine import Engine

    args = ServerArgs(
        max_total_tokens=4096,
        page_size=4,
        dtype="float32",
        random_weights=True,
    )
    eng = Engine(args, model_config=our_config())
    rng = np.random.default_rng(6)
    px = rng.standard_normal((1, 3, 24, 24)).astype(np.float32)
    prompt = [3, IMG_TOK, 11, 13]
    sp = SamplingParams(temperature=0.0, max_new_tokens=4, ignore_eos=True, n=3)
    outs = eng.generate(input_ids=prompt, sampling_params=sp, image_data=px)
    assert len(outs) == 3
    # greedy clones must agree with a plain n=1 run on the same image
    sp1 = SamplingParams(temperature=0.0, max_new_tokens=4, ignore_eos=True)
    single = eng.generate(input_ids=prompt, sampling_params=sp1, image_data=px)
    assert all(o.output_ids == single.output_ids for o in outs)
    # the warmup pre-cached the image prefix -> clones radix-hit
    assert all(o.cached_tokens > 0 for o in outs)
    eng.scheduler.check_memory_leak()
