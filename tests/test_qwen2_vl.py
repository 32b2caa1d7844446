"""Qwen2-VL: vision-tower + mrope parity vs HF torch, engine e2e."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from scratchpad_tpu.config import ServerArgs
from scratchpad_tpu.config.model_config import ModelConfig

IMG_TOK = 501
VSTART = 502
VEND = 503
VID_TOK = 504

TEXT_KW = dict(
    vocab_size=512,
    hidden_size=64,
    intermediate_size=128,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    max_position_embeddings=1024,
    rms_norm_eps=1e-5,
    rope_theta=10000.0,
    tie_word_embeddings=False,
    rope_scaling={"type": "mrope", "mrope_section": [2, 3, 3]},
)
VISION_KW = dict(
    embed_dim=32,
    depth=2,
    num_heads=2,
    mlp_ratio=2,
    in_channels=3,
    patch_size=4,
    spatial_merge_size=2,
    temporal_patch_size=2,
    hidden_size=64,  # projects to the text width
)
IMAGE_SIZE = 16  # grid 4x4 -> 2x2 = 4 merged tokens per image


def our_config():
    return ModelConfig(
        architecture="Qwen2VLForConditionalGeneration",
        **{k: v for k, v in TEXT_KW.items()},
        head_dim=16,
        multimodal=dict(
            vision_config=dict(VISION_KW),
            image_token_id=IMG_TOK,
            video_token_id=VID_TOK,
            vision_start_token_id=VSTART,
            image_size=IMAGE_SIZE,
        ),
    )


def build_hf(seed=0):
    torch = pytest.importorskip("torch")
    from transformers import Qwen2VLConfig
    from transformers import Qwen2VLForConditionalGeneration as HFQwen2VL

    cfg = Qwen2VLConfig(
        text_config=dict(TEXT_KW),
        vision_config=dict(VISION_KW),
        image_token_id=IMG_TOK,
        video_token_id=VID_TOK,
        vision_start_token_id=VSTART,
        vision_end_token_id=VEND,
    )
    cfg.text_config._attn_implementation = "eager"
    cfg.vision_config._attn_implementation = "eager"
    torch.manual_seed(seed)
    hf = HFQwen2VL(cfg).eval().to(torch.float32)
    return hf


def patchify_for_hf(px: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """[N, C, S, S] -> HF (pixel_values [L_total, C*tp*p*p], grid_thw)."""
    N, C, S, _ = px.shape
    p, m, tp = (
        VISION_KW["patch_size"],
        VISION_KW["spatial_merge_size"],
        VISION_KW["temporal_patch_size"],
    )
    g = S // p
    x = px.reshape(N, C, g, p, g, p).transpose(0, 2, 4, 1, 3, 5)
    x = np.broadcast_to(
        x.reshape(N, g, g, C, 1, p * p), (N, g, g, C, tp, p * p)
    )
    D = C * tp * p * p
    x = x.reshape(N, g // m, m, g // m, m, D).transpose(0, 1, 3, 2, 4, 5)
    flat = x.reshape(N * g * g, D)
    grid = np.tile([[1, g, g]], (N, 1))
    return np.ascontiguousarray(flat), grid


def test_patch_order_matches_hf_processor():
    """Our patch flattening must equal Qwen2VLImageProcessor's output."""
    pytest.importorskip("torch")
    from transformers.models.qwen2_vl.image_processing_qwen2_vl import (
        Qwen2VLImageProcessor,
    )

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (IMAGE_SIZE, IMAGE_SIZE, 3)).astype(np.uint8)
    proc = Qwen2VLImageProcessor(
        patch_size=VISION_KW["patch_size"],
        merge_size=VISION_KW["spatial_merge_size"],
        temporal_patch_size=VISION_KW["temporal_patch_size"],
        do_resize=False,
    )
    out = proc(images=[img], return_tensors="np")
    theirs = out["pixel_values"]
    assert (out["image_grid_thw"] == [1, 4, 4]).all()

    # ours: normalize the same way, then patchify
    from scratchpad_tpu.multimodal.image import CLIP_MEAN, CLIP_STD

    x = img.astype(np.float32) / 255.0
    x = ((x - CLIP_MEAN) / CLIP_STD).transpose(2, 0, 1)[None]
    ours, grid = patchify_for_hf(x)
    assert (grid == [[1, 4, 4]]).all()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


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
    px = rng.standard_normal((2, 3, IMAGE_SIZE, IMAGE_SIZE)).astype(np.float32)
    ours = runner.encode_images(px)  # [2, 4, 64]
    flat, grid = patchify_for_hf(px)
    with torch.no_grad():
        theirs = hf.model.visual(
            torch.tensor(flat), grid_thw=torch.tensor(grid)
        ).numpy()
    assert ours.shape == (2, 4, 64)
    np.testing.assert_allclose(
        ours.reshape(-1, 64), theirs, atol=3e-4, rtol=1e-3
    )


def test_mrope_table_matches_hf():
    torch = pytest.importorskip("torch")
    hf = build_hf()
    from scratchpad_tpu.models.registry import get_model_class

    cfg = our_config()
    model = get_model_class(cfg.architecture)(cfg)
    # prompt: text, image(4 tokens), text
    ids = [3, VSTART] + [IMG_TOK] * 4 + [VEND, 7, 9]
    table, delta = model.compute_mrope(ids, [(2, 4)])
    pos_hf, delta_hf = hf.model.get_rope_index(
        input_ids=torch.tensor([ids]),
        image_grid_thw=torch.tensor([[1, 4, 4]]),
    )
    np.testing.assert_array_equal(table, pos_hf[:, 0, :].numpy())
    assert delta == int(delta_hf[0, 0])


def test_qwen2vl_greedy_parity():
    torch = pytest.importorskip("torch")
    hf = build_hf(seed=1)

    from scratchpad_tpu.sampling.sampling_params import SamplingParams
    from scratchpad_tpu.server.engine import Engine

    args = ServerArgs(max_total_tokens=4096, page_size=4, dtype="float32")
    eng = Engine(args, model_config=our_config())
    state = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    ok, msg = eng.scheduler.runner.update_weights(state)
    assert ok, msg

    rng = np.random.default_rng(2)
    px = rng.standard_normal((1, 3, IMAGE_SIZE, IMAGE_SIZE)).astype(
        np.float32
    ) * 0.5
    prompt = [3, VSTART, IMG_TOK, VEND, 11, 13, 17]
    n_new = 8
    sp = SamplingParams(temperature=0.0, max_new_tokens=n_new, ignore_eos=True)
    out = eng.generate(input_ids=prompt, sampling_params=sp, image_data=px)

    flat, grid = patchify_for_hf(px)
    expanded = []
    for t in prompt:
        expanded.extend([IMG_TOK] * 4 if t == IMG_TOK else [t])
    with torch.no_grad():
        hf_out = hf.generate(
            input_ids=torch.tensor([expanded]),
            pixel_values=torch.tensor(flat),
            image_grid_thw=torch.tensor(grid),
            max_new_tokens=n_new,
            do_sample=False,
            temperature=None,
            top_p=None,
            top_k=None,
        )
    theirs = hf_out[0, len(expanded) :].tolist()
    assert out.output_ids == theirs, f"{out.output_ids} vs {theirs}"
    eng.scheduler.check_memory_leak()


def test_qwen2vl_text_only_matches_hf():
    """No images: mrope must collapse to plain rope (delta 0)."""
    torch = pytest.importorskip("torch")
    hf = build_hf(seed=2)
    from scratchpad_tpu.sampling.sampling_params import SamplingParams
    from scratchpad_tpu.server.engine import Engine

    args = ServerArgs(max_total_tokens=4096, page_size=4, dtype="float32")
    eng = Engine(args, model_config=our_config())
    state = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    ok, msg = eng.scheduler.runner.update_weights(state)
    assert ok, msg
    prompt = [5, 9, 2, 44, 17, 30]
    sp = SamplingParams(temperature=0.0, max_new_tokens=8, ignore_eos=True)
    out = eng.generate(input_ids=prompt, sampling_params=sp)
    with torch.no_grad():
        hf_out = hf.generate(
            input_ids=torch.tensor([prompt]),
            max_new_tokens=8,
            do_sample=False,
            temperature=None,
            top_p=None,
            top_k=None,
        )
    assert out.output_ids == hf_out[0, len(prompt) :].tolist()


def test_radix_reuse_after_image():
    """Second request sharing the image prefix must reuse KV and still
    produce identical output (mrope table sliced at the prefix boundary)."""
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
    px = rng.standard_normal((1, 3, IMAGE_SIZE, IMAGE_SIZE)).astype(np.float32)
    prompt = [VSTART, IMG_TOK, VEND, 5, 9]
    sp = SamplingParams(temperature=0.0, max_new_tokens=6, ignore_eos=True)
    a = eng.generate(input_ids=prompt, sampling_params=sp, image_data=px)
    b = eng.generate(input_ids=prompt, sampling_params=sp, image_data=px)
    assert b.cached_tokens > 0
    assert b.output_ids == a.output_ids
    eng.scheduler.check_memory_leak()


# --------------------------------------------------------------- video


def patchify_video_for_hf(frames: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """[T, C, S, S] real frames -> HF (pixel_values_videos, video_grid_thw):
    temporal_patch_size consecutive frames per patch, flatten (C, tp, p, p),
    merge-block spatial order."""
    T, C, S, _ = frames.shape
    p, m, tp = (
        VISION_KW["patch_size"],
        VISION_KW["spatial_merge_size"],
        VISION_KW["temporal_patch_size"],
    )
    g = S // p
    gt = T // tp
    x = frames.reshape(gt, tp, C, g, p, g, p)
    x = x.transpose(0, 3, 5, 2, 1, 4, 6)  # [gt, gh, gw, C, tp, p, p]
    D = C * tp * p * p
    x = x.reshape(gt, g, g, D)
    x = x.reshape(gt, g // m, m, g // m, m, D).transpose(0, 1, 3, 2, 4, 5)
    flat = x.reshape(gt * g * g, D)
    return np.ascontiguousarray(flat), np.array([[gt, g, g]])


def test_video_mrope_matches_hf():
    """compute_mrope video spans == HF get_rope_index(video_grid_thw):
    the TIME component advances per temporal patch (VERDICT r2 item 9)."""
    torch = pytest.importorskip("torch")
    hf = build_hf()
    from scratchpad_tpu.models.registry import get_model_class

    cfg = our_config()
    model = get_model_class(cfg.architecture)(cfg)
    # video of grid_t=2 temporal patches, 4 tokens each
    ids = [3, VSTART] + [VID_TOK] * 8 + [VEND, 7, 9]
    table, delta = model.compute_mrope(ids, [(2, 8, 2)])
    pos_hf, delta_hf = hf.model.get_rope_index(
        input_ids=torch.tensor([ids]),
        video_grid_thw=torch.tensor([[2, 4, 4]]),
    )
    np.testing.assert_array_equal(table, pos_hf[:, 0, :].numpy())
    assert delta == int(delta_hf[0, 0])


def test_qwen2vl_video_greedy_parity():
    """Engine video_data == HF generate(pixel_values_videos): frames ride
    the ViT in REAL temporal patches and the single video placeholder
    expands to grid_t x patches content-hashed pseudo tokens."""
    torch = pytest.importorskip("torch")
    hf = build_hf(seed=3)

    from scratchpad_tpu.sampling.sampling_params import SamplingParams
    from scratchpad_tpu.server.engine import Engine

    args = ServerArgs(max_total_tokens=4096, page_size=4, dtype="float32")
    eng = Engine(args, model_config=our_config())
    state = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    ok, msg = eng.scheduler.runner.update_weights(state)
    assert ok, msg

    rng = np.random.default_rng(5)
    T = 4  # -> grid_t = 2 temporal patches
    px = rng.standard_normal((T, 3, IMAGE_SIZE, IMAGE_SIZE)).astype(
        np.float32
    ) * 0.5
    prompt = [3, VSTART, VID_TOK, VEND, 11, 13, 17]
    n_new = 8
    sp = SamplingParams(temperature=0.0, max_new_tokens=n_new, ignore_eos=True)
    out = eng.generate(input_ids=prompt, sampling_params=sp, video_data=px)

    flat, grid = patchify_video_for_hf(px)
    expanded = []
    for t in prompt:
        expanded.extend([VID_TOK] * 8 if t == VID_TOK else [t])
    with torch.no_grad():
        hf_out = hf.generate(
            input_ids=torch.tensor([expanded]),
            pixel_values_videos=torch.tensor(flat),
            video_grid_thw=torch.tensor(grid),
            max_new_tokens=n_new,
            do_sample=False,
            temperature=None,
            top_p=None,
            top_k=None,
        )
    theirs = hf_out[0, len(expanded) :].tolist()
    assert out.output_ids == theirs, f"{out.output_ids} vs {theirs}"
    eng.scheduler.check_memory_leak()


def test_decode_video_gif_sampling():
    """decode_video: animated GIF -> uniformly sampled RGB frames."""
    from PIL import Image

    from scratchpad_tpu.multimodal.video import decode_video

    frames = [
        Image.new("RGB", (32, 32), (i * 10, 0, 0)) for i in range(20)
    ]
    import io as _io

    buf = _io.BytesIO()
    frames[0].save(
        buf, format="GIF", save_all=True, append_images=frames[1:]
    )
    got = decode_video(buf.getvalue(), num_frames=8)
    assert len(got) == 8
    assert got[0].size == (32, 32)
    # uniform sampling spans the whole clip
    first, last = np.asarray(got[0]), np.asarray(got[-1])
    assert first[0, 0, 0] < last[0, 0, 0]


def test_decode_video_cv2_mp4():
    """decode_video: mp4 path through cv2 (skip if no codec available)."""
    cv2 = pytest.importorskip("cv2")
    import tempfile, os

    path = os.path.join(tempfile.mkdtemp(), "clip.mp4")
    w = cv2.VideoWriter(
        path, cv2.VideoWriter_fourcc(*"mp4v"), 5, (32, 32)
    )
    if not w.isOpened():
        pytest.skip("no mp4 encoder in this cv2 build")
    for i in range(10):
        frame = np.full((32, 32, 3), i * 20, np.uint8)
        w.write(frame)
    w.release()
    from scratchpad_tpu.multimodal.video import decode_video

    got = decode_video(path, num_frames=4)
    assert len(got) == 4


def test_qwen2vl_two_images_greedy_parity():
    """>1 image per prompt (VERDICT r2 item 9): two distinct images, each
    with its own mrope span and content-hashed pseudo ids, vs HF."""
    torch = pytest.importorskip("torch")
    hf = build_hf(seed=7)

    from scratchpad_tpu.sampling.sampling_params import SamplingParams
    from scratchpad_tpu.server.engine import Engine

    args = ServerArgs(max_total_tokens=4096, page_size=4, dtype="float32")
    eng = Engine(args, model_config=our_config())
    state = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    ok, msg = eng.scheduler.runner.update_weights(state)
    assert ok, msg

    rng = np.random.default_rng(11)
    px = rng.standard_normal((2, 3, IMAGE_SIZE, IMAGE_SIZE)).astype(
        np.float32
    ) * 0.5
    prompt = [3, VSTART, IMG_TOK, VEND, 9, VSTART, IMG_TOK, VEND, 11, 13]
    n_new = 8
    sp = SamplingParams(temperature=0.0, max_new_tokens=n_new, ignore_eos=True)
    out = eng.generate(input_ids=prompt, sampling_params=sp, image_data=px)

    flat, grid = patchify_for_hf(px)
    expanded = []
    for t in prompt:
        expanded.extend([IMG_TOK] * 4 if t == IMG_TOK else [t])
    with torch.no_grad():
        hf_out = hf.generate(
            input_ids=torch.tensor([expanded]),
            pixel_values=torch.tensor(flat),
            image_grid_thw=torch.tensor(grid),
            max_new_tokens=n_new,
            do_sample=False,
            temperature=None,
            top_p=None,
            top_k=None,
        )
    theirs = hf_out[0, len(expanded) :].tolist()
    assert out.output_ids == theirs, f"{out.output_ids} vs {theirs}"
    eng.scheduler.check_memory_leak()
