"""Image decoding + CLIP-style preprocessing for VLM requests.

Analogue of the reference's image-processor pool
(reference: scratchpad/managers/image_processor.py:281-479) minus the
process pool — preprocessing is cheap next to the vision-tower forward, and
the TPU engine is single-controller. Accepts the OpenAI chat API's
``image_url`` forms that work offline: ``data:`` URLs, raw base64, and
local file paths.
"""

from __future__ import annotations

import base64
import binascii
import io
import os

import numpy as np

# OpenAI-CLIP normalisation constants (public, used by Llava checkpoints)
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def decode_image(src):
    """data: URL | base64 string | local path | PIL.Image -> PIL.Image RGB."""
    from PIL import Image

    if isinstance(src, Image.Image):
        return src.convert("RGB")
    if isinstance(src, (bytes, bytearray)):
        return Image.open(io.BytesIO(src)).convert("RGB")
    if isinstance(src, str):
        if src.startswith("data:"):
            b64 = src.split(",", 1)[1]
            return Image.open(io.BytesIO(base64.b64decode(b64))).convert("RGB")
        if src.startswith(("http://", "https://")):
            raise ValueError(
                "remote image URLs are not fetched (no egress); send a "
                "data: URL or base64 payload"
            )
        if os.path.exists(src):
            return Image.open(src).convert("RGB")
        try:
            return Image.open(io.BytesIO(base64.b64decode(src))).convert("RGB")
        except (binascii.Error, OSError) as e:
            raise ValueError(f"undecodable image payload: {e}") from None
    raise TypeError(f"unsupported image source {type(src)}")


def preprocess_clip(
    img, image_size: int, mean=CLIP_MEAN, std=CLIP_STD
) -> np.ndarray:
    """Shortest-side resize -> center crop -> normalize; returns [3, S, S]."""
    from PIL import Image

    w, h = img.size
    scale = image_size / min(w, h)
    img = img.resize(
        (max(image_size, round(w * scale)), max(image_size, round(h * scale))),
        Image.BICUBIC,
    )
    w, h = img.size
    left, top = (w - image_size) // 2, (h - image_size) // 2
    img = img.crop((left, top, left + image_size, top + image_size))
    x = np.asarray(img, np.float32) / 255.0  # [S, S, 3]
    x = (x - mean) / std
    return x.transpose(2, 0, 1)


def select_tiling(w: int, h: int, tile_size: int, supported) -> tuple:
    """Pick the aspect-ratio tile grid for a (w, h) image — HF
    ``get_optimal_tiled_canvas``: among supported (th, tw) grids prefer the
    smallest upscale that fits, else the largest downscale; ties break on
    the smallest canvas area. Returns (index_1based, th, tw)."""
    best = None
    for i, (th, tw) in enumerate(supported):
        ch, cw = th * tile_size, tw * tile_size
        scale = min(cw / w, ch / h)
        area = ch * cw
        # sort key: upscales (scale >= 1) win over downscales; among
        # upscales smaller scale first; among downscales larger scale
        # first; then smaller canvas
        if scale >= 1:
            key = (0, scale, area)
        else:
            key = (1, -scale, area)
        if best is None or key < best[0]:
            best = (key, i + 1, th, tw)
    return best[1], best[2], best[3]


def preprocess_tiled(
    img,
    tile_size: int,
    supported,
    max_tiles: int,
    mean=CLIP_MEAN,
    std=CLIP_STD,
):
    """HF MllamaImageProcessor equivalent: resize into the optimal tile
    canvas (aspect preserved), zero-pad, split into row-major tiles, and
    zero-pad the tile stack to ``max_tiles``.

    Returns (tiles [max_tiles, 3, S, S] f32, aspect_ratio_id (1-based),
    n_tiles)."""
    from PIL import Image

    import math

    w, h = img.size
    ar_id, th, tw = select_tiling(w, h, tile_size, supported)
    ch, cw = th * tile_size, tw * tile_size
    # HF get_image_size_fit_to_canvas: clamp the target into
    # [tile_size, canvas], scale by the binding axis, FLOOR the other
    # (bilinear resample — the HF default; bicubic mismatched ~all pixels)
    tgt_w = min(max(w, tile_size), cw)
    tgt_h = min(max(h, tile_size), ch)
    scale_w, scale_h = tgt_w / w, tgt_h / h
    if scale_w < scale_h:
        nw = tgt_w
        nh = min(math.floor(h * scale_w) or 1, tgt_h)
    else:
        nh = tgt_h
        nw = min(math.floor(w * scale_h) or 1, tgt_w)
    img = img.resize((nw, nh), Image.BILINEAR)
    canvas = np.zeros((ch, cw, 3), np.float32)
    canvas[:nh, :nw] = np.asarray(img, np.float32) / 255.0
    canvas = (canvas - mean) / std
    x = canvas.transpose(2, 0, 1)  # [3, ch, cw]
    tiles = (
        x.reshape(3, th, tile_size, tw, tile_size)
        .transpose(1, 3, 0, 2, 4)
        .reshape(th * tw, 3, tile_size, tile_size)
    )
    n = th * tw
    out = np.zeros((max_tiles, 3, tile_size, tile_size), np.float32)
    out[:n] = tiles
    return out, ar_id, n
