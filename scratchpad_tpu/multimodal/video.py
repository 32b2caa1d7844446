"""Video decoding + uniform frame sampling for VLM requests.

Analogue of the reference's ``encode_video`` helper
(reference: scratchpad/managers/image_processor.py:20-68, which uses
decord): decode a video payload and sample ``num_frames`` uniformly. This
image ships OpenCV (decord is absent), so mp4/webm/avi ride
``cv2.VideoCapture``; animated GIF/WEBP/APNG decode through PIL directly.
Sources: local path, ``data:`` URL, raw base64, or bytes. Remote URLs are
rejected (no egress).
"""

from __future__ import annotations

import base64
import io
import os
import tempfile


def _pil_frames(data: bytes):
    """Animated-image decode via PIL; returns list of RGB PIL Images."""
    from PIL import Image, ImageSequence

    img = Image.open(io.BytesIO(data))
    return [f.convert("RGB") for f in ImageSequence.Iterator(img)]


def _cv2_frames(path: str):
    import cv2
    from PIL import Image

    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise ValueError(f"cv2 cannot open video {path!r}")
    frames = []
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        frames.append(Image.fromarray(frame[:, :, ::-1]))  # BGR -> RGB
    cap.release()
    if not frames:
        raise ValueError("video decoded to zero frames")
    return frames


def _sample(frames: list, num_frames: int) -> list:
    """Uniform temporal sampling (reference encode_video's scheme)."""
    n = len(frames)
    if n <= num_frames:
        return list(frames)
    idx = [round(i * (n - 1) / (num_frames - 1)) for i in range(num_frames)]
    return [frames[i] for i in idx]


def decode_video(src, num_frames: int = 8) -> list:
    """video source -> ``num_frames`` uniformly-sampled RGB PIL frames."""
    data = None
    path = None
    if isinstance(src, (bytes, bytearray)):
        data = bytes(src)
    elif isinstance(src, str):
        if src.startswith("data:"):
            data = base64.b64decode(src.split(",", 1)[1])
        elif src.startswith(("http://", "https://")):
            raise ValueError(
                "remote video URLs are not fetched (no egress); send a "
                "data: URL or base64 payload"
            )
        elif os.path.exists(src):
            path = src
        else:
            data = base64.b64decode(src)
    else:
        raise TypeError(f"unsupported video source {type(src)}")

    if data is not None and (
        data[:3] == b"GIF"
        or data[:4] == b"\x89PNG"
        or (data[:4] == b"RIFF" and data[8:12] == b"WEBP")
    ):
        return _sample(_pil_frames(data), num_frames)
    if data is not None:
        # cv2 wants a file; spill the payload
        with tempfile.NamedTemporaryFile(suffix=".mp4", delete=False) as f:
            f.write(data)
            path = f.name
        try:
            return _sample(_cv2_frames(path), num_frames)
        finally:
            os.unlink(path)
    if path.lower().endswith((".gif", ".webp", ".apng", ".png")):
        with open(path, "rb") as f:
            return _sample(_pil_frames(f.read()), num_frames)
    return _sample(_cv2_frames(path), num_frames)
