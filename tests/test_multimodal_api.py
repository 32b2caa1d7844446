"""Image decoding/preprocessing + OpenAI chat content-part extraction."""

import asyncio
import base64
import io
import types

import numpy as np
import pytest

from scratchpad_tpu.multimodal import decode_image, preprocess_clip


def make_png(w=40, h=30, color=(200, 30, 60)):
    from PIL import Image

    img = Image.new("RGB", (w, h), color)
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return buf.getvalue()


class TestDecodeImage:
    def test_data_url(self):
        b64 = base64.b64encode(make_png()).decode()
        img = decode_image(f"data:image/png;base64,{b64}")
        assert img.size == (40, 30)

    def test_raw_base64(self):
        img = decode_image(base64.b64encode(make_png()).decode())
        assert img.size == (40, 30)

    def test_local_path(self, tmp_path):
        p = tmp_path / "x.png"
        p.write_bytes(make_png())
        assert decode_image(str(p)).size == (40, 30)

    def test_remote_rejected(self):
        with pytest.raises(ValueError, match="egress"):
            decode_image("https://example.com/cat.png")

    def test_garbage_rejected(self):
        with pytest.raises(ValueError):
            decode_image("not an image at all!!")


class TestPreprocess:
    def test_shape_and_normalization(self):
        img = decode_image(base64.b64encode(make_png(100, 60)).decode())
        x = preprocess_clip(img, 24)
        assert x.shape == (3, 24, 24)
        # solid color -> constant per channel, matches CLIP normalisation
        from scratchpad_tpu.multimodal.image import CLIP_MEAN, CLIP_STD

        want = (np.array([200, 30, 60]) / 255.0 - CLIP_MEAN) / CLIP_STD
        np.testing.assert_allclose(x[:, 0, 0], want, atol=2e-2)

    def test_upscales_small_images(self):
        img = decode_image(base64.b64encode(make_png(8, 6)).decode())
        assert preprocess_clip(img, 24).shape == (3, 24, 24)


class TestChatExtraction:
    def make_app(self):
        from scratchpad_tpu.config import ServerArgs
        from scratchpad_tpu.server.http_server import ServerApp

        app = ServerApp.__new__(ServerApp)
        app._mm_pool = None
        app.args = ServerArgs(preset="tiny-debug", random_weights=True).resolve()
        app.engine = types.SimpleNamespace(
            model_config=types.SimpleNamespace(
                multimodal={"vision_config": {"image_size": 24}}
            ),
            preprocess_image=lambda img: preprocess_clip(img, 24),
        )
        return app

    def test_extract_images_from_parts(self):
        from scratchpad_tpu.server.openai_api.protocol import ChatMessage

        app = self.make_app()
        b64 = base64.b64encode(make_png()).decode()
        msgs = [
            ChatMessage(role="system", content="be brief"),
            ChatMessage(
                role="user",
                content=[
                    {"type": "text", "text": "what is this? "},
                    {
                        "type": "image_url",
                        "image_url": {"url": f"data:image/png;base64,{b64}"},
                    },
                    {"type": "text", "text": " thanks"},
                ],
            ),
        ]
        px, video = asyncio.run(app._extract_images(msgs))
        assert px.shape == (1, 3, 24, 24)
        assert video is None
        assert msgs[1].content == "what is this? <image> thanks"
        assert msgs[0].content == "be brief"  # plain strings untouched

    def test_no_images_returns_none(self):
        from scratchpad_tpu.server.openai_api.protocol import ChatMessage

        app = self.make_app()
        msgs = [ChatMessage(role="user", content=[{"type": "text", "text": "hi"}])]
        assert asyncio.run(app._extract_images(msgs)) == (None, None)
        assert msgs[0].content == "hi"


    def test_extract_video_from_parts(self):
        import io

        from PIL import Image

        from scratchpad_tpu.server.openai_api.protocol import ChatMessage

        app = self.make_app()
        frames = [Image.new("RGB", (24, 24), (i * 20, 0, 0)) for i in range(6)]
        buf = io.BytesIO()
        frames[0].save(buf, format="GIF", save_all=True, append_images=frames[1:])
        b64 = base64.b64encode(buf.getvalue()).decode()
        msgs = [
            ChatMessage(
                role="user",
                content=[
                    {"type": "text", "text": "describe "},
                    {"type": "video_url",
                     "video_url": {"url": f"data:video/gif;base64,{b64}"}},
                ],
            ),
        ]
        px, video = asyncio.run(app._extract_images(msgs))
        assert px is None
        assert video.shape == (6, 3, 24, 24)
        assert msgs[0].content == "describe <video>"


class TestAsyncPreprocessing:
    """Multimodal preprocessing must run OFF the event loop and in parallel
    across images (VERDICT r3 item 8; reference runs it in an async
    executor pool, managers/image_processor.py:599)."""

    def test_images_preprocess_concurrently(self):
        import time

        from scratchpad_tpu.config import ServerArgs
        from scratchpad_tpu.server.http_server import ServerApp
        from scratchpad_tpu.server.openai_api.protocol import ChatMessage

        delay = 0.15

        def slow_preprocess(img):
            time.sleep(delay)
            return preprocess_clip(img, 24)

        app = ServerApp.__new__(ServerApp)
        app._mm_pool = None
        app.args = ServerArgs(preset="tiny-debug", random_weights=True).resolve()
        app.engine = types.SimpleNamespace(preprocess_image=slow_preprocess)

        b64 = base64.b64encode(make_png()).decode()
        n = 4
        msgs = [
            ChatMessage(
                role="user",
                content=[
                    {
                        "type": "image_url",
                        "image_url": {"url": f"data:image/png;base64,{b64}"},
                    }
                    for _ in range(n)
                ],
            )
        ]

        async def drive():
            # the event loop must stay responsive while images decode: a
            # heartbeat task ticking every 10 ms proves nothing blocks it
            ticks = []

            async def heartbeat():
                while True:
                    ticks.append(time.perf_counter())
                    await asyncio.sleep(0.01)

            hb = asyncio.ensure_future(heartbeat())
            t0 = time.perf_counter()
            px, video = await app._extract_images(msgs)
            wall = time.perf_counter() - t0
            hb.cancel()
            return px, wall, len(ticks)

        px, wall, n_ticks = asyncio.run(drive())
        assert px.shape == (n, 3, 24, 24)
        # serial would be >= n * delay; the pool runs all n together
        assert wall < (n - 1) * delay, f"preprocessing serialized: {wall:.2f}s"
        # the loop kept ticking while workers slept
        assert n_ticks >= int(delay / 0.01) - 2
