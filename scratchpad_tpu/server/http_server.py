"""OpenAI-compatible HTTP server (aiohttp).

Re-creates the reference's FastAPI surface
(reference: scratchpad/server/server.py:63-297,
scratchpad/server/openai_api/handler.py) on aiohttp (FastAPI/uvicorn are not
in the image): /v1/completions, /v1/chat/completions, /v1/models, /health,
/system_info, /metrics, /flush_cache, with SSE streaming.
"""

from __future__ import annotations

import asyncio
import dataclasses
import json
from typing import Optional

from aiohttp import web

from scratchpad_tpu.config import ServerArgs
from scratchpad_tpu.sampling.sampling_params import SamplingParams
from scratchpad_tpu.server.async_runner import AsyncEngineRunner
from scratchpad_tpu.server.engine import Engine, GenerationOutput
from scratchpad_tpu.server.openai_api.protocol import (
    ChatCompletionChoice,
    ChatCompletionRequest,
    ChatCompletionResponse,
    ChatCompletionStreamChoice,
    ChatCompletionStreamResponse,
    ChatMessage,
    CompletionChoice,
    CompletionRequest,
    CompletionResponse,
    DeltaMessage,
    ErrorResponse,
    ModelCard,
    ModelList,
    UsageInfo,
)
from scratchpad_tpu.utils import get_logger

logger = get_logger("http_server")


def _sampling_from(req, max_tokens: int, allow_custom_logit=False) -> SamplingParams:
    # OpenAI logit_bias keys are token-id strings
    bias = (
        {int(k): float(v) for k, v in req.logit_bias.items()}
        if req.logit_bias
        else None
    )
    proc = None
    if getattr(req, "custom_logit_processor", None):
        # deserializing executes arbitrary code: refuse unless the server
        # opted in (reference: --enable-custom-logit-processor gate)
        if not allow_custom_logit:
            raise ValueError(
                "custom_logit_processor requires the server to run with "
                "--enable-custom-logit-processor"
            )
        from scratchpad_tpu.sampling.custom_logit_processor import (
            CustomLogitProcessor,
        )

        proc = CustomLogitProcessor.from_str(req.custom_logit_processor)
    return SamplingParams(
        custom_logit_processor=proc,
        custom_params=getattr(req, "custom_params", None),
        max_new_tokens=max_tokens,
        temperature=req.temperature,
        top_p=req.top_p,
        top_k=req.top_k,
        min_p=req.min_p,
        frequency_penalty=req.frequency_penalty,
        presence_penalty=req.presence_penalty,
        repetition_penalty=req.repetition_penalty,
        stop=req.stop,
        ignore_eos=req.ignore_eos,
        skip_special_tokens=req.skip_special_tokens,
        regex=req.regex,
        ebnf=req.ebnf,
        json_schema=req.json_schema,
        logit_bias=bias,
    )


def _usage(out: GenerationOutput) -> UsageInfo:
    return UsageInfo(
        prompt_tokens=out.prompt_tokens,
        completion_tokens=out.completion_tokens,
        total_tokens=out.prompt_tokens + out.completion_tokens,
        prompt_tokens_details={"cached_tokens": out.cached_tokens},
    )


class ServerApp:
    def __init__(self, engine: Engine, args: ServerArgs):
        self.engine = engine
        self.args = args
        self.runner = AsyncEngineRunner(engine)
        self.app = web.Application(middlewares=[self._auth_middleware])
        self._mm_pool = None  # lazy multimodal preprocessing executor
        self._metrics = None
        if args.enable_metrics:
            from scratchpad_tpu.server.metrics import ServerMetrics

            self._metrics = ServerMetrics(engine)
        self._add_routes()

    # ---------------------------------------------------------------- routes

    def _add_routes(self) -> None:
        r = self.app.router
        r.add_get("/", self.dashboard)
        r.add_get("/health", self.health)
        r.add_get("/health_generate", self.health_generate)
        r.add_get("/v1/models", self.list_models)
        r.add_get("/system_info", self.system_info)
        r.add_post("/v1/completions", self.completions)
        r.add_post("/v1/chat/completions", self.chat_completions)
        r.add_post("/flush_cache", self.flush_cache)
        r.add_post("/memory_pool", self.memory_pool)
        r.add_post("/abort_request", self.abort_request)
        r.add_post("/start_profile", self.start_profile)
        r.add_post("/stop_profile", self.stop_profile)
        r.add_post("/update_weights", self.update_weights)
        r.add_post("/v1/embeddings", self.embeddings)
        from scratchpad_tpu.server.openai_api.files_batches import FilesAndBatches

        self.files_batches = FilesAndBatches(self)
        self.files_batches.add_routes(r)
        if self._metrics is not None:
            r.add_get("/metrics", self._metrics.handle)

    @web.middleware
    async def _auth_middleware(self, request, handler):
        if self.args.api_key and request.path.startswith("/v1"):
            auth = request.headers.get("Authorization", "")
            if auth != f"Bearer {self.args.api_key}":
                return web.json_response(
                    ErrorResponse(message="invalid api key", code=401).model_dump(),
                    status=401,
                )
        return await handler(request)

    async def dashboard(self, request) -> web.Response:
        """Live metrics page (reference: server.py:76-79 metrics_ui.html)."""
        from scratchpad_tpu.server.metrics_ui import DASHBOARD_HTML

        return web.Response(text=DASHBOARD_HTML, content_type="text/html")

    async def health(self, request) -> web.Response:
        return web.json_response({"status": "ok"})

    async def health_generate(self, request) -> web.Response:
        out = await self.runner.generate_full(
            input_ids=[1, 2, 3],
            sampling_params=SamplingParams(max_new_tokens=1, temperature=0.0),
        )
        return web.json_response({"status": "ok", "tokens": out.completion_tokens})

    async def list_models(self, request) -> web.Response:
        return web.json_response(
            ModelList(
                data=[ModelCard(id=self.args.served_model_name)]
            ).model_dump()
        )

    async def system_info(self, request) -> web.Response:
        sched = self.engine.scheduler
        return web.json_response(
            {
                "model": self.args.served_model_name,
                "version": __import__("scratchpad_tpu").__version__,
                "num_running": sched.num_running(),
                "num_waiting": sched.num_queued(),
                "kv_pages_free": sched.allocator.available_pages,
                "kv_pages_total": sched.allocator.num_pages,
                "radix_evictable_pages": sched.tree_cache.evictable_pages,
                "generated_tokens": sched.num_generated_tokens,
                "retractions": sched.num_retractions,
                "spec_steps": sched.num_spec_steps,
                "spec_accepted_tokens": sched.num_spec_accepted,
                "host_kv_stored_pages": (
                    sched.host_tier.stored_pages if sched.host_tier else 0
                ),
                "host_kv_restored_pages": (
                    sched.host_tier.restored_pages if sched.host_tier else 0
                ),
                "args": {
                    k: v
                    for k, v in dataclasses.asdict(self.args).items()
                    if isinstance(v, (int, float, str, bool, type(None)))
                },
            }
        )

    async def flush_cache(self, request) -> web.Response:
        if self.engine.scheduler.has_work():
            return web.json_response(
                {"status": "busy"}, status=409
            )
        self.engine.flush_cache()
        return web.json_response({"status": "ok"})

    async def memory_pool(self, request) -> web.Response:
        """Runtime KV-pool grow/shrink (reference: /memory_pool/increase,
        server/controller/controller.py:24-97)."""
        body = await request.json()
        tokens = body.get("max_total_tokens")
        if not isinstance(tokens, int) or tokens <= 0:
            return self._bad_request("max_total_tokens (positive int) required")
        if self.engine.scheduler.has_work():
            return web.json_response({"status": "busy"}, status=409)
        try:
            new = self.engine.resize_kv_pool(tokens)
        except (RuntimeError, ValueError) as e:
            return web.json_response(
                {"status": "error", "message": str(e)}, status=409
            )
        return web.json_response({"status": "ok", "max_total_tokens": new})

    async def abort_request(self, request) -> web.Response:
        body = await request.json()
        self.engine.scheduler.abort_request(body.get("rid", ""))
        return web.json_response({"status": "ok"})

    async def update_weights(self, request) -> web.Response:
        """In-place weight reload (reference: UpdateWeightReqInput)."""
        body = await request.json()
        path = body.get("model_path")
        if not path:
            return self._bad_request("model_path required")
        if self.engine.scheduler.has_work():
            return web.json_response({"status": "busy"}, status=409)
        ok, msg = self.engine.update_weights(model_path=path)
        return web.json_response(
            {"status": "ok" if ok else "error", "message": msg},
            status=200 if ok else 500,
        )

    async def start_profile(self, request) -> web.Response:
        """jax.profiler trace start (reference: ProfileReq,
        scheduler.py:487-491 + SP_TORCH_PROFILER_DIR)."""
        import jax

        body = await request.json() if request.can_read_body else {}
        out_dir = body.get("output_dir", "/tmp/sptpu_profile")
        try:
            jax.profiler.start_trace(out_dir)
        except Exception as e:  # already running etc.
            return self._bad_request(str(e))
        self._profile_dir = out_dir
        return web.json_response({"status": "ok", "output_dir": out_dir})

    async def stop_profile(self, request) -> web.Response:
        import jax

        try:
            jax.profiler.stop_trace()
        except Exception as e:
            return self._bad_request(str(e))
        return web.json_response(
            {"status": "ok", "output_dir": getattr(self, "_profile_dir", None)}
        )

    async def embeddings(self, request) -> web.Response:
        """/v1/embeddings (reference: handler.py:1578 v1_embeddings)."""
        from scratchpad_tpu.server.openai_api.protocol import EmbeddingRequest

        try:
            ereq = EmbeddingRequest(**await request.json())
        except Exception as e:
            return self._bad_request(str(e))
        inputs = ereq.input
        if isinstance(inputs, str):
            items = [("prompt", inputs)]
        elif inputs and isinstance(inputs[0], int):
            items = [("ids", inputs)]
        elif inputs and isinstance(inputs[0], str):
            items = [("prompt", x) for x in inputs]
        else:
            items = [("ids", x) for x in inputs]
        if self.engine.tokenizer is None and any(k == "prompt" for k, _ in items):
            return self._bad_request("no tokenizer loaded; send token ids")
        embs = await asyncio.gather(
            *[
                self.runner.encode(
                    prompt=val if kind == "prompt" else None,
                    input_ids=val if kind == "ids" else None,
                )
                for kind, val in items
            ]
        )
        data = [
            {
                "object": "embedding",
                "index": i,
                "embedding": [float(x) for x in e],
            }
            for i, e in enumerate(embs)
        ]
        return web.json_response(
            {
                "object": "list",
                "data": data,
                "model": ereq.model,
                "usage": {"prompt_tokens": 0, "total_tokens": 0},
            }
        )

    # ----------------------------------------------------------- completions

    async def completions(self, request) -> web.Response:
        try:
            creq = CompletionRequest(**await request.json())
        except Exception as e:
            return self._bad_request(str(e))
        prompts, idss = self._normalize_prompt(creq.prompt)
        if self.engine.tokenizer is None and any(p is not None for p in prompts):
            return self._bad_request(
                "no tokenizer loaded; send token-id prompts"
            )
        try:
            sp = _sampling_from(
                creq, creq.max_tokens,
                allow_custom_logit=self.args.enable_custom_logit_processor,
            )
        except ValueError as e:
            return self._bad_request(str(e))
        if creq.stream:
            return await self._stream_completion(request, creq, prompts, idss, sp)
        choices = []
        usage = UsageInfo()
        outs = await asyncio.gather(
            *[
                self.runner.generate_full(
                    prompt=p,
                    input_ids=i,
                    sampling_params=sp,
                    return_logprob=creq.logprobs is not None,
                )
                for p, i in zip(prompts, idss)
                for _ in range(creq.n)
            ]
        )
        # echo + logprobs: prompt-token logprobs via a teacher-forcing
        # scoring pass (the lm-eval loglikelihood primitive; reference
        # quality loop: cli/sp.py:59-68 drives served prompt logprobs)
        prompt_lps = [None] * len(prompts)
        if creq.echo and creq.logprobs is not None:
            tok = self.engine.tokenizer
            all_ids = [
                i if i is not None else tok.encode(p)
                for p, i in zip(prompts, idss)
            ]
            prompt_lps = await asyncio.gather(
                *[self.runner.score(ids) for ids in all_ids]
            )
            idss = all_ids
        for idx, out in enumerate(outs):
            text = out.text
            pidx = idx // creq.n
            if creq.echo and prompts[pidx] is not None:
                text = prompts[pidx] + text
            lp = self._logprobs_block(out, creq.logprobs)
            if lp is not None and prompt_lps[pidx] is not None:
                ids = idss[pidx]
                # the first prompt token has no conditional logprob
                lp["token_logprobs"] = (
                    [None] + prompt_lps[pidx] + lp["token_logprobs"]
                )
                lp["tokens"] = [str(t) for t in ids] + lp["tokens"]
            choices.append(
                CompletionChoice(
                    index=idx,
                    text=text,
                    finish_reason=out.finish_reason,
                    logprobs=lp,
                )
            )
            usage.prompt_tokens += out.prompt_tokens
            usage.completion_tokens += out.completion_tokens
        usage.total_tokens = usage.prompt_tokens + usage.completion_tokens
        resp = CompletionResponse(model=creq.model, choices=choices, usage=usage)
        return web.json_response(resp.model_dump())

    async def _stream_completion(self, request, creq, prompts, idss, sp):
        resp = web.StreamResponse(
            headers={
                "Content-Type": "text/event-stream",
                "Cache-Control": "no-cache",
            }
        )
        await resp.prepare(request)
        cid = None
        async for kind, payload in self.runner.generate(
            prompt=prompts[0], input_ids=idss[0], sampling_params=sp,
            stream=True,
        ):
            if kind == "delta":
                chunk = CompletionResponse(
                    model=creq.model,
                    choices=[CompletionChoice(index=0, text=payload)],
                )
                cid = cid or chunk.id
                chunk.id = cid
                await resp.write(
                    f"data: {chunk.model_dump_json()}\n\n".encode()
                )
            elif kind == "done":
                out: GenerationOutput = payload
                chunk = CompletionResponse(
                    id=cid or "cmpl-x",
                    model=creq.model,
                    choices=[
                        CompletionChoice(
                            index=0, text="", finish_reason=out.finish_reason
                        )
                    ],
                    usage=_usage(out),
                )
                await resp.write(f"data: {chunk.model_dump_json()}\n\n".encode())
        await resp.write(b"data: [DONE]\n\n")
        await resp.write_eof()
        return resp

    def _normalize_prompt(self, prompt):
        if isinstance(prompt, str):
            return [prompt], [None]
        if isinstance(prompt, list) and prompt and isinstance(prompt[0], int):
            return [None], [prompt]
        if isinstance(prompt, list) and prompt and isinstance(prompt[0], str):
            return list(prompt), [None] * len(prompt)
        if isinstance(prompt, list) and prompt and isinstance(prompt[0], list):
            return [None] * len(prompt), list(prompt)
        return [prompt or ""], [None]

    def _logprobs_block(self, out: GenerationOutput, want: Optional[int]):
        if want is None:
            return None
        return {
            "token_logprobs": list(out.output_token_logprobs or []),
            "top_logprobs": None,
            "tokens": [str(t) for t in out.output_ids],
            "text_offset": [],
        }

    # ------------------------------------------------------ chat completions

    def _mm_executor(self):
        """Shared thread pool for multimodal preprocessing — image/video
        decode+resize runs OFF the event loop so vision-heavy requests don't
        serialize behind each other or stall token streaming (reference runs
        the same work in an async executor pool,
        managers/image_processor.py:599)."""
        if self._mm_pool is None:
            from concurrent.futures import ThreadPoolExecutor

            self._mm_pool = ThreadPoolExecutor(
                max_workers=self.args.mm_preprocess_workers,
                thread_name_prefix="mm-prep",
            )
        return self._mm_pool

    def _decode_preprocess_image(self, src):
        from scratchpad_tpu.multimodal import decode_image

        return self.engine.preprocess_image(decode_image(src))

    def _decode_preprocess_video(self, src):
        import numpy as np

        from scratchpad_tpu.multimodal.video import decode_video

        frames = decode_video(src, num_frames=self.args.video_frames)
        return np.stack([self.engine.preprocess_image(f) for f in frames])

    async def _extract_images(self, messages: list[ChatMessage]):
        """Flatten OpenAI content parts: image_url parts (data:/base64/local
        path) become the model's image token in the text stream and their
        pixel values are returned for the vision encoder; video_url parts
        decode + uniformly sample frames (multimodal/video.py; reference:
        managers/image_processor.py:20 encode_video). Returns
        (images [N,C,H,W] | None, video_frames [T,C,H,W] | None).

        The CPU-heavy decode/resize work is scheduled on the shared thread
        pool and awaited concurrently (all images of a request in parallel,
        the event loop free throughout)."""
        import asyncio

        loop = asyncio.get_running_loop()
        img_futs = []
        video_fut = None
        for m in messages:
            if not isinstance(m.content, list):
                continue
            texts = []
            for part in m.content:
                ptype = part.get("type")
                if ptype == "text":
                    texts.append(part.get("text", ""))
                elif ptype in ("image_url", "image"):
                    url = part.get("image_url")
                    if isinstance(url, dict):
                        url = url.get("url")
                    img_futs.append(
                        loop.run_in_executor(
                            self._mm_executor(),
                            self._decode_preprocess_image,
                            url if url else part.get("image"),
                        )
                    )
                    texts.append(self.args.mm_image_token)
                elif ptype in ("video_url", "video"):
                    if video_fut is not None:
                        raise ValueError("one video per request")
                    url = part.get("video_url")
                    if isinstance(url, dict):
                        url = url.get("url")
                    video_fut = loop.run_in_executor(
                        self._mm_executor(),
                        self._decode_preprocess_video,
                        url if url else part.get("video"),
                    )
                    texts.append(self.args.mm_video_token)
            m.content = "".join(texts)
        images = list(await asyncio.gather(*img_futs)) if img_futs else []
        video = (await video_fut) if video_fut is not None else None
        import numpy as np

        if images and video is not None:
            raise ValueError("a request carries images OR one video (v1)")
        if images and isinstance(images[0], tuple):
            # tiled Mllama preprocessing returns (tiles, ar_id, n_tiles)
            if len(images) > 1:
                raise ValueError("one tiled image per request (Mllama v1)")
            return images[0], video
        return (np.stack(images) if images else None), video

    def _apply_chat_template(self, messages: list[ChatMessage]) -> str:
        tok = self.engine.tokenizer
        dicts = []
        for m in messages:
            d = {"role": m.role, "content": m.content}
            if m.tool_calls:
                d["tool_calls"] = m.tool_calls
            dicts.append(d)
        if tok is not None and getattr(tok, "chat_template", None):
            return tok.apply_chat_template(
                dicts, tokenize=False, add_generation_prompt=True
            )
        # named/inferred fallback template (reference: conversation.py)
        from scratchpad_tpu.server.openai_api.conversation import get_template

        conv = get_template(
            self.args.chat_template, self.args.served_model_name
        )
        return conv.render(dicts)

    async def chat_completions(self, request) -> web.Response:
        try:
            creq = ChatCompletionRequest(**await request.json())
        except Exception as e:
            return self._bad_request(str(e))
        if self.engine.tokenizer is None:
            return self._bad_request("no tokenizer loaded; chat API unavailable")
        try:
            image_data, video_data = await self._extract_images(creq.messages)
        except (ValueError, TypeError) as e:
            return self._bad_request(str(e))
        prompt = self._apply_chat_template(creq.messages)
        max_tokens = creq.max_completion_tokens or creq.max_tokens or 512
        try:
            sp = _sampling_from(
                creq, max_tokens,
                allow_custom_logit=self.args.enable_custom_logit_processor,
            )
        except ValueError as e:
            return self._bad_request(str(e))
        if creq.response_format and creq.response_format.type == "json_object":
            sp.json_schema = "true"  # generic JSON grammar
        elif creq.response_format and creq.response_format.type == "json_schema":
            sp.json_schema = json.dumps(
                (creq.response_format.json_schema or {}).get("schema", {})
            )
        elif creq.response_format and creq.response_format.type == "structural_tag":
            sp.structural_tag = json.dumps(
                {
                    "structures": [
                        s.model_dump(by_alias=True)
                        for s in (creq.response_format.structures or [])
                    ],
                    "triggers": creq.response_format.triggers or [],
                }
            )
        if creq.stream:
            return await self._stream_chat(
                request, creq, prompt, sp, image_data=image_data,
                video_data=video_data,
            )
        outs = await asyncio.gather(
            *[
                self.runner.generate_full(
                    prompt=prompt, sampling_params=sp, image_data=image_data,
                    video_data=video_data,
                )
                for _ in range(creq.n)
            ]
        )
        from scratchpad_tpu.server.openai_api.function_call_parser import (
            FunctionCallParser,
        )
        from scratchpad_tpu.server.openai_api.reasoning_parser import (
            split_reasoning,
        )

        choices = []
        usage = UsageInfo()
        for idx, out in enumerate(outs):
            reasoning, visible = split_reasoning(out.text)
            tool_calls = None
            finish = out.finish_reason
            if creq.tools:
                parsed = FunctionCallParser(creq.tools).parse(visible)
                if parsed.calls:
                    tool_calls = [
                        c.to_openai(i) for i, c in enumerate(parsed.calls)
                    ]
                    visible = parsed.normal_text or None
                    finish = "tool_calls"
            choices.append(
                ChatCompletionChoice(
                    index=idx,
                    message=ChatMessage(
                        role="assistant",
                        content=visible,
                        tool_calls=tool_calls,
                        reasoning_content=reasoning,
                    ),
                    finish_reason=finish,
                )
            )
            usage.prompt_tokens += out.prompt_tokens
            usage.completion_tokens += out.completion_tokens
        usage.total_tokens = usage.prompt_tokens + usage.completion_tokens
        resp = ChatCompletionResponse(
            model=creq.model, choices=choices, usage=usage
        )
        return web.json_response(resp.model_dump())

    async def _stream_chat(
        self, request, creq, prompt, sp, image_data=None, video_data=None
    ):
        resp = web.StreamResponse(
            headers={
                "Content-Type": "text/event-stream",
                "Cache-Control": "no-cache",
            }
        )
        await resp.prepare(request)
        first = True
        cid = None
        # incremental tool-call extraction over the streamed text
        # (reference: function_call_parser.py:141 parse_streaming_increment)
        tool_parser = None
        if creq.tools:
            from scratchpad_tpu.server.openai_api.function_call_parser import (
                StreamingToolParser,
            )

            tool_parser = StreamingToolParser(creq.tools)
        # incremental <think> separation ahead of the tool parser: think
        # spans stream as reasoning_content deltas, the remainder flows on
        # as content (reference: reasoning_parser.py:47 streaming mode)
        reasoning_parser = None
        if self.args.reasoning_parser:
            from scratchpad_tpu.server.openai_api.reasoning_parser import (
                StreamingReasoningParser,
            )

            reasoning_parser = StreamingReasoningParser(
                force_reasoning=self.args.reasoning_parser == "deepseek-r1",
                stream_reasoning=self.args.stream_reasoning,
            )

        async def _send(delta: DeltaMessage, finish=None, usage=None):
            nonlocal first, cid
            if first:
                delta.role = "assistant"
                first = False
            chunk = ChatCompletionStreamResponse(
                model=creq.model,
                choices=[
                    ChatCompletionStreamChoice(
                        index=0, delta=delta, finish_reason=finish
                    )
                ],
                usage=usage,
            )
            cid = cid or chunk.id
            chunk.id = cid
            await resp.write(f"data: {chunk.model_dump_json()}\n\n".encode())

        async def _send_increment(res):
            if res.normal_text:
                await _send(DeltaMessage(content=res.normal_text))
            for d in res.deltas:
                await _send(DeltaMessage(tool_calls=[d]))

        async def _send_content(text):
            if not text:
                return
            if tool_parser is not None:
                await _send_increment(tool_parser.feed(text))
            else:
                await _send(DeltaMessage(content=text))

        async for kind, payload in self.runner.generate(
            prompt=prompt, sampling_params=sp, stream=True,
            image_data=image_data, video_data=video_data,
        ):
            if kind == "delta":
                if reasoning_parser is not None:
                    r, c = reasoning_parser.feed(payload)
                    if r:
                        await _send(DeltaMessage(reasoning_content=r))
                    await _send_content(c)
                else:
                    await _send_content(payload)
            elif kind == "done":
                out: GenerationOutput = payload
                finish = out.finish_reason
                if reasoning_parser is not None:
                    r, c = reasoning_parser.finish()
                    if r:
                        await _send(DeltaMessage(reasoning_content=r))
                    await _send_content(c)
                if tool_parser is not None:
                    await _send_increment(tool_parser.finish())
                    if tool_parser.saw_tool_call:
                        finish = "tool_calls"
                await _send(DeltaMessage(), finish=finish, usage=_usage(out))
        await resp.write(b"data: [DONE]\n\n")
        await resp.write_eof()
        return resp

    def _bad_request(self, msg: str) -> web.Response:
        return web.json_response(
            ErrorResponse(message=msg).model_dump(), status=400
        )


def launch_server(args: ServerArgs, engine: Optional[Engine] = None) -> None:
    """Blocking server entry (reference: server/server.py:223 launch_server)."""
    args = args.resolve()
    engine = engine or Engine(args)
    if args.warmup_capture:
        import jax

        if jax.default_backend() != "cpu":
            # pre-compile the decode AND extend bucket ladders before
            # accepting traffic (the CUDA-graph-capture-at-init analogue,
            # reference: model_executor/model_runner.py:490
            # init_cuda_graphs) — first requests otherwise stall on
            # minutes of remote compiles / per-boot deserialization
            # (SERVING_r04.json: TTFT ~10 s from exactly this)
            engine.scheduler.runner.capture(decode_only=False)
    app = ServerApp(engine, args)
    logger.info("serving %s on %s:%d", args.served_model_name, args.host, args.port)
    web.run_app(app.app, host=args.host, port=args.port, print=None)
