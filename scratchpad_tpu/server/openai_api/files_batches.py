"""OpenAI files + batches endpoints.

Parity with the reference's /v1/files and /v1/batches surface
(reference: scratchpad/server/server.py:63-221, openai_api/handler.py):
upload a JSONL of chat/completion requests, run them through the engine in
the background, download the JSONL of results.
"""

from __future__ import annotations

import asyncio
import json
import time
import uuid
from typing import Any

from aiohttp import web


class FilesAndBatches:
    def __init__(self, server_app):
        self.app = server_app
        self.files: dict[str, dict[str, Any]] = {}  # id -> {meta, content}
        self.batches: dict[str, dict[str, Any]] = {}

    def add_routes(self, router) -> None:
        router.add_post("/v1/files", self.upload_file)
        router.add_get("/v1/files/{file_id}", self.get_file)
        router.add_get("/v1/files/{file_id}/content", self.get_file_content)
        router.add_delete("/v1/files/{file_id}", self.delete_file)
        router.add_post("/v1/batches", self.create_batch)
        router.add_get("/v1/batches/{batch_id}", self.get_batch)
        router.add_post("/v1/batches/{batch_id}/cancel", self.cancel_batch)

    # ------------------------------------------------------------------ files

    async def upload_file(self, request) -> web.Response:
        reader = await request.multipart()
        purpose, content, filename = "batch", b"", "upload.jsonl"
        async for part in reader:
            if part.name == "purpose":
                purpose = (await part.read()).decode()
            elif part.name == "file":
                filename = part.filename or filename
                content = await part.read()
        fid = f"file-{uuid.uuid4().hex}"
        self.files[fid] = {
            "meta": {
                "id": fid,
                "object": "file",
                "bytes": len(content),
                "created_at": int(time.time()),
                "filename": filename,
                "purpose": purpose,
            },
            "content": content,
        }
        return web.json_response(self.files[fid]["meta"])

    async def get_file(self, request) -> web.Response:
        f = self.files.get(request.match_info["file_id"])
        if f is None:
            return web.json_response({"error": "not found"}, status=404)
        return web.json_response(f["meta"])

    async def get_file_content(self, request) -> web.Response:
        f = self.files.get(request.match_info["file_id"])
        if f is None:
            return web.json_response({"error": "not found"}, status=404)
        return web.Response(body=f["content"], content_type="application/octet-stream")

    async def delete_file(self, request) -> web.Response:
        fid = request.match_info["file_id"]
        existed = self.files.pop(fid, None) is not None
        return web.json_response({"id": fid, "object": "file", "deleted": existed})

    # ---------------------------------------------------------------- batches

    async def create_batch(self, request) -> web.Response:
        body = await request.json()
        input_file = body.get("input_file_id")
        endpoint = body.get("endpoint", "/v1/chat/completions")
        if input_file not in self.files:
            return web.json_response({"error": "input_file_id not found"}, status=400)
        bid = f"batch_{uuid.uuid4().hex}"
        batch = {
            "id": bid,
            "object": "batch",
            "endpoint": endpoint,
            "input_file_id": input_file,
            "status": "in_progress",
            "created_at": int(time.time()),
            "output_file_id": None,
            "request_counts": {"total": 0, "completed": 0, "failed": 0},
        }
        self.batches[bid] = batch
        asyncio.create_task(self._run_batch(bid))
        return web.json_response(batch)

    async def _run_batch(self, bid: str) -> None:
        batch = self.batches[bid]
        lines = (
            self.files[batch["input_file_id"]]["content"]
            .decode()
            .strip()
            .splitlines()
        )
        batch["request_counts"]["total"] = len(lines)
        results = []
        for line in lines:
            if batch["status"] == "cancelled":
                return
            try:
                item = json.loads(line)
                resp = await self._run_one(batch["endpoint"], item.get("body", {}))
                results.append(
                    {
                        "id": f"batch_req_{uuid.uuid4().hex[:16]}",
                        "custom_id": item.get("custom_id"),
                        "response": {"status_code": 200, "body": resp},
                        "error": None,
                    }
                )
                batch["request_counts"]["completed"] += 1
            except Exception as e:  # noqa: BLE001
                results.append(
                    {
                        "custom_id": item.get("custom_id") if isinstance(item, dict) else None,
                        "response": None,
                        "error": {"message": str(e)},
                    }
                )
                batch["request_counts"]["failed"] += 1
        out = "\n".join(json.dumps(r) for r in results).encode()
        fid = f"file-{uuid.uuid4().hex}"
        self.files[fid] = {
            "meta": {
                "id": fid,
                "object": "file",
                "bytes": len(out),
                "created_at": int(time.time()),
                "filename": f"{bid}_output.jsonl",
                "purpose": "batch_output",
            },
            "content": out,
        }
        batch["output_file_id"] = fid
        batch["status"] = "completed"
        batch["completed_at"] = int(time.time())

    async def _run_one(self, endpoint: str, body: dict) -> dict:
        from scratchpad_tpu.server.openai_api.protocol import (
            ChatCompletionRequest,
            CompletionRequest,
        )

        if endpoint == "/v1/chat/completions":
            creq = ChatCompletionRequest(**body)
            prompt = self.app._apply_chat_template(creq.messages)
            from scratchpad_tpu.server.http_server import _sampling_from

            sp = _sampling_from(
                creq, creq.max_completion_tokens or creq.max_tokens or 512
            )
            out = await self.app.runner.generate_full(
                prompt=prompt, sampling_params=sp
            )
            return {
                "id": f"chatcmpl-{uuid.uuid4().hex}",
                "object": "chat.completion",
                "choices": [
                    {
                        "index": 0,
                        "message": {"role": "assistant", "content": out.text},
                        "finish_reason": out.finish_reason,
                    }
                ],
                "usage": {
                    "prompt_tokens": out.prompt_tokens,
                    "completion_tokens": out.completion_tokens,
                    "total_tokens": out.prompt_tokens + out.completion_tokens,
                },
            }
        # completions
        from scratchpad_tpu.server.http_server import _sampling_from

        creq = CompletionRequest(**body)
        sp = _sampling_from(creq, creq.max_tokens)
        prompts, idss = self.app._normalize_prompt(creq.prompt)
        out = await self.app.runner.generate_full(
            prompt=prompts[0], input_ids=idss[0], sampling_params=sp
        )
        return {
            "id": f"cmpl-{uuid.uuid4().hex}",
            "object": "text_completion",
            "choices": [
                {"index": 0, "text": out.text, "finish_reason": out.finish_reason}
            ],
            "usage": {
                "prompt_tokens": out.prompt_tokens,
                "completion_tokens": out.completion_tokens,
                "total_tokens": out.prompt_tokens + out.completion_tokens,
            },
        }

    async def get_batch(self, request) -> web.Response:
        b = self.batches.get(request.match_info["batch_id"])
        if b is None:
            return web.json_response({"error": "not found"}, status=404)
        return web.json_response(b)

    async def cancel_batch(self, request) -> web.Response:
        b = self.batches.get(request.match_info["batch_id"])
        if b is None:
            return web.json_response({"error": "not found"}, status=404)
        if b["status"] == "in_progress":
            b["status"] = "cancelled"
        return web.json_response(b)
