"""Chat-endpoint HTTP tests: streamed tool-call deltas, structural_tag,
logit_bias (VERDICT round-1 items; reference: server/openai_api/
function_call_parser.py streaming contract, protocol.py:39 structural_tag).

Uses a char-level tokenizer so the tiny random model can serve chat, and a
regex constraint to force a deterministic tool-call surface string.
"""

import asyncio
import json
import socket
import threading

import httpx
import pytest

from scratchpad_tpu.config import ServerArgs
from scratchpad_tpu.server.engine import Engine
from scratchpad_tpu.server.http_server import ServerApp


class CharTokenizer:
    """Toy char-level tokenizer: id = ord(char)+1, eos = 0."""

    eos_token_id = 0
    chat_template = None

    def encode(self, text):
        return [ord(c) + 1 for c in text]

    def decode(self, ids, **kw):
        return "".join(chr(i - 1) for i in ids if 0 < i <= 256)

    def get_vocab(self):
        raise AttributeError("no vocab")

    def __call__(self, *a, **k):
        raise NotImplementedError


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


class _ServerThread:
    def __init__(self, args: ServerArgs):
        self.args = args
        self.loop = None
        self.started = threading.Event()
        self.thread = threading.Thread(target=self._run, daemon=True)
        self.thread.start()
        assert self.started.wait(120), "server failed to start"

    def _run(self):
        from aiohttp import web

        self.loop = asyncio.new_event_loop()
        asyncio.set_event_loop(self.loop)
        engine = Engine(self.args, tokenizer=CharTokenizer())
        self.app = ServerApp(engine, self.args)
        runner = web.AppRunner(self.app.app)
        self.loop.run_until_complete(runner.setup())
        site = web.TCPSite(runner, self.args.host, self.args.port)
        self.loop.run_until_complete(site.start())
        self.started.set()
        self.loop.run_forever()

    def stop(self):
        self.loop.call_soon_threadsafe(self.loop.stop)


@pytest.fixture(scope="module")
def chat_server():
    args = ServerArgs(
        preset="tiny-debug",
        random_weights=True,
        dtype="float32",
        page_size=4,
        max_total_tokens=2048,
        host="127.0.0.1",
        port=_free_port(),
        served_model_name="tiny",
    )
    srv = _ServerThread(args.resolve())
    yield f"http://127.0.0.1:{args.port}"
    srv.stop()


TOOLS = [{"type": "function", "function": {"name": "get_weather"}}]
CALL_TEXT = (
    '<tool_call>\\{"name": "get_weather", '
    '"arguments": \\{"city": "Bern"\\}\\}</tool_call>'
)


class TestStreamedToolCalls:
    def _collect(self, server, body):
        events = []
        with httpx.stream(
            "POST",
            f"{server}/v1/chat/completions",
            json=body,
            timeout=180,
        ) as r:
            assert r.status_code == 200, r.read()
            for line in r.iter_lines():
                if line.startswith("data: ") and line != "data: [DONE]":
                    events.append(json.loads(line[6:]))
        return events

    def test_tool_call_deltas(self, chat_server):
        """A streamed chat completion with tools emits tool_calls deltas:
        first chunk id+name, later chunks argument fragments, finish_reason
        tool_calls."""
        events = self._collect(
            chat_server,
            {
                "model": "tiny",
                "messages": [{"role": "user", "content": "call the tool"}],
                "max_tokens": 80,
                "temperature": 0.0,
                "stream": True,
                "tools": TOOLS,
                # force the surface string so the test is deterministic
                "regex": CALL_TEXT,
            },
        )
        tc_chunks = [
            e["choices"][0]["delta"]["tool_calls"]
            for e in events
            if e["choices"] and e["choices"][0]["delta"].get("tool_calls")
        ]
        assert tc_chunks, "no tool_calls deltas emitted"
        first = tc_chunks[0][0]
        assert first["id"].startswith("call_")
        assert first["function"]["name"] == "get_weather"
        args = "".join(
            c[0]["function"].get("arguments", "") for c in tc_chunks
        )
        assert json.loads(args) == {"city": "Bern"}
        finals = [
            e["choices"][0].get("finish_reason")
            for e in events
            if e["choices"] and e["choices"][0].get("finish_reason")
        ]
        assert finals[-1] == "tool_calls"
        # content deltas must not leak the tool-call syntax
        content = "".join(
            e["choices"][0]["delta"].get("content") or ""
            for e in events
            if e["choices"]
        )
        assert "<tool_call>" not in content

    def test_plain_stream_with_tools_passthrough(self, chat_server):
        """Tools present but model answers in prose: pure content deltas."""
        events = self._collect(
            chat_server,
            {
                "model": "tiny",
                "messages": [{"role": "user", "content": "hi"}],
                "max_tokens": 12,
                "temperature": 0.0,
                "stream": True,
                "tools": TOOLS,
                "regex": "[a-z ]{12}",
            },
        )
        assert not any(
            e["choices"][0]["delta"].get("tool_calls")
            for e in events
            if e["choices"]
        )
        content = "".join(
            e["choices"][0]["delta"].get("content") or ""
            for e in events
            if e["choices"]
        )
        assert len(content) == 12


class TestStructuralTagHTTP:
    def test_response_format(self, chat_server):
        """structural_tag response_format compiles and constrains output."""
        tag = {
            "structures": [
                {"begin": "<f>", "schema": {"type": "boolean"}, "end": "</f>"}
            ],
            "triggers": ["<f>"],
        }
        r = httpx.post(
            f"{chat_server}/v1/chat/completions",
            json={
                "model": "tiny",
                "messages": [{"role": "user", "content": "go"}],
                "max_tokens": 16,
                "temperature": 0.0,
                "response_format": {"type": "structural_tag", **tag},
            },
            timeout=180,
        )
        assert r.status_code == 200, r.text
        text = r.json()["choices"][0]["message"]["content"] or ""
        from scratchpad_tpu.constrained.structural_tag import (
            build_structural_tag_dfa,
        )

        dfa = build_structural_tag_dfa(tag)
        st = dfa.walk(dfa.initial, text)
        assert st >= 0 and dfa.is_accepting(st), text


class TestLogitBiasHTTP:
    def test_completions_logit_bias(self, chat_server):
        """+100 bias on one token id dominates greedy decode."""
        tid = ord("z") + 1
        r = httpx.post(
            f"{chat_server}/v1/completions",
            json={
                "model": "tiny",
                "prompt": "ab",
                "max_tokens": 4,
                "temperature": 0.0,
                "logit_bias": {str(tid): 100.0},
                "ignore_eos": True,
            },
            timeout=180,
        )
        assert r.status_code == 200, r.text
        assert r.json()["choices"][0]["text"] == "zzzz"
