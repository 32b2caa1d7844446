"""Streaming reasoning-content separation.

Covers the reference's incremental reasoning split
(reference: scratchpad/server/openai_api/reasoning_parser.py:47-118
parse_streaming_increment): <think> spans stream as `reasoning_content`
deltas while the remainder streams as `content`, with tags held back
correctly when split across chunk boundaries.
"""

import asyncio
import json
import socket
import threading

import httpx
import pytest

from scratchpad_tpu.config.server_args import ServerArgs
from scratchpad_tpu.server.engine import Engine
from scratchpad_tpu.server.http_server import ServerApp
from scratchpad_tpu.server.openai_api.reasoning_parser import (
    StreamingReasoningParser,
)

from tests.test_server_chat import CharTokenizer, _ServerThread, _free_port


def drive(text, chunk=3, **kw):
    p = StreamingReasoningParser(**kw)
    r_parts, c_parts = [], []
    for i in range(0, len(text), chunk):
        r, c = p.feed(text[i : i + chunk])
        if r:
            r_parts.append(r)
        if c:
            c_parts.append(c)
    r, c = p.finish()
    if r:
        r_parts.append(r)
    if c:
        c_parts.append(c)
    return "".join(r_parts), "".join(c_parts)


class TestStreamingReasoningParser:
    TEXT = "Let me think.<think>step 1\nstep 2</think>Answer: 42"

    def test_chunk_sizes(self):
        for chunk in (1, 2, 3, 5, 7, 17, 1000):
            r, c = drive(self.TEXT, chunk)
            assert r == "step 1\nstep 2", (chunk, r)
            assert c == "Let me think.Answer: 42", (chunk, c)

    def test_tag_split_across_chunks(self):
        p = StreamingReasoningParser()
        r, c = p.feed("abc<thi")
        assert (r, c) == (None, "abc")  # partial tag held back
        r, c = p.feed("nk>xy")
        assert (r, c) == ("xy", "")
        r, c = p.feed("z</thi")
        assert (r, c) == ("z", "")
        r, c = p.feed("nk>done")
        assert (r, c) == (None, "done")

    def test_forced_reasoning_r1_style(self):
        # R1 templates open the tag in the prompt: output is reasoning
        # until the closing tag, with no opening tag in the stream
        for chunk in (1, 3, 9, 1000):
            r, c = drive(
                "chain of thought</think>final", chunk, force_reasoning=True
            )
            assert r == "chain of thought"
            assert c == "final"

    def test_forced_swallows_redundant_open_tag(self):
        r, c = drive("<think>why</think>yes", 2, force_reasoning=True)
        assert r == "why"
        assert c == "yes"

    def test_unclosed_think_flushes_as_reasoning(self):
        r, c = drive("<think>never closed", 4)
        assert r == "never closed"
        assert c == ""

    def test_hold_mode_emits_whole_block(self):
        p = StreamingReasoningParser(stream_reasoning=False)
        out = [p.feed("a<think>bb"), p.feed("b</th"), p.feed("ink>c")]
        # nothing streamed while inside the block...
        assert out[0] == (None, "a")
        assert out[1] == (None, "")
        # ...the whole span arrives when it closes
        assert out[2] == ("bbb", "c")

    def test_plain_text_untouched(self):
        r, c = drive("no tags at all", 5)
        assert r == ""
        assert c == "no tags at all"

    def test_multiple_blocks(self):
        r, c = drive("<think>a</think>mid<think>b</think>end", 3)
        assert r == "ab"
        assert c == "midend"


@pytest.fixture(scope="module")
def reasoning_server():
    args = ServerArgs(
        preset="tiny-debug",
        random_weights=True,
        dtype="float32",
        page_size=4,
        max_total_tokens=2048,
        host="127.0.0.1",
        port=_free_port(),
        served_model_name="tiny",
        reasoning_parser="default",
        # small fused-decode windows so deltas stream char-by-char-ish and
        # the think tags actually split across SSE chunks
        decode_window_size=4,
    )
    srv = _ServerThread(args.resolve())
    yield f"http://127.0.0.1:{args.port}"
    srv.stop()


# the char class breaks grammar jump-forward, so the reasoning span is
# emitted across several decode windows instead of one forced-token burst
THINK_TEXT = "I will<think>check [a-z]{8} math</think>It is 4\\."


class TestReasoningSSE:
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

    def test_reasoning_deltas(self, reasoning_server):
        """The char-level tokenizer streams ~1 char per delta, so the
        <think> tags necessarily split across SSE chunks; the deltas must
        still separate reasoning_content from content exactly."""
        events = self._collect(
            reasoning_server,
            {
                "model": "tiny",
                "messages": [{"role": "user", "content": "2+2?"}],
                "max_tokens": 80,
                "temperature": 0.0,
                "stream": True,
                # force the surface string so the test is deterministic
                "regex": THINK_TEXT,
            },
        )
        reasoning = "".join(
            e["choices"][0]["delta"].get("reasoning_content") or ""
            for e in events
            if e["choices"]
        )
        content = "".join(
            e["choices"][0]["delta"].get("content") or ""
            for e in events
            if e["choices"]
        )
        assert reasoning.startswith("check ") and reasoning.endswith(" math")
        assert len(reasoning) == len("check 12345678 math")
        assert content == "I willIt is 4."
        # no chunk mixes both fields, and the tag text never leaks
        for e in events:
            if not e["choices"]:
                continue
            d = e["choices"][0]["delta"]
            assert not (
                d.get("reasoning_content") and d.get("content")
            ), d
            assert "<think>" not in (d.get("content") or "")
            n_reasoning = sum(
                1
                for e in events
                if e["choices"]
                and e["choices"][0]["delta"].get("reasoning_content")
            )
        assert n_reasoning >= 2, "reasoning did not stream incrementally"
