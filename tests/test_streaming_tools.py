"""Streaming tool-call parser: chunk-by-chunk delta contract.

Covers the reference's parse_streaming_increment semantics
(reference: scratchpad/server/openai_api/function_call_parser.py:141):
normal text flows through with minimal hold-back, the first tool delta
carries id+name, and the concatenation of argument fragments equals the
final arguments JSON string.
"""

import json

from scratchpad_tpu.server.openai_api.function_call_parser import (
    StreamingToolParser,
)

TOOLS = [
    {"type": "function", "function": {"name": "get_weather"}},
    {"type": "function", "function": {"name": "search"}},
]


def drive(text, chunk=3, tools=TOOLS):
    """Feed text in fixed-size chunks; return (normal_text, calls)."""
    p = StreamingToolParser(tools)
    normal = ""
    calls = {}  # index -> {"id", "name", "args"}
    increments = []
    for i in range(0, len(text), chunk):
        increments.append(p.feed(text[i : i + chunk]))
    increments.append(p.finish())
    for res in increments:
        normal += res.normal_text
        for d in res.deltas:
            idx = d["index"]
            if idx not in calls:
                assert d.get("id"), "first delta must carry the call id"
                assert d["function"].get("name"), "first delta must carry name"
                calls[idx] = {
                    "id": d["id"],
                    "name": d["function"]["name"],
                    "args": d["function"].get("arguments", ""),
                }
            else:
                assert "id" not in d, "id only on the first delta"
                calls[idx]["args"] += d["function"]["arguments"]
    return normal, [calls[i] for i in sorted(calls)], p


class TestStreamingQwen:
    TEXT = (
        'Let me check.\n<tool_call>\n{"name": "get_weather", '
        '"arguments": {"city": "Zurich", "unit": "C"}}\n</tool_call>'
    )

    def test_chunked(self):
        for chunk in (1, 2, 5, 17, 1000):
            normal, calls, p = drive(self.TEXT, chunk)
            assert normal.strip() == "Let me check."
            assert len(calls) == 1
            assert calls[0]["name"] == "get_weather"
            assert json.loads(calls[0]["args"]) == {
                "city": "Zurich",
                "unit": "C",
            }
            assert p.saw_tool_call

    def test_args_stream_early(self):
        """Argument fragments must arrive before the object completes."""
        p = StreamingToolParser(TOOLS)
        head = '<tool_call>{"name": "search", "arguments": {"q": "a long query'
        res = p.feed(head)
        assert any(d.get("id") for d in res.deltas), "name delta not emitted"
        frags = "".join(
            d["function"].get("arguments", "") for d in res.deltas
        )
        assert frags.startswith('{"q":'), frags
        res2 = p.feed('"}}</tool_call>')
        frags += "".join(d["function"]["arguments"] for d in res2.deltas)
        assert json.loads(frags) == {"q": "a long query"}

    def test_two_calls(self):
        text = (
            '<tool_call>{"name": "search", "arguments": {"q": "x"}}</tool_call>'
            '<tool_call>{"name": "get_weather", "arguments": {"city": "Bern"}}'
            "</tool_call>"
        )
        _, calls, _ = drive(text, 4)
        assert [c["name"] for c in calls] == ["search", "get_weather"]
        assert json.loads(calls[1]["args"]) == {"city": "Bern"}


class TestStreamingMistral:
    def test_array(self):
        text = (
            'Okay. [TOOL_CALLS] [{"name": "search", "arguments": {"q": "tpu"}},'
            ' {"name": "get_weather", "arguments": {"city": "Zurich"}}]'
        )
        normal, calls, _ = drive(text, 3)
        assert normal.strip() == "Okay."
        assert [c["name"] for c in calls] == ["search", "get_weather"]
        assert json.loads(calls[0]["args"]) == {"q": "tpu"}


class TestStreamingLlama:
    def test_raw_json(self):
        text = '{"name": "get_weather", "parameters": {"city": "Bern"}}'
        normal, calls, _ = drive(text, 2)
        assert normal == ""
        assert calls[0]["name"] == "get_weather"
        assert json.loads(calls[0]["args"]) == {"city": "Bern"}

    def test_multiple_semicolon(self):
        text = (
            '{"name": "search", "parameters": {"q": "a"}};'
            '{"name": "search", "parameters": {"q": "b"}}'
        )
        _, calls, _ = drive(text, 5)
        assert len(calls) == 2
        assert json.loads(calls[1]["args"]) == {"q": "b"}


class TestStreamingEdges:
    def test_plain_text_passthrough(self):
        text = "Just a normal answer with no tools at all."
        normal, calls, p = drive(text, 4)
        assert normal == text
        assert not calls and not p.saw_tool_call

    def test_partial_marker_heldback_then_released(self):
        """'<tool' that never becomes a marker must still be delivered."""
        normal, calls, _ = drive("a <tool but not really", 4)
        assert normal == "a <tool but not really"
        assert not calls

    def test_unknown_tool_surfaces_raw(self):
        text = '<tool_call>{"name": "nope", "arguments": {}}</tool_call>'
        normal, calls, _ = drive(text, 6)
        assert not calls
        assert '"nope"' in normal

    def test_string_arguments_decoded(self):
        """Double-encoded arguments arrive as the decoded JSON string."""
        text = (
            '<tool_call>{"name": "search", '
            '"arguments": "{\\"q\\": \\"x\\"}"}</tool_call>'
        )
        _, calls, _ = drive(text, 7)
        assert json.loads(calls[0]["args"]) == {"q": "x"}

    def test_no_args_call(self):
        text = '<tool_call>{"name": "search"}</tool_call>'
        _, calls, _ = drive(text, 3)
        assert calls[0]["args"] == "{}"

    def test_incomplete_call_flushed_as_text(self):
        p = StreamingToolParser(TOOLS)
        p.feed("<tool_call>")
        res = p.finish()
        assert "<tool_call>" in res.normal_text

    def test_markdown_fence_without_name_is_text(self):
        text = 'Here:\n```json\n{"a": 1}\n```\ndone'
        normal, calls, _ = drive(text, 5)
        assert not calls
        assert '{"a": 1}' in normal
