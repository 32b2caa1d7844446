"""Tool-call and reasoning parser unit tests."""

import json

from scratchpad_tpu.server.openai_api.function_call_parser import (
    FunctionCallParser,
)
from scratchpad_tpu.server.openai_api.reasoning_parser import split_reasoning

TOOLS = [
    {"type": "function", "function": {"name": "get_weather"}},
    {"type": "function", "function": {"name": "search"}},
]


class TestFunctionCallParser:
    def test_qwen25(self):
        text = (
            'Sure.\n<tool_call>\n{"name": "get_weather", '
            '"arguments": {"city": "Zurich"}}\n</tool_call>'
        )
        res = FunctionCallParser(TOOLS).parse(text)
        assert len(res.calls) == 1
        assert res.calls[0].name == "get_weather"
        assert json.loads(res.calls[0].arguments) == {"city": "Zurich"}
        assert res.normal_text == "Sure."

    def test_mistral(self):
        text = '[TOOL_CALLS] [{"name": "search", "arguments": {"q": "tpu"}}]'
        res = FunctionCallParser(TOOLS).parse(text)
        assert [c.name for c in res.calls] == ["search"]

    def test_llama32_json(self):
        text = '{"name": "get_weather", "parameters": {"city": "Bern"}}'
        res = FunctionCallParser(TOOLS).parse(text)
        assert res.calls and res.calls[0].name == "get_weather"
        assert json.loads(res.calls[0].arguments) == {"city": "Bern"}

    def test_llama32_multiple(self):
        text = (
            '{"name": "get_weather", "parameters": {}};'
            '{"name": "search", "parameters": {"q": "x"}}'
        )
        res = FunctionCallParser(TOOLS).parse(text)
        assert [c.name for c in res.calls] == ["get_weather", "search"]

    def test_plain_text_no_calls(self):
        res = FunctionCallParser(TOOLS).parse("The weather is nice today.")
        assert res.calls == []
        assert res.normal_text == "The weather is nice today."

    def test_unknown_tool_filtered(self):
        text = '<tool_call>{"name": "rm_rf", "arguments": {}}</tool_call>'
        res = FunctionCallParser(TOOLS).parse(text)
        assert res.calls == []


class TestReasoningParser:
    def test_tagged(self):
        r, v = split_reasoning("<think>step 1\nstep 2</think>Answer: 42")
        assert r == "step 1\nstep 2"
        assert v == "Answer: 42"

    def test_r1_closing_only(self):
        r, v = split_reasoning("chain of thought here</think>final")
        assert r == "chain of thought here"
        assert v == "final"

    def test_none(self):
        r, v = split_reasoning("plain answer")
        assert r is None and v == "plain answer"


class TestConversationTemplates:
    def test_inference_from_model_name(self):
        from scratchpad_tpu.server.openai_api.conversation import get_template

        msgs = [
            {"role": "system", "content": "be brief"},
            {"role": "user", "content": "hi"},
        ]
        assert "<|start_header_id|>" in get_template(model_name="Llama-3.2-1B").render(msgs)
        assert "<|im_start|>" in get_template(model_name="Qwen3-8B").render(msgs)
        assert "<start_of_turn>" in get_template(model_name="gemma-2-9b").render(msgs)
        assert "[INST]" in get_template(model_name="Mistral-7B").render(msgs)
        out = get_template(model_name="unknown-model").render(msgs)
        assert "<|assistant|>" in out

    def test_explicit_name(self):
        from scratchpad_tpu.server.openai_api.conversation import get_template

        t = get_template(name="chatml")
        assert t.stop == ["<|im_end|>"]
