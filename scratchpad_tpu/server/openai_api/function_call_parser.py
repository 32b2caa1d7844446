"""Tool/function-call extraction from model output.

Re-implements the reference FunctionCallParser's per-family detectors
(reference: scratchpad/server/openai_api/function_call_parser.py:315-607):
Qwen2.5 (<tool_call> tags), Mistral ([TOOL_CALLS]), Llama-3.2 (raw JSON
object), DeepSeek-V3-style fenced JSON. Format auto-detected from the text.
"""

from __future__ import annotations

import json
import re
import uuid
from dataclasses import dataclass, field
from typing import Optional


@dataclass
class ToolCallItem:
    name: str
    arguments: str  # JSON-encoded string (OpenAI wire format)
    call_id: str = field(default_factory=lambda: f"call_{uuid.uuid4().hex[:24]}")

    def to_openai(self, index: int) -> dict:
        return {
            "id": self.call_id,
            "index": index,
            "type": "function",
            "function": {"name": self.name, "arguments": self.arguments},
        }


@dataclass
class ParseResult:
    normal_text: str
    calls: list[ToolCallItem]


def _mk(obj: dict) -> Optional[ToolCallItem]:
    name = obj.get("name")
    if not name:
        return None
    args = obj.get("arguments", obj.get("parameters", {}))
    if not isinstance(args, str):
        args = json.dumps(args)
    return ToolCallItem(name=name, arguments=args)


class BaseDetector:
    def detect(self, text: str) -> Optional[ParseResult]:
        raise NotImplementedError


class Qwen25Detector(BaseDetector):
    """<tool_call>\n{...}\n</tool_call> (reference: :315 Qwen25Detector)."""

    _re = re.compile(r"<tool_call>\s*(\{.*?\})\s*</tool_call>", re.DOTALL)

    def detect(self, text):
        calls = []
        for m in self._re.finditer(text):
            try:
                item = _mk(json.loads(m.group(1)))
                if item:
                    calls.append(item)
            except json.JSONDecodeError:
                continue
        if not calls:
            return None
        return ParseResult(self._re.sub("", text).strip(), calls)


class MistralDetector(BaseDetector):
    """[TOOL_CALLS] [{...}, ...] (reference: :390 MistralDetector)."""

    _re = re.compile(r"\[TOOL_CALLS\]\s*(\[.*\])", re.DOTALL)

    def detect(self, text):
        m = self._re.search(text)
        if not m:
            return None
        try:
            objs = json.loads(m.group(1))
        except json.JSONDecodeError:
            return None
        calls = [c for c in (_mk(o) for o in objs) if c]
        if not calls:
            return None
        return ParseResult(text[: m.start()].strip(), calls)


class Llama32Detector(BaseDetector):
    """Raw JSON object(s): {"name": ..., "parameters": {...}}
    (reference: :470 Llama32Detector); also handles ';'-joined objects."""

    def detect(self, text):
        stripped = text.strip()
        if not stripped.startswith("{"):
            return None
        calls = []
        for part in stripped.split(";"):
            part = part.strip()
            if not part:
                continue
            try:
                obj = json.loads(part)
            except json.JSONDecodeError:
                continue
            item = _mk(obj) if isinstance(obj, dict) else None
            if item:
                calls.append(item)
        if not calls:
            return None
        return ParseResult("", calls)


class FencedJsonDetector(BaseDetector):
    """```json {...} ``` tool blocks (DeepSeek-V3-style)."""

    _re = re.compile(r"```json\s*(\{.*?\})\s*```", re.DOTALL)

    def detect(self, text):
        calls = []
        for m in self._re.finditer(text):
            try:
                item = _mk(json.loads(m.group(1)))
                if item:
                    calls.append(item)
            except json.JSONDecodeError:
                continue
        if not calls:
            return None
        return ParseResult(self._re.sub("", text).strip(), calls)


_DETECTORS = [
    Qwen25Detector(),
    MistralDetector(),
    Llama32Detector(),
    FencedJsonDetector(),
]


class FunctionCallParser:
    """Auto-detecting parser (reference: FunctionCallParser :560)."""

    def __init__(self, tools: Optional[list[dict]] = None):
        self.allowed = {
            t["function"]["name"]
            for t in (tools or [])
            if t.get("type") == "function" and "function" in t
        }

    def parse(self, text: str) -> ParseResult:
        for det in _DETECTORS:
            res = det.detect(text)
            if res is None:
                continue
            if self.allowed:
                res.calls = [c for c in res.calls if c.name in self.allowed]
                if not res.calls:
                    continue
            return res
        return ParseResult(text, [])
