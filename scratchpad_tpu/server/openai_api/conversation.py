"""Named chat conversation templates.

Compact re-creation of the reference's conversation registry
(reference: scratchpad/server/openai_api/conversation.py, 566 LoC): when a
tokenizer ships no chat_template, a named template (or one inferred from the
model name) renders the message list.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional


@dataclasses.dataclass
class Conversation:
    name: str
    render: Callable[[list[dict]], str]
    stop: list[str] = dataclasses.field(default_factory=list)


def _llama3(messages: list[dict]) -> str:
    out = ["<|begin_of_text|>"]
    for m in messages:
        out.append(
            f"<|start_header_id|>{m['role']}<|end_header_id|>\n\n"
            f"{m.get('content') or ''}<|eot_id|>"
        )
    out.append("<|start_header_id|>assistant<|end_header_id|>\n\n")
    return "".join(out)


def _chatml(messages: list[dict]) -> str:  # qwen & friends
    out = []
    for m in messages:
        out.append(f"<|im_start|>{m['role']}\n{m.get('content') or ''}<|im_end|>\n")
    out.append("<|im_start|>assistant\n")
    return "".join(out)


def _gemma(messages: list[dict]) -> str:
    out = ["<bos>"]
    for m in messages:
        role = "model" if m["role"] == "assistant" else "user"
        out.append(f"<start_of_turn>{role}\n{m.get('content') or ''}<end_of_turn>\n")
    out.append("<start_of_turn>model\n")
    return "".join(out)


def _mistral(messages: list[dict]) -> str:
    out = ["<s>"]
    sys_txt = ""
    for m in messages:
        if m["role"] == "system":
            sys_txt = m.get("content") or ""
        elif m["role"] == "user":
            content = m.get("content") or ""
            if sys_txt:
                content = f"{sys_txt}\n\n{content}"
                sys_txt = ""
            out.append(f"[INST] {content} [/INST]")
        elif m["role"] == "assistant":
            out.append(f"{m.get('content') or ''}</s>")
    return "".join(out)


def _plain(messages: list[dict]) -> str:
    parts = [f"<|{m['role']}|>\n{m.get('content') or ''}" for m in messages]
    parts.append("<|assistant|>\n")
    return "\n".join(parts)


TEMPLATES: dict[str, Conversation] = {
    "llama-3": Conversation("llama-3", _llama3, stop=["<|eot_id|>"]),
    "chatml": Conversation("chatml", _chatml, stop=["<|im_end|>"]),
    "qwen": Conversation("qwen", _chatml, stop=["<|im_end|>"]),
    "gemma": Conversation("gemma", _gemma, stop=["<end_of_turn>"]),
    "mistral": Conversation("mistral", _mistral, stop=["</s>"]),
    "plain": Conversation("plain", _plain, stop=[]),
}


def get_template(
    name: Optional[str] = None, model_name: Optional[str] = None
) -> Conversation:
    """Resolve by explicit name, else infer from the model name."""
    if name:
        return TEMPLATES[name]
    m = (model_name or "").lower()
    for key in ("llama-3", "qwen", "gemma", "mistral"):
        if key.replace("-", "") in m.replace("-", "").replace("_", ""):
            return TEMPLATES[key]
    return TEMPLATES["plain"]
