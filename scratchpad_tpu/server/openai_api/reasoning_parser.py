"""Reasoning-content extraction (<think> blocks).

Analogue of the reference reasoning parser
(reference: scratchpad/server/openai_api/reasoning_parser.py): splits
DeepSeek-R1/Qwen-style <think>...</think> spans into `reasoning_content`,
leaving the visible answer in `content`. Handles the common case where the
model omits the opening tag but emits `</think>`.
"""

from __future__ import annotations

import re
from typing import Optional


_TAGGED = re.compile(r"<think>(.*?)</think>", re.DOTALL)


def split_reasoning(text: str) -> tuple[Optional[str], str]:
    """Returns (reasoning_content or None, visible_content)."""
    spans = _TAGGED.findall(text)
    if spans:
        visible = _TAGGED.sub("", text).strip()
        return "\n".join(s.strip() for s in spans), visible
    # R1 style: reasoning first, closing tag only
    if "</think>" in text:
        reasoning, _, visible = text.partition("</think>")
        return reasoning.strip(), visible.strip()
    return None, text
