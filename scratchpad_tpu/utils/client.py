"""Client helpers for talking to a served OpenAI-compatible endpoint
(reference: scratchpad/utils/client/ — LLM chat wrapper with usage/cost
tracking + LLMEncoder embedding client). Used by the shepherd router's
policy builders and by eval tooling; works against this engine's server or
any OpenAI-compatible host."""

from __future__ import annotations

import os
import time
from typing import List, Optional

import numpy as np
import requests


def _retry(fn, attempts: int = 3, wait_s: float = 2.0):
    last = None
    for _ in range(attempts):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 - network retry wrapper
            last = e
            time.sleep(wait_s)
    raise last


class LLM:
    """Minimal chat-completions client with usage + cost accounting
    (reference: utils/client/req.py:7-76)."""

    def __init__(
        self,
        model: str,
        base_url: Optional[str] = None,
        api_key: Optional[str] = None,
        system_prompt: Optional[str] = None,
        price_per_mtokens: Optional[float] = None,
    ):
        base_url = base_url or os.environ.get("RC_API_BASE")
        api_key = api_key or os.environ.get("RC_API_KEY", "none")
        if not base_url:
            raise ValueError("base_url not given and RC_API_BASE unset")
        self.model = model
        self.base_url = base_url.rstrip("/") + "/chat/completions"
        self.system_prompt = system_prompt or "You are a helpful assistant."
        self.headers = {"Authorization": f"Bearer {api_key}"}
        self._prompt_tokens = 0
        self._completion_tokens = 0
        self.price_per_million_tokens = price_per_mtokens

    def set_system_prompt(self, system_prompt: str) -> None:
        self.system_prompt = system_prompt

    def set_pricing_per_mtokens(self, price: float) -> None:
        self.price_per_million_tokens = price

    def __call__(
        self, prompt: str, max_tokens: int = 10, temperature: float = 0.5
    ) -> Optional[str]:
        def call():
            res = requests.post(
                self.base_url,
                headers=self.headers,
                json={
                    "model": self.model,
                    "messages": [
                        {"role": "system", "content": self.system_prompt},
                        {"role": "user", "content": prompt},
                    ],
                    "max_tokens": max_tokens,
                    "temperature": temperature,
                },
                timeout=120,
            )
            res.raise_for_status()
            return res.json()

        result = _retry(call)
        self._prompt_tokens += result["usage"]["prompt_tokens"]
        self._completion_tokens += result["usage"]["completion_tokens"]
        return result["choices"][0]["message"]["content"]

    @property
    def usage(self) -> dict:
        return {
            "total_tokens": self._prompt_tokens + self._completion_tokens,
            "prompt_tokens": self._prompt_tokens,
            "completion_tokens": self._completion_tokens,
            "cost": (
                self.price_per_million_tokens * self._completion_tokens / 1e6
                if self.price_per_million_tokens
                else None
            ),
        }


class LLMEncoder:
    """Embedding client over /v1/embeddings
    (reference: utils/client/encoder.py:12-45)."""

    def __init__(
        self,
        model: str,
        base_url: Optional[str] = None,
        api_key: Optional[str] = None,
    ):
        base_url = base_url or os.environ.get("RC_API_BASE")
        api_key = api_key or os.environ.get("RC_API_KEY", "none")
        if not base_url:
            raise ValueError("base_url not given and RC_API_BASE unset")
        self.model = model
        self.base_url = base_url.rstrip("/") + "/embeddings"
        self.headers = {"Authorization": f"Bearer {api_key}"}

    def __call__(self, docs: List[str]) -> np.ndarray:
        def call():
            res = requests.post(
                self.base_url,
                headers=self.headers,
                json={
                    "model": self.model,
                    "input": docs,
                    "encoding_format": "float",
                },
                timeout=120,
            )
            res.raise_for_status()
            return res.json()["data"]

        data = _retry(call)
        return np.array([d["embedding"] for d in data], np.float32)
