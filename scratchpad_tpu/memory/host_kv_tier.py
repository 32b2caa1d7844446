"""Host (CPU-memory) KV tier: evicted radix pages survive off-device.

TPU-native counterpart of the reference's two-tier KV pool
(reference: scratchpad/memory/het_pool.py:13-120
HeterogeneousMHATokenToKVPool). Where the reference splits one token pool
across GPU and pinned-CPU segments, here the tiers are asynchronous: the
device cache stays the hot pool, and pages the radix cache must evict are
copied into a bounded host arena instead of being discarded. On a later
prefix match the scheduler promotes them back into freshly-allocated device
pages — a radix hit that costs one h2d copy instead of a prefill recompute.

Indexing is a per-page token trie per adapter (KV depends on the active
topping, like the device-side TreeCacheGroup). A trie node may be a
placeholder (slot -1) when its own page was not offloaded (ancestors evict
after descendants); placeholders never match but keep paths connected.
"""

from __future__ import annotations

import time
from typing import Optional

import numpy as np

from scratchpad_tpu.utils import get_logger

logger = get_logger("host_kv")


class _Node:
    __slots__ = ("children", "slot", "t")

    def __init__(self):
        self.children: dict[tuple, "_Node"] = {}
        self.slot = -1  # host arena slot; -1 = placeholder
        self.t = 0.0


class HostKVTier:
    def __init__(self, runner, capacity_tokens: int):
        self.runner = runner
        self.ps = runner.page_size
        self.capacity_slots = max(capacity_tokens // self.ps, 1)
        self._kv: Optional[np.ndarray] = None  # [slots, L, ps, KH, D]
        self._scale: Optional[np.ndarray] = None
        self._free = list(range(self.capacity_slots - 1, -1, -1))
        self._roots: dict[int, _Node] = {}
        self.stored_pages = 0
        self.restored_pages = 0

    # ------------------------------------------------------------------ trie

    def _root(self, adapter: int) -> _Node:
        if adapter not in self._roots:
            self._roots[adapter] = _Node()
        return self._roots[adapter]

    def _walk(self, adapter: int, tokens: list[int], create: bool):
        """Yield one trie node per page of ``tokens`` (page-aligned walk)."""
        node = self._root(adapter)
        out = []
        for i in range(0, len(tokens) - self.ps + 1, self.ps):
            key = tuple(tokens[i : i + self.ps])
            child = node.children.get(key)
            if child is None:
                if not create:
                    break
                child = _Node()
                node.children[key] = child
            out.append(child)
            node = child
        return out

    # ----------------------------------------------------------------- store

    def on_evict(self, adapter: int, tokens: list[int], page_ids: np.ndarray):
        """Radix-eviction hook: offload the node's pages before they free.

        ``tokens`` is the full root->node prefix; ``page_ids`` covers its
        LAST ``len(page_ids)`` pages (ancestors are still device-resident)."""
        npg = len(page_ids)
        if npg == 0:
            return
        while len(self._free) < npg:
            if not self._drop_lru():
                return  # arena full of newer entries; skip offload
        kv, scale = self.runner.gather_pages(np.asarray(page_ids, np.int64))
        if self._kv is None:
            self._kv = np.zeros(
                (self.capacity_slots,) + kv.shape[1:], kv.dtype
            )
            if scale is not None:
                self._scale = np.zeros(
                    (self.capacity_slots,) + scale.shape[1:], scale.dtype
                )
        path = self._walk(adapter, tokens, create=True)
        now = time.monotonic()
        total = len(tokens) // self.ps
        for j, node in enumerate(path):
            node.t = now
            if j >= total - npg:
                i = j - (total - npg)
                if node.slot < 0:
                    node.slot = self._free.pop()
                self._kv[node.slot] = kv[i]
                if scale is not None:
                    self._scale[node.slot] = scale[i]
        self.stored_pages += npg

    def _drop_lru(self) -> bool:
        """Free the least-recently-touched materialized node's slot."""
        best, broot = None, None
        stack = [(r, None) for r in self._roots.values()]
        while stack:
            n, _ = stack.pop()
            for c in n.children.values():
                if c.slot >= 0 and (best is None or c.t < best.t):
                    best = c
                stack.append((c, n))
        if best is None:
            return False
        self._free.append(best.slot)
        best.slot = -1
        return True

    # ----------------------------------------------------------------- fetch

    def match(self, adapter: int, tokens: list[int], start_page: int) -> list[int]:
        """Host slots extending a device-resident prefix of ``start_page``
        pages: walk the token path (placeholders fine inside the device
        prefix — those pages are still on device) and collect contiguous
        materialized slots from ``start_page`` on."""
        slots = []
        now = time.monotonic()
        for j, node in enumerate(self._walk(adapter, list(tokens), create=False)):
            if j < start_page:
                continue
            if node.slot < 0:
                break
            node.t = now
            slots.append(node.slot)
        return slots

    def load(self, slots: list[int]):
        """(kv[n, L, ps, KH, D], scale|None) for promotion to device."""
        idx = np.asarray(slots, np.int64)
        kv = self._kv[idx]
        scale = self._scale[idx] if self._scale is not None else None
        self.restored_pages += len(slots)
        return kv, scale

    def reset(self) -> None:
        self._roots.clear()
        self._free = list(range(self.capacity_slots - 1, -1, -1))
