"""Per-step device metadata for a model forward.

TPU-native analogue of ForwardBatch/ForwardMode
(reference: scratchpad/model_executor/forward_info.py:19-471). All arrays have
*static bucketed shapes* — T (flat new tokens) and B (request rows) come from
the compile-bucket ladder, the XLA analogue of the reference's CUDA-graph
batch-size ladder (reference: model_executor/cuda_graph_runner.py:92-128).

Layout convention:
- new tokens are FLAT: ``tokens[T]`` spans all requests back to back (ragged,
  padded up to the T bucket). ``req_indices[t]`` says which request row each
  token belongs to. Decode is the special case T == B, req_indices == arange.
- per-request KV state is described by ``page_table[B, MAXP]`` (KV page ids in
  sequence order) and ``seq_lens[B]`` (total tokens in cache for the request
  *including* the new tokens written this step).
- each new token's KV is scattered to flat cache slot ``out_cache_loc[t]``
  before attention runs, so causal masking by position is the only masking
  attention needs.

Padding rows have seq_lens == 0 / extend_lens == 0 and out_cache_loc pointing
at the reserved dump page 0.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Optional

import jax


class ForwardMode(enum.Enum):
    EXTEND = "extend"  # prefill or chunked-prefill continuation
    DECODE = "decode"  # one new token per running request
    IDLE = "idle"

    def is_extend(self) -> bool:
        return self == ForwardMode.EXTEND

    def is_decode(self) -> bool:
        return self == ForwardMode.DECODE


@dataclasses.dataclass
class ForwardMeta:
    mode: ForwardMode  # static (meta field)
    tokens: jax.Array  # i32[T] flat new token ids
    positions: jax.Array  # i32[T] absolute position of each new token
    out_cache_loc: jax.Array  # i32[T] flat KV slot for each new token
    req_indices: jax.Array  # i32[T] request row per token
    page_table: jax.Array  # i32[B, MAXP]
    seq_lens: jax.Array  # i32[B] tokens in cache incl. new ones
    extend_lens: jax.Array  # i32[B] new tokens this step per request
    last_token_idx: jax.Array  # i32[B] flat index of each request's last new token
    # toppings (LoRA): pool slots of the distinct adapters in this batch and
    # each request row's position within that list (0 = zero adapter)
    active_adapters: Optional[jax.Array] = None  # i32[MAX_ACTIVE_TOPPINGS]
    adapter_slots: Optional[jax.Array] = None  # i32[B]
    # multimodal: rows whose token id is NEGATIVE (image-placeholder pseudo
    # ids, content-hashed for radix caching) take their embedding from here
    # instead of the embedding table
    input_embeds: Optional[jax.Array] = None  # f32[T, H]
    # multimodal rope (Qwen2-VL): 3-component (t, h, w) positions for
    # extend rows containing image spans, and/or a per-request scalar shift
    # (rope position = positions + rope_delta; components equal => plain rope)
    mrope_positions: Optional[jax.Array] = None  # i32[3, T]
    rope_delta: Optional[jax.Array] = None  # i32[B]
    # cross-attention (Mllama): per-request slot in KVCache.cross (0 = no
    # image/scratch) and, on prefill chunks, the vision states to project
    # and write into that slot
    cross_slots: Optional[jax.Array] = None  # i32[B]
    cross_states: Optional[jax.Array] = None  # f32[B, S_img, H]
    # valid cross-KV rows per request (tiled Mllama: n_tiles * patches;
    # None = the full buffer length)
    cross_lens: Optional[jax.Array] = None  # i32[B]
    # Gemma3-MM: absolute (start, end) prompt ranges per request whose
    # tokens attend bidirectionally (HF token-type mask; zeros = no span)
    mm_spans: Optional[jax.Array] = None  # i32[B, M, 2]
    # SP ring prefill: static bucket for the cached-prefix K/V gather
    # (0 = no cached prefix); the valid length is positions[0] at runtime
    sp_prefix_bucket: int = 0
    # embedding mode: models return pooled last-token hidden instead of logits
    capture_hidden: bool = False
    # scoring mode: models return the full [T, H] hidden sequence
    capture_all_hidden: bool = False

    @property
    def num_tokens(self) -> int:
        return self.tokens.shape[0]

    @property
    def batch_size(self) -> int:
        return self.seq_lens.shape[0]

    @property
    def max_pages(self) -> int:
        return self.page_table.shape[1]


jax.tree_util.register_dataclass(
    ForwardMeta,
    data_fields=[
        "tokens",
        "positions",
        "out_cache_loc",
        "req_indices",
        "page_table",
        "seq_lens",
        "extend_lens",
        "last_token_idx",
        "active_adapters",
        "adapter_slots",
        "input_embeds",
        "mrope_positions",
        "rope_delta",
        "cross_slots",
        "cross_states",
        "cross_lens",
        "mm_spans",
    ],
    meta_fields=[
        "mode",
        "sp_prefix_bucket",
        "capture_hidden",
        "capture_all_hidden",
    ],
)
