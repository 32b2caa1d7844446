"""ModelRunner: owns params, KV cache, allocators, and the jitted step.

TPU-native analogue of ModelRunner + CudaGraphRunner + TpModelWorker
(reference: scratchpad/model_executor/model_runner.py:44-661,
scratchpad/model_executor/cuda_graph_runner.py:144-525,
scratchpad/managers/tp_worker.py:25-185). Where the reference captures CUDA
graphs over a batch-size ladder, we jit one step function and let XLA's
compile cache key on the padded bucket shapes; ``capture()`` pre-warms the
ladder so serving never hits a compile stall.

The step = forward + sample fused in one jit with the KV cache donated, so
decode runs device-side with no host round-trip inside the step.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Any, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from scratchpad_tpu.config import ModelConfig, ServerArgs
from scratchpad_tpu.executor.forward_meta import ForwardMeta, ForwardMode
from scratchpad_tpu.executor.weight_loader import load_hf_state, place_params
from scratchpad_tpu.memory import (
    KVCacheConfig,
    PageAllocator,
    ReqSlotAllocator,
    create_kv_cache,
)
from scratchpad_tpu.models.registry import get_model_class
from scratchpad_tpu.sampling.batch_info import SamplingBatchInfo
from scratchpad_tpu.sampling.sampler import sample
from scratchpad_tpu.utils import get_logger

logger = get_logger("model_runner")


@dataclasses.dataclass
class WorkerBatch:
    """Host-side batch handed from the scheduler (ModelWorkerBatch analogue,
    reference: scratchpad/scheduler/schedule_batch.py:1482)."""

    mode: ForwardMode
    tokens: np.ndarray  # i32[T_real]
    positions: np.ndarray  # i32[T_real]
    out_cache_loc: np.ndarray  # i32[T_real]
    req_indices: np.ndarray  # i32[T_real]
    page_table: np.ndarray  # i32[B_real, P_real]
    seq_lens: np.ndarray  # i32[B_real]
    extend_lens: np.ndarray  # i32[B_real]
    sampling_info: SamplingBatchInfo  # arrays sized B_real (padded by runner)
    vocab_bitmask: Optional[np.ndarray] = None  # u32[B_real, ceil(V/32)]
    return_top_logprobs: bool = False
    # toppings: distinct adapter pool slots + per-request position in that list
    active_adapters: Optional[np.ndarray] = None  # i32[MAX_ACTIVE_TOPPINGS]
    adapter_slots: Optional[np.ndarray] = None  # i32[B_real]
    # multimodal embedding overrides for negative-token rows
    input_embeds: Optional[np.ndarray] = None  # f32[T_real, H]
    # multimodal rope (Qwen2-VL): full 3-component positions (extend with
    # images) and/or per-request scalar rope shift (decode after images)
    mrope_positions: Optional[np.ndarray] = None  # i32[3, T_real]
    rope_delta: Optional[np.ndarray] = None  # i32[B_real]
    # cross-attention (Mllama): slot per request + prefill vision states
    cross_slots: Optional[np.ndarray] = None  # i32[B_real]
    cross_states: Optional[np.ndarray] = None  # f32[B_real, S_img, H]
    cross_lens: Optional[np.ndarray] = None  # i32[B_real] valid cross rows
    # Gemma3-MM: absolute [B_real, M, 2] (start, end) bidirectional spans
    mm_spans: Optional[np.ndarray] = None


@dataclasses.dataclass
class StepOutput:
    """Device results; fetch lazily to preserve async dispatch."""

    next_token_ids: jax.Array  # i32[B_bucket]
    chosen_logprobs: jax.Array  # f32[B_bucket]
    batch_size: int  # real rows


def _next_bucket(ladder: list[int], n: int) -> int:
    for b in ladder:
        if b >= n:
            return b
    return ladder[-1]


def _pow2_bucket(n: int, lo: int, hi: int) -> int:
    b = lo
    while b < n and b < hi:
        b *= 2
    return min(b, hi)


class ModelRunner:
    def __init__(
        self,
        model_config: ModelConfig,
        server_args: ServerArgs,
        mesh: Optional[Mesh] = None,
        params: Any = None,
    ):
        self.model_config = model_config
        self.args = server_args.resolve()
        self.mesh = mesh
        self.page_size = self.args.page_size
        cfg = model_config

        model_cls = get_model_class(cfg.architecture)
        self.model = model_cls(cfg)
        if (
            self.args.quantization == "w4a8"
            # a model that set quant_matmul=None declared quantization
            # unsupported (e.g. models/gemma.py) — keep the sentinel
            and getattr(self.model, "quant_matmul", None) is not None
        ):
            # same QuantizedLinear storage as w4a16 (checkpoint-compatible
            # with awq/gptq imports) — only the matmul path swaps: per-token
            # int8 activations on the s8 MXU (ops/quant/pallas_w4.py
            # _w4a8_kernel; ~1.3x the bf16 group dots at 8B shapes).
            # SPTPU_W4_IMPL=xla routes to the XLA path like w4a16 does.
            from scratchpad_tpu.models.common import make_w4a8_quant_matmul

            self.model.quant_matmul = make_w4a8_quant_matmul()
        self.model.page_size = self.page_size
        self.model.mesh = mesh
        self.model.use_ep = bool(self.args.enable_ep and mesh is not None)
        self.toppings_manager = None

        # pipeline parallelism (parallel/pp.py): GPipe stages over a pure
        # "pp" mesh; the stacked layer axis and the layer-major page axis
        # shard per stage
        self.pp_size = (
            mesh.shape.get("pp", 1)
            if mesh is not None and self.args.enable_pp
            else 1
        )
        if self.pp_size > 1:
            others = [
                n
                for n in mesh.axis_names
                if n not in ("pp", "tp") and mesh.shape[n] > 1
            ]
            if others:
                raise ValueError(
                    "enable_pp supports pp-only or pp x tp meshes; got extra "
                    f"axes {others}"
                )
            tp = mesh.shape.get("tp", 1)
            if tp > 1 and cfg.num_kv_heads % tp != 0:
                raise ValueError(
                    f"pp x tp mesh: num_kv_heads {cfg.num_kv_heads} must "
                    f"divide over tp={tp}"
                )
            if not hasattr(self.model, "layers_forward"):
                raise ValueError(
                    "enable_pp supports the stacked-decoder (Llama-family) "
                    "forward only"
                )
            if cfg.num_hidden_layers % self.pp_size != 0:
                raise ValueError(
                    f"num_hidden_layers {cfg.num_hidden_layers} must be "
                    f"divisible by pp={self.pp_size}"
                )
            self.model.pp_mesh = mesh
            self.model.pp_microbatches = self.args.pp_microbatches

        # attention backend (reference: model_runner.py:453 init_attention_backend)
        # "auto": the unified ragged-paged-attention kernel on TPU (both
        # extend and decode), the XLA gather backend on CPU. int8 KV and
        # per-layer dynamic sliding windows (Gemma) use the XLA backend.
        backend = self.args.attention_backend
        # the BUNDLED ragged kernel strided-loads interleaved K/V heads and
        # only Mosaic-compiles 128-lane pages; our gqa decode kernel DMAs
        # whole 4-D pages and handles any lane-aligned head_dim (verified by
        # v5e AOT: Dp=256 decode OK, Dp=256 ragged fails "last dim size is
        # not 128 in original base memref")
        from scratchpad_tpu.memory.kv_cache import padded_head_dim as _phd

        ragged_ok = _phd(cfg.head_dim) == 128
        if backend == "auto":
            if jax.default_backend() == "cpu":
                backend = "xla"
            elif mesh is not None:
                backend = "ragged" if ragged_ok else "xla"
            else:
                # decode v2 (block-diagonal GQA flash-decode, gqa_decode.py)
                # + ragged extend: benched 9.3k tok/s vs ragged's 7.7-8.2k
                # (Llama-3.2-1B bs=64 on v5e)
                backend = "gqa"
        if backend == "ragged" and not ragged_ok:
            backend = "xla"
        if not getattr(self.model, "supports_pallas_attention", True):
            backend = "xla"
        # model-aware kv_cache_dtype=auto (VERDICT r4 item 7): on quantized
        # single-device TPU serving of 3B-class-and-up models, int8 KV
        # (inline scales) measured FASTER than bf16 KV (r4: 3B bs64 +3%,
        # 8B flagship runs on it) while at 1B it is ~parity-at-best
        # (AB_r5kernel: 18.4k vs 18.5k) — auto picks per model. Models
        # below the threshold, unquantized runs, CPU and meshes keep the
        # accuracy-default bf16; set --kv-cache-dtype explicitly to force.
        if (
            self.args.kv_cache_dtype == "auto"
            and self.args.quantization in ("w4a8", "w4a16", "awq", "gptq")
            and backend == "gqa"
            and mesh is None
            and jax.default_backend() != "cpu"
            and not cfg.is_mla
            and cfg.hidden_size * cfg.num_hidden_layers >= 50_000
        ):
            self.args.kv_cache_dtype = "int8"
            logger.info(
                "kv_cache_dtype auto -> int8 (quantized serving, "
                "hidden x layers = %d; set --kv-cache-dtype bfloat16 to "
                "force full-precision KV)",
                cfg.hidden_size * cfg.num_hidden_layers,
            )
        if self.args.kv_cache_dtype in ("int8", "fp8") and backend == "ragged":
            backend = "xla"  # bundled kernel lacks per-row scales
        # int8/fp8 KV decode runs the gqa kernel (post-dot scale folding,
        # lane-padded scale pages streamed with the kv pages); the s8-pool
        # layout conflict that used to force XLA here was fixed by
        # flattened-leading-dim scatters/gathers in write_kv/_gather_kv
        if self.pp_size > 1 and backend != "xla":
            # attention runs INSIDE pp_call's shard_map; the kernel wrappers
            # open their own shard_map and cannot nest — keep the
            # auto-partitioned XLA path
            backend = "xla"
        self.kv_lane_heads = False
        if mesh is not None and backend in ("ragged", "pallas", "gqa"):
            # pallas_call doesn't auto-partition under pjit; the ragged
            # backend has a shard_map head-parallel wrapper for pure-TP
            # meshes (tp | num_kv_heads). dp>1 splits the flat ragged token
            # axis, so those meshes use the XLA backend.
            tp = mesh.shape.get("tp", 1)
            dp = mesh.shape.get("dp", 1)
            pure_tp = (
                dp == 1
                and "tp" in mesh.axis_names
                and cfg.num_kv_heads % tp == 0
            )
            if backend == "ragged" and pure_tp and ragged_ok:
                backend = "ragged_tp"
            elif backend == "gqa" and pure_tp and ragged_ok:
                # int8/fp8 KV rides gqa_tp too: the scale pool shards into
                # per-tp 128-lane blocks (memory/kv_cache.py) so decode
                # streams local scale pages and extend dequantizes local
                # pages into a per-shard scratch pool.
                # 8-bit pools sublane-pack 4 head slots per tile: the
                # per-shard page DMA needs (2*Hkv)/tp % 4 == 0 (AOT-
                # verified: tp=4/Hkv=8 compiles, tp=8 does not slice —
                # tools/aot_tp_quant_check.py). Shards that fail the
                # sublane gate switch to the LANE-FOLDED pool layout
                # ([Pg, ps, 2Hkv*Dp], memory/kv_cache.py lane_heads),
                # which slices head slots as 128-lane blocks at any
                # tp | 2*Hkv — this is what makes tp=8 + int8 KV + Hkv=8
                # (BASELINE config 3 on one v5e-8 host) expressible.
                backend = "gqa_tp"
                if (
                    self.args.kv_cache_dtype in ("int8", "fp8")
                    and (2 * cfg.num_kv_heads // tp) % 4 != 0
                    # CPU interpret mode has no tiling constraint: keep the
                    # sublane layout there so tests cover both layouts
                    and jax.default_backend() != "cpu"
                ):
                    self.kv_lane_heads = True
            else:
                logger.warning("mesh run: falling back to XLA attention backend")
                backend = "xla"
        # packed K|V pool: for head_dim <= 64 GQA models the lane-padded
        # cache wastes half its lanes ((8,128) tiling pads them anyway);
        # packing K and V of one head into one 128-lane row halves KV HBM
        # and halves the decode read. Decode reads packed pages directly in
        # the gqa kernel; extend expands just the batch's pages into a
        # scratch pool for the bundled ragged kernel (the dequant-scratch
        # pattern). Single-device gqa backend only for now.
        # quantized packed pools (int8/fp8 + packed, a QUARTER of the
        # lane-padded bf16 read) need the kv-head dim of the s8 page slice
        # tile-aligned: Hkv % 4 == 0 (same 8-bit sublane packing as the
        # quantized TP gate above)
        quant_packed_ok = self.args.kv_cache_dtype not in ("int8", "fp8") or (
            cfg.num_kv_heads % 4 == 0 or jax.default_backend() == "cpu"
        )
        self.kv_packed = self.args.kv_layout == "packed" or (
            self.args.kv_layout == "auto"
            and backend == "gqa"
            and not cfg.is_mla
            and cfg.head_dim <= 64
            and quant_packed_ok
            and not getattr(self.model, "has_cross_attention", False)
            and not getattr(self.model, "dynamic_mask_decode", False)
        )
        if self.args.kv_layout == "packed":
            if (
                backend not in ("gqa",)
                or cfg.is_mla
                or cfg.head_dim > 64
                or not quant_packed_ok
                or getattr(self.model, "has_cross_attention", False)
            ):
                raise ValueError(
                    "kv_layout=packed needs the single-device gqa backend, "
                    "head_dim <= 64, no cross-attention, and (for int8/fp8 "
                    "KV) num_kv_heads % 4 == 0"
                )
        if self.args.kv_layout == "lanes":
            if backend not in ("gqa", "gqa_tp") or cfg.is_mla:
                raise ValueError(
                    "kv_layout=lanes needs the gqa/gqa_tp backend (plain MHA)"
                )
            self.kv_lane_heads = True
            self.kv_packed = False
        # inline-scale quantized pool: pages carry their own bf16 scales as
        # byte planes — ONE DMA stream per page at decode instead of a
        # kv+scale pair (the second stream made int8 KV a net loss at 1B,
        # VERDICT r4 item 2). Explicit kv_layout=inline, or SPTPU_KV_INLINE=1
        # on auto (single-device gqa only; the separate per-shard-block
        # scale pool stays the TP layout).
        self.kv_inline = False
        if self.args.kv_layout == "inline" or (
            self.args.kv_layout == "auto"
            # DEFAULT-ON for single-device quantized pools since r5: the
            # one-stream pages measured +3.3% over the separate scale pool
            # e2e (1B W4A8+int8KV 18,391 vs 17,796, AB_r5kernel.jsonl)
            # and page moves carry their scales for free
            and os.environ.get("SPTPU_KV_INLINE", "1") == "1"
        ):
            ok = (
                backend == "gqa"
                and self.args.kv_cache_dtype in ("int8", "fp8")
                and not cfg.is_mla
                and 2 * cfg.num_kv_heads <= 128
                and not getattr(self.model, "has_cross_attention", False)
            )
            if self.args.kv_layout == "inline" and not ok:
                raise ValueError(
                    "kv_layout=inline needs the single-device gqa backend, "
                    "a quantized kv cache (int8/fp8) and <= 64 kv heads"
                )
            self.kv_inline = ok
            if self.kv_inline:
                self.kv_lane_heads = False

        if backend == "ragged":
            from scratchpad_tpu.ops.attention.ragged_backend import (
                attention_ragged,
            )

            self.model.decode_attention = attention_ragged
            self.model.extend_attention = attention_ragged
        elif backend == "ragged_tp":
            from scratchpad_tpu.ops.attention.ragged_backend import (
                make_attention_ragged_tp,
            )

            attend = make_attention_ragged_tp(mesh)
            self.model.decode_attention = attend
            self.model.extend_attention = attend
        elif backend == "pallas":
            from scratchpad_tpu.ops.attention.pallas_decode import (
                decode_attention_pallas,
            )

            self.model.decode_attention = decode_attention_pallas
        elif backend == "gqa":
            # decode v2: block-diagonal GQA flash-decode with a cross-
            # sequence DMA pipeline (gqa_decode.py); extend still runs the
            # ragged kernel on TPU (the v2 kernel is decode-only)
            from scratchpad_tpu.ops.attention.gqa_decode import (
                decode_attention_gqa,
            )

            self.model.decode_attention = decode_attention_gqa
            if self.kv_packed and (
                jax.default_backend() != "cpu" or self.args.kv_layout == "packed"
            ):
                # extend expands the batch's packed pages (dequantizing
                # int8/fp8 ones) into an interleaved scratch pool and rides
                # the ragged kernel (its CPU branch is the dense jittable
                # reference)
                from scratchpad_tpu.ops.attention.ragged_backend import (
                    attention_ragged_packed,
                )

                self.model.extend_attention = attention_ragged_packed
            elif jax.default_backend() != "cpu" and ragged_ok:
                if self.args.kv_cache_dtype in ("int8", "fp8"):
                    # extend dequantizes the batch's pages into a compact
                    # bf16 scratch pool and rides the same ragged kernel
                    # (the bundled kernel lacks per-row scales; the old XLA
                    # gather fallback materialised dense f32 KV + a
                    # [B, Hkv, G, T, S] score tensor and dominated fp8 runs)
                    from scratchpad_tpu.ops.attention.ragged_backend import (
                        attention_ragged_quant,
                    )

                    self.model.extend_attention = attention_ragged_quant
                else:
                    from scratchpad_tpu.ops.attention.ragged_backend import (
                        attention_ragged,
                    )

                    self.model.extend_attention = attention_ragged
        elif backend == "gqa_tp":
            from scratchpad_tpu.ops.attention.gqa_decode import (
                make_decode_attention_gqa_tp,
            )
            from scratchpad_tpu.ops.attention.ragged_backend import (
                make_attention_ragged_quant_tp,
                make_attention_ragged_tp,
            )

            self.model.decode_attention = make_decode_attention_gqa_tp(mesh)
            if self.args.kv_cache_dtype in ("int8", "fp8"):
                self.model.extend_attention = make_attention_ragged_quant_tp(
                    mesh
                )
            else:
                self.model.extend_attention = make_attention_ragged_tp(mesh)
        # else: keep the XLA reference backend

        # hybrid decode: models whose masks vary per layer (Gemma window
        # alternation, GPT-OSS sinks, Llama-4 chunking) keep the masked XLA
        # extend but decode through the gqa kernel's dynamic-mask path
        # (traced per-layer window, in-kernel sinks, chunk masks — plus
        # whole-chunk skipping below the window start)
        if (
            backend == "xla"
            and self.args.attention_backend in ("auto", "gqa")
            # on CPU the kernel runs in interpret mode; only an explicit
            # backend=gqa opts in (tests) — auto keeps the pure XLA path
            and (
                jax.default_backend() != "cpu"
                or self.args.attention_backend == "gqa"
            )
            and mesh is None
            and not cfg.is_mla
            and getattr(self.model, "dynamic_mask_decode", False)
        ):
            from scratchpad_tpu.ops.attention.gqa_decode import (
                decode_attention_gqa,
            )

            self.model.decode_attention = decode_attention_gqa
            # fixed-window alternation (Gemma): extend also leaves the XLA
            # gather path — both window variants compile and lax.cond picks
            # per layer (sinks/chunked models keep the masked XLA extend)
            if (
                getattr(self.model, "window_cond_extend", False)
                and ragged_ok
                and self.args.kv_cache_dtype not in ("int8", "fp8")
            ):
                from scratchpad_tpu.ops.attention.ragged_backend import (
                    make_window_cond_extend,
                )

                self.model.extend_attention = make_window_cond_extend(
                    cfg.sliding_window or 1
                )
            backend = "gqa_xla"
        self.attention_backend = backend

        # DP attention (reference: flag + batch plumbing only,
        # scratchpad/server/args.py:68, forward_info.py:221-237 — no
        # execution path in-tree; this executes): on dp x tp meshes keep
        # attention weights + the KV pool replicated (full kv heads per
        # device) and shard attention token rows over BOTH axes; the model
        # pins the residual stream back to dp rows so the MLP stays
        # tensor-parallel. Needs the auto-partitioned XLA backend (the
        # shard_map kernel wrappers assume head-sharded KV) and a model that
        # declares its attention params (ATTN_PARAM_KEYS).
        self.dp_attention = bool(
            self.args.enable_dp_attention
            and mesh is not None
            and mesh.shape.get("dp", 1) > 1
            and mesh.shape.get("tp", 1) > 1
            and self.pp_size == 1
            and backend == "xla"
            and hasattr(type(self.model), "ATTN_PARAM_KEYS")
            and self.args.quantization is None
        )
        if self.args.enable_dp_attention and not self.dp_attention:
            logger.warning(
                "enable_dp_attention ignored: needs a dp>1 x tp>1 mesh, the "
                "XLA attention backend, unquantized weights, and a model "
                "with ATTN_PARAM_KEYS"
            )
        self.model.dp_attention = self.dp_attention

        # ---- parameters
        t0 = time.monotonic()
        if params is not None:
            self.params = params
        else:
            quantizing = self.args.quantization in (
                "w4a16", "w4", "w4a8", "fp8", "awq", "gptq", "gptq_v2",
            )
            prequantized = self.args.quantization in ("awq", "gptq", "gptq_v2")
            # quantization reads weights on the host — init/convert on CPU so
            # nothing bounces device->host through a (possibly slow) link
            import contextlib

            ctx = (
                jax.default_device(jax.devices("cpu")[0])
                if quantizing
                else contextlib.nullcontext()
            )
            with ctx:
                if self.args.random_weights or not cfg.model_path:
                    rng = jax.random.PRNGKey(self.args.random_seed)
                    self.params = self.model.init_params(rng, self._dtype())
                    if prequantized:
                        # no checkpoint to import — quantize the random init
                        # so the serving path still exercises the W4 kernels
                        from scratchpad_tpu.ops.quant import (
                            quantize_model_params,
                        )

                        self.params = quantize_model_params(self.params)
                        prequantized = False
                elif prequantized:
                    # AutoAWQ/AutoGPTQ int4 checkpoint: repack the nibbles
                    # directly (bit-exact import, no dequant round trip)
                    from scratchpad_tpu.ops.quant.import_hf import (
                        convert_quantized_layers,
                        split_quant_tensors,
                    )

                    state = load_hf_state(cfg.model_path)
                    plain, quant = split_quant_tensors(state)
                    self.params = self.model.convert_hf_state(
                        plain, self._dtype()
                    )
                    self.params["layers_q"] = convert_quantized_layers(
                        quant,
                        cfg.num_hidden_layers,
                        "awq" if self.args.quantization == "awq" else "gptq",
                        self._dtype(),
                        gptq_v2=self.args.quantization == "gptq_v2",
                    )
                    del state, quant
                else:
                    state = load_hf_state(cfg.model_path)
                    self.params = self.model.convert_hf_state(state, self._dtype())
                    del state
                if prequantized:
                    pass  # layers_q already built above
                elif self.args.quantization == "fp8":
                    from scratchpad_tpu.ops.quant.fp8 import (
                        quantize_model_params_fp8,
                    )

                    self.params = quantize_model_params_fp8(self.params)
                elif quantizing:
                    import os as _os

                    from scratchpad_tpu.ops.quant import quantize_model_params

                    self.params = quantize_model_params(
                        self.params,
                        # fused gate|up: one W4 call per MLP instead of two
                        # (single-device only; a TP shard of the naive
                        # concat would span gate-only columns)
                        fuse_gate_up=(
                            mesh is None
                            and not self.args.enable_param_offload
                            and getattr(
                                self.model, "supports_fused_gate_up", False
                            )
                            and _os.environ.get("SPTPU_FUSE_GATE_UP", "1")
                            not in ("0", "")
                        ),
                    )
            qlm = self.args.quantize_lm_head
            if qlm is None:
                # auto: a bf16 head is ~1/3 of a W4 engine's per-step reads
                # at tied-embedding models (0.79 GiB at 3B) — quantize it
                # whenever the decoder weights are quantized. EAGLE needs
                # the bf16 head for its shared draft head.
                qlm = (
                    self.args.quantization
                    in ("w4a16", "w4", "w4a8", "awq", "gptq", "gptq_v2")
                    and self.args.speculative_algorithm != "eagle"
                    # the model's logits epilogue must read lm_head_q
                    # (untied non-Llama families read params["lm_head"])
                    and getattr(
                        self.model, "supports_quantized_lm_head", False
                    )
                )
            if qlm and mesh is None:
                # W4 output head: the LM head reads its FULL [V, H] matrix
                # every decode step (1.05 GiB bf16 at 8B — 1.4 ms/step in
                # the r3 profile, bandwidth-bound); 4-bit halves+halves it.
                # Tied models keep the bf16 embed for input lookups and
                # quantize a head COPY; untied models drop the bf16 head.
                from scratchpad_tpu.ops.quant.w4a16 import quantize_stacked

                w = (
                    self.params["embed"]
                    if cfg.tie_word_embeddings
                    else self.params.pop("lm_head")
                )
                self.params["lm_head_q"] = quantize_stacked(
                    jnp.swapaxes(jnp.asarray(w), 0, 1)[None]
                )
            if (
                "layers_q" in self.params
                and mesh is None
                and jax.default_backend() != "cpu"
                and __import__("os").environ.get("SPTPU_W4_4BIT", "1") == "1"
            ):
                # 4-bit-native storage (DEFAULT since r5): one in-kernel
                # pltpu.bitcast + cast replaces the whole u8 unpack chain
                # (pallas_w4.Quantized4bit). The jit boundary stays uint8,
                # so the r4 relay device_put recursion is gone; measured
                # +4.2% e2e (1B W4A8 19,314 vs 18,527, AB_r5kernel.jsonl)
                # and bit-level parity on-chip (tools/tpu_sanity_r5.py).
                # Non-32-multiple group sizes keep u8 planes — the cast
                # result's sublane group slices wouldn't tile.
                from scratchpad_tpu.ops.quant.pallas_w4 import to_4bit
                from scratchpad_tpu.ops.quant.w4a16 import QuantizedLinear

                def conv4(v):
                    if (
                        isinstance(v, QuantizedLinear)
                        and v.group_size % 32 == 0
                    ):
                        return to_4bit(v)
                    return v

                self.params["layers_q"] = {
                    k: conv4(v) for k, v in self.params["layers_q"].items()
                }
                if "lm_head_q" in self.params:
                    self.params["lm_head_q"] = conv4(self.params["lm_head_q"])
            if mesh is not None and self.pp_size > 1:
                from scratchpad_tpu.parallel.pp import pp_param_specs

                assert "layers_q" not in self.params, (
                    "PP with quantized weights: not yet"
                )
                base = (
                    self.model.param_specs()
                    if mesh.shape.get("tp", 1) > 1
                    else None
                )
                self.params = place_params(
                    self.params,
                    pp_param_specs(self.params, base_specs=base),
                    mesh,
                )
            elif mesh is not None:
                specs = self.model.param_specs()
                if self.dp_attention:
                    from scratchpad_tpu.models.common import (
                        dp_attention_respec,
                    )

                    specs = dp_attention_respec(
                        specs, type(self.model).ATTN_PARAM_KEYS
                    )
                if "layers_q" in self.params:
                    if self.args.quantization == "fp8":
                        from scratchpad_tpu.ops.quant.fp8 import fp8_param_specs

                        specs = fp8_param_specs(specs, self.params)
                    else:
                        from scratchpad_tpu.ops.quant.w4a16 import (
                            quant_param_specs,
                        )

                        specs = quant_param_specs(specs, self.params)
                self.params = place_params(self.params, specs, mesh)
            elif quantizing:
                self.params = jax.device_put(self.params, jax.devices()[0])
        self.param_bytes = sum(
            x.size * x.dtype.itemsize for x in jax.tree.leaves(self.params)
        )
        logger.info(
            "params ready: %.2f GiB in %.1fs",
            self.param_bytes / 2**30,
            time.monotonic() - t0,
        )

        # ---- KV cache sizing (profile_max_num_token analogue,
        #      reference: model_executor/model_runner.py:333-371)
        self.max_context_len = server_args.context_length or cfg.context_len
        num_tokens = self._profile_kv_tokens()
        num_pages = num_tokens // self.page_size + 1  # +1 = reserved dump page
        from scratchpad_tpu.memory.kv_cache import padded_head_dim

        # lane-padding is only required by the paged Pallas kernels; the XLA
        # gather backend reads padded bytes (the slice doesn't fuse), so keep
        # the cache tight when XLA serves attention
        cache_head_dim = (
            padded_head_dim(cfg.head_dim)
            if self.attention_backend in ("pallas", "ragged", "ragged_tp", "gqa", "gqa_tp", "gqa_xla")
            else cfg.head_dim
        )
        if self.kv_packed:
            cache_head_dim = 128  # one K|V row per head: 2 x 64 lanes
        if cfg.is_mla:
            # latent cache: one [c_kv | k_rope] vector per token per layer
            assert self.args.kv_cache_dtype not in ("int8", "fp8"), (
                "quantized KV not supported for MLA yet"
            )
            cache_head_dim = self.model.mla_latent_dim
        # cross-attention models keep paged KV only for SELF layers and a
        # per-request slot buffer for cross K/V (Mllama)
        num_kv_layers = getattr(
            self.model, "num_kv_layers", cfg.num_hidden_layers
        )
        cross_kw = {}
        if getattr(self.model, "has_cross_attention", False):
            cross_kw = dict(
                cross_layers=len(self.model.cross_idx),
                # tiled models produce tiles x patches cross rows
                cross_len=self.model.vision.num_patches
                * self.model.vision.max_tiles,
                cross_slots=self.args.cross_kv_slots + 1,  # +1 scratch slot 0
            )
        self.kv_config = KVCacheConfig(
            num_layers=num_kv_layers,
            num_pages=num_pages,
            page_size=self.page_size,
            num_kv_heads=cfg.num_kv_heads,
            head_dim=cache_head_dim,
            dtype=self._dtype(),
            quantized=self.args.kv_cache_dtype in ("int8", "fp8"),
            quant_dtype=(
                jnp.float8_e4m3fn
                if self.args.kv_cache_dtype == "fp8"
                else jnp.int8
            ),
            mla=cfg.is_mla,
            packed=self.kv_packed,
            lane_heads=self.kv_lane_heads,
            inline_scale=self.kv_inline,
            **cross_kw,
        )
        self.kv_cache = create_kv_cache(
            self.kv_config, mesh, tp_axis=None if self.dp_attention else "tp"
        )

        # ---- allocators (page 0 reserved as the padding dump page)
        self.page_allocator = PageAllocator(num_pages, self.page_size)
        dump = self.page_allocator.alloc(1)
        assert dump is not None and dump[0] == 0
        self.max_pages_per_req = -(-self.max_context_len // self.page_size)
        self.max_running_requests = min(
            self.args.max_running_requests, num_pages - 1
        )
        self.req_slots = ReqSlotAllocator(
            self.max_running_requests, self.max_pages_per_req
        )
        self.max_total_num_tokens = (num_pages - 1) * self.page_size
        logger.info(
            "KV pool: %d pages x %d tokens (%.2f GiB), max_running=%d",
            num_pages - 1,
            self.page_size,
            num_pages * self.page_size * self.kv_config.bytes_per_token() / 2**30,
            self.max_running_requests,
        )

        # experimental transposed weight storage (single-chip): store the
        # decoder matmul stacks [L, out, in] so TPU dots consume the param
        # layout directly (see models/llama.py lin); SPTPU_WT=0 disables
        import os as _os

        self.params = self._maybe_transpose_stacks(self.params)

        self._rng = jax.random.PRNGKey(self.args.random_seed)
        self._jit_step = jax.jit(
            self._step_impl,
            static_argnames=("return_logprobs",),
            donate_argnames=("kv",),
        )
        self._jit_decode_multi = jax.jit(
            self._decode_multi_impl,
            static_argnames=("num_steps",),
            donate_argnames=("kv",),
        )
        self._jit_packed_extend = jax.jit(
            self._packed_extend_impl,
            static_argnames=("T", "B", "P", "use_sp", "sp_prefix"),
            donate_argnames=("kv",),
        )
        self._jit_packed_decode = jax.jit(
            self._packed_decode_impl,
            static_argnames=("B", "P", "num_steps"),
            donate_argnames=("kv",),
        )
        self._base_key = jax.random.PRNGKey(self.args.random_seed + 1)
        self._step_counter = 0
        # CPU parameter offload (reference: memory/param_offload.py:155
        # ParameterOffloadManager + prefetch worker): decoder layer groups
        # live in host memory and stream through the device double-buffered
        self.param_offload = bool(self.args.enable_param_offload)
        if self.param_offload:
            self._init_param_offload()
        # data-parallel batch sharding: when the mesh has a dp axis, batch
        # rows (and flat tokens) are sharded across it; XLA partitions the
        # whole step accordingly
        self._dp_shard = (
            mesh is not None
            and "dp" in mesh.axis_names
            and mesh.shape["dp"] > 1
        )
        # sequence-parallel prefill (beyond reference — SURVEY.md §2.7):
        # fresh unchunked long prompts run ring attention over the mesh's
        # "sp" axis; everything else about the step (KV page writes,
        # sampling) is unchanged, so decode continues off the same cache
        self.sp_size = mesh.shape.get("sp", 1) if mesh is not None else 1
        self.sp_prefill_tokens = 0
        if (
            self.args.enable_sp_prefill
            and self.sp_size > 1
            and not cfg.is_mla
            and not getattr(self.model, "has_cross_attention", False)
            and self.args.kv_cache_dtype not in ("int8", "fp8")
        ):
            from scratchpad_tpu.parallel import make_sp_extend_attention

            self._sp_attend = make_sp_extend_attention(mesh)
            self.sp_prefill_tokens = (
                self.args.sp_prefill_tokens
                or self.args.chunked_prefill_size * self.sp_size
            )
            # extend the prefill bucket ladder to cover sp-sized prompts
            b = self.args.prefill_token_buckets[-1]
            while b < self.sp_prefill_tokens:
                b *= 2
                self.args.prefill_token_buckets.append(b)

    def _dtype(self):
        return {"bfloat16": jnp.bfloat16, "float32": jnp.float32, "float16": jnp.float16}[
            self.args.dtype
        ]

    def _profile_kv_tokens(self) -> int:
        if self.args.max_total_tokens:
            return self.args.max_total_tokens
        dev = jax.devices()[0]
        stats = {}
        try:
            stats = dev.memory_stats() or {}
        except Exception:
            pass
        limit = stats.get("bytes_limit")
        if limit:
            in_use = stats.get("bytes_in_use", self.param_bytes)
            budget = int(limit * self.args.mem_fraction_static) - in_use
            per_tok = self.kv_bytes_per_token()
            tokens = max(budget // per_tok, 4096)
            return int(tokens)
        # CPU / unknown platform default
        return 2**16

    def kv_bytes_per_token(self) -> int:
        from scratchpad_tpu.memory.kv_cache import padded_head_dim

        cfg = self.model_config
        itemsize = (
            1
            if self.args.kv_cache_dtype in ("int8", "fp8")
            else jnp.dtype(self._dtype()).itemsize
        )
        hd = (
            padded_head_dim(cfg.head_dim)
            if getattr(self, "attention_backend", "xla") in ("pallas", "ragged", "ragged_tp", "gqa", "gqa_tp", "gqa_xla")
            else cfg.head_dim
        )
        if cfg.is_mla:
            return (
                cfg.num_hidden_layers * self.model.mla_latent_dim * itemsize
            )
        if getattr(self, "kv_packed", False):
            # one 128-lane K|V row per kv head (memory/kv_cache.py packed)
            return cfg.num_hidden_layers * cfg.num_kv_heads * 128 * itemsize
        return 2 * cfg.num_hidden_layers * cfg.num_kv_heads * hd * itemsize

    # ------------------------------------------------- packed single-RPC path
    #
    # Through a high-latency host<->device link every buffer transfer costs a
    # round trip, so the hot path packs ALL step inputs into one int32 and one
    # f32 buffer and returns one f32 buffer (token ids bitcast into float
    # lanes). The reference has no analogue — CUDA launches are ~micros —
    # but this is what makes serving viable over remote TPU links and it
    # also minimises dispatch overhead on local hosts.

    def _bucket_dims(self, wb: WorkerBatch) -> tuple[int, int, int]:
        B_real = len(wb.seq_lens)
        if wb.mode == ForwardMode.DECODE:
            B = _next_bucket(self.args.decode_bs_buckets, B_real)
            T = B
        else:
            B = _pow2_bucket(B_real, 1, max(self.args.max_running_requests, 1))
            T = _next_bucket(self.args.prefill_token_buckets, len(wb.tokens))
        P_real = wb.page_table.shape[1] if wb.page_table.size else 1
        P = _pow2_bucket(max(P_real, 1), 4, self.max_pages_per_req)
        return T, B, P

    def _pack_host(self, wb: WorkerBatch, T: int, B: int, P: int):
        # adapter ids/slots ride the packed buffer once toppings are
        # attached (zero slots = the no-op adapter), so multi-adapter
        # serving keeps the 2-buffer transfer + fused windows
        from scratchpad_tpu.toppings.manager import MAX_ACTIVE_TOPPINGS

        n_adapter = (
            MAX_ACTIVE_TOPPINGS + B if self.toppings_manager is not None else 0
        )
        ints = np.zeros(4 * T + 4 * B + B * P + n_adapter + 1, np.int32)
        o = 0

        def put(x, n, fill=0):
            nonlocal o
            seg = ints[o : o + n]
            if fill:
                seg[:] = fill
            seg[: len(x)] = x
            o += n

        put(wb.tokens, T)
        put(wb.positions, T)
        put(wb.out_cache_loc, T)
        put(wb.req_indices, T, fill=B - 1)
        put(wb.seq_lens, B)
        put(wb.extend_lens, B)
        csum = np.cumsum(wb.extend_lens)
        put(np.maximum(csum - 1, 0), B)  # last_token_idx
        si = wb.sampling_info
        put(
            np.where(si.top_k > 0, si.top_k, self.model_config.vocab_size),
            B,
            fill=self.model_config.vocab_size,
        )
        if self.toppings_manager is not None:
            from scratchpad_tpu.toppings.manager import MAX_ACTIVE_TOPPINGS

            put(
                wb.active_adapters
                if wb.active_adapters is not None
                else np.zeros(MAX_ACTIVE_TOPPINGS, np.int32),
                MAX_ACTIVE_TOPPINGS,
            )
            put(
                wb.adapter_slots
                if wb.adapter_slots is not None
                else np.zeros(B, np.int32),
                B,
            )
        pt = np.zeros((B, P), np.int32)
        br, pr = wb.page_table.shape if wb.page_table.size else (0, 0)
        pt[:br, : min(pr, P)] = wb.page_table[:, :P]
        ints[o : o + B * P] = pt.reshape(-1)
        self._step_counter += 1
        ints[-1] = self._step_counter  # rng step id, folded on device

        floats = np.zeros(3 * B, np.float32)
        floats[0:B][: len(si.temperature)] = si.temperature
        floats[B : 2 * B] = 1.0
        floats[B : 2 * B][: len(si.top_p)] = si.top_p
        floats[2 * B : 3 * B][: len(si.min_p)] = si.min_p
        return ints, floats

    def _unpack(self, ints, floats, T: int, B: int, P: int, mode: ForwardMode):
        o = 0

        def take(n):
            nonlocal o
            seg = ints[o : o + n]
            o += n
            return seg

        tokens = take(T)
        positions = take(T)
        out_loc = take(T)
        req_idx = take(T)
        seq_lens = take(B)
        extend_lens = take(B)
        last_idx = take(B)
        top_k = take(B)
        active_adapters = adapter_slots = None
        if self.toppings_manager is not None:
            from scratchpad_tpu.toppings.manager import MAX_ACTIVE_TOPPINGS

            active_adapters = take(MAX_ACTIVE_TOPPINGS)
            adapter_slots = take(B)
        page_table = take(B * P).reshape(B, P)
        meta = ForwardMeta(
            mode=mode,
            tokens=tokens,
            positions=positions,
            out_cache_loc=out_loc,
            req_indices=req_idx,
            page_table=page_table,
            seq_lens=seq_lens,
            extend_lens=extend_lens,
            last_token_idx=last_idx,
            active_adapters=active_adapters,
            adapter_slots=adapter_slots,
        )
        sinfo = SamplingBatchInfo(
            temperature=floats[0:B],
            top_p=floats[B : 2 * B],
            top_k=top_k,
            min_p=floats[2 * B : 3 * B],
        )
        return meta, sinfo

    @staticmethod
    def _pack_out(ids: jax.Array, chosen: jax.Array) -> jax.Array:
        """Stack ids with logprobs (bitcast to i32) into one INT output
        buffer. Int lanes, not float: small token ids bitcast to f32 are
        denormals, and XLA's flush-to-zero (observed in GSPMD/sp programs)
        silently zeroes them; integer lanes are always exact."""
        return jnp.stack(
            [ids, jax.lax.bitcast_convert_type(chosen, jnp.int32)]
        )

    def _packed_extend_impl(self, params, kv, ints, floats, key, T, B, P,
                            use_sp=False, sp_prefix=0):
        meta, sinfo = self._unpack(ints, floats, T, B, P, ForwardMode.EXTEND)
        if sp_prefix:
            meta = dataclasses.replace(meta, sp_prefix_bucket=sp_prefix)
        step_key = jax.random.fold_in(key, ints[-1])
        if use_sp:
            # trace-time swap: this jit variant's extend attention is the
            # ring op over the mesh "sp" axis (parallel/sp.py)
            prev = self.model.extend_attention
            self.model.extend_attention = self._sp_attend
            try:
                kv, logits = self.model(params, kv, meta)
            finally:
                self.model.extend_attention = prev
        else:
            kv, logits = self.model(params, kv, meta)
        ids, chosen = sample(logits, sinfo, step_key, full_logprobs=False)
        return kv, self._host_out(self._pack_out(ids, chosen)[:, None, :])

    def _packed_decode_impl(
        self, params, kv, ints, floats, key, B, P, num_steps, prev_tokens=None
    ):
        meta, sinfo = self._unpack(ints, floats, B, B, P, ForwardMode.DECODE)
        if prev_tokens is not None:
            # window pipelining: the first input tokens are the previous
            # window's last samples, still resident on device
            meta = dataclasses.replace(meta, tokens=prev_tokens)
        step_key = jax.random.fold_in(key, ints[-1])
        kv, all_ids, all_chosen = self._decode_multi_impl(
            params, kv, meta, sinfo, step_key, num_steps
        )
        out = jnp.stack(
            [
                all_ids,
                jax.lax.bitcast_convert_type(all_chosen, jnp.int32),
            ]
        )
        # last samples stay on device for chaining
        return kv, self._host_out(out), all_ids[-1]

    def _packed_supported(self, wb: WorkerBatch) -> bool:
        si = wb.sampling_info
        return (
            wb.vocab_bitmask is None
            and si.output_token_counts is None
            and si.logit_bias is None
            and si.custom_processors is None
            # adapters pack once the manager is attached (zero-slot no-op)
            and (wb.active_adapters is None or self.toppings_manager is not None)
            and wb.input_embeds is None
            and wb.mm_spans is None
            and wb.mrope_positions is None
            and wb.rope_delta is None
            and wb.cross_slots is None
            and not wb.return_top_logprobs
            and not self._dp_shard
            and not self.param_offload
        )

    def encode_images(
        self, pixel_values: np.ndarray, ar_ids=None, n_tiles=None
    ) -> np.ndarray:
        """Run the VLM's vision tower + projector: [N,C,S,S] -> [N,P,H]
        (tiled Mllama: [N,T,C,S,S] + aspect-ratio ids / tile counts ->
        [N, T*P, H])."""
        if not hasattr(self.model, "encode_images"):
            raise ValueError(
                f"{self.model_config.architecture} is not a multimodal model"
            )
        if ar_ids is not None:
            if not hasattr(self, "_jit_encode_tiled"):
                self._jit_encode_tiled = jax.jit(self.model.encode_images)
            feats = self._jit_encode_tiled(
                self.params,
                jnp.asarray(pixel_values, self._dtype()),
                jnp.asarray(ar_ids, jnp.int32),
                jnp.asarray(n_tiles, jnp.int32),
            )
            return np.asarray(feats, np.float32)
        if not hasattr(self, "_jit_encode_images"):
            self._jit_encode_images = jax.jit(self.model.encode_images)
        feats = self._jit_encode_images(
            self.params, jnp.asarray(pixel_values, self._dtype())
        )
        return np.asarray(feats, np.float32)

    def encode_videos(self, frames: np.ndarray) -> np.ndarray:
        """Vision tower over REAL temporal patches: [T,C,S,S] frames ->
        [grid_t, P, H] (models/qwen2_vl.py encode_video)."""
        if not hasattr(self.model, "encode_video"):
            raise ValueError(
                f"{self.model_config.architecture} does not support video"
            )
        if not hasattr(self, "_jit_encode_video"):
            self._jit_encode_video = jax.jit(self.model.encode_video)
        feats = self._jit_encode_video(
            self.params, jnp.asarray(frames, self._dtype())
        )
        return np.asarray(feats, np.float32)

    def image_token_embedding(self) -> np.ndarray:
        """The learned <|image|> embedding row (Mllama placeholder)."""
        idx = self.model.image_token_index
        return np.asarray(self.params["embed"][idx], np.float32)

    def attach_toppings(self, manager) -> None:
        """Merge the adapter pools into the model params pytree."""
        self.toppings_manager = manager
        self.params = {
            **{k: v for k, v in self.params.items() if k != "toppings"},
            "toppings": manager.device_pools(),
        }

    def run_extend(self, wb: WorkerBatch):
        """One extend step; returns (ids[B_real], logprobs[B_real], tops)."""
        B_real = len(wb.seq_lens)
        if self.param_offload:
            out = self._offload_forward_and_sample(wb)
            return (
                np.asarray(out.next_token_ids)[:B_real],
                np.asarray(out.chosen_logprobs)[:B_real],
                None,
            )
        if wb.return_top_logprobs:
            meta, sinfo = self._pad_to_buckets(wb)
            self._rng, step_rng = jax.random.split(self._rng)
            self.kv_cache, ids, chosen, topv, topi = self._jit_step(
                self.params, self.kv_cache, meta, sinfo, step_rng,
                return_logprobs=True,
            )
            return (
                np.asarray(ids)[:B_real],
                np.asarray(chosen)[:B_real],
                (np.asarray(topv)[:B_real], np.asarray(topi)[:B_real]),
            )
        if not self._packed_supported(wb):
            out = self.forward_and_sample(wb)
            return (
                np.asarray(out.next_token_ids)[:B_real],
                np.asarray(out.chosen_logprobs)[:B_real],
                None,
            )
        T, B, P = self._bucket_dims(wb)
        use_sp = self._sp_extend_ok(wb, T)
        sp_prefix = self._sp_prefix_bucket(wb) if use_sp else 0
        ints, floats = self._pack_host(wb, T, B, P)
        self.kv_cache, out = self._jit_packed_extend(
            self.params, self.kv_cache, ints, floats, self._base_key, T, B, P,
            use_sp=use_sp, sp_prefix=sp_prefix,
        )
        host = np.asarray(out)  # ONE fetch
        ids = host[0, 0, :B_real]
        return ids, host[1, 0, :B_real].view(np.float32), None

    def _sp_extend_ok(self, wb: WorkerBatch, T_bucket: int) -> bool:
        """Route this extend through sequence-parallel ring attention?
        Scope (parallel/sp.py): several FRESH requests per batch (block-
        diagonal ring masks), or ONE request with a cached radix prefix;
        long enough to matter; padded T divisible by the sp axis."""
        if self.sp_prefill_tokens <= 0:
            return False
        if len(wb.tokens) <= self.args.chunked_prefill_size:
            return False
        if T_bucket % self.sp_size != 0:
            return False
        B = len(wb.seq_lens)
        fresh = all(
            int(wb.extend_lens[i]) == int(wb.seq_lens[i]) for i in range(B)
        )
        if fresh:
            return True
        # cached prefix: single request only (the replicated prefix block
        # is gathered for request 0)
        return B == 1

    def _sp_prefix_bucket(self, wb: WorkerBatch) -> int:
        """Static gather size covering request 0's cached prefix."""
        c = int(wb.seq_lens[0]) - int(wb.extend_lens[0])
        if len(wb.seq_lens) > 1 or c <= 0:
            return 0
        b = 64
        while b < c:
            b *= 2
        return b

    def run_decode_window(self, wb: WorkerBatch, num_steps: int):
        """K fused decode steps; returns (ids[K, B_real], logprobs[K, B_real],
        tops) where tops is None or ([K?, B, k], [K?, B, k]) top logprobs."""
        B_real = len(wb.seq_lens)
        if self.param_offload:
            assert num_steps == 1, "param offload forces single-step windows"
            out = self._offload_forward_and_sample(wb)
            return (
                np.asarray(out.next_token_ids)[None, :B_real],
                np.asarray(out.chosen_logprobs)[None, :B_real],
                None,
            )
        if wb.return_top_logprobs:
            assert num_steps == 1, "top-logprobs forces single-step windows"
            meta, sinfo = self._pad_to_buckets(wb)
            self._rng, step_rng = jax.random.split(self._rng)
            self.kv_cache, ids, chosen, topv, topi = self._jit_step(
                self.params, self.kv_cache, meta, sinfo, step_rng,
                return_logprobs=True,
            )
            return (
                np.asarray(ids)[None, :B_real],
                np.asarray(chosen)[None, :B_real],
                (np.asarray(topv)[None, :B_real], np.asarray(topi)[None, :B_real]),
            )
        if not self._packed_supported(wb):
            if num_steps == 1:
                out = self.forward_and_sample(wb)
                return (
                    np.asarray(out.next_token_ids)[None, :B_real],
                    np.asarray(out.chosen_logprobs)[None, :B_real],
                    None,
                )
            out = self.decode_multi(wb, num_steps)
            return (
                np.asarray(out.next_token_ids)[:, :B_real],
                np.asarray(out.chosen_logprobs)[:, :B_real],
                None,
            )
        pw = self.dispatch_decode_window(wb, num_steps)
        return self.fetch_decode_window(pw)

    def dispatch_decode_window(
        self, wb: WorkerBatch, num_steps: int, prev_tokens=None
    ):
        """Enqueue a decode window WITHOUT fetching results; returns a
        pending-window handle. ``prev_tokens`` chains the previous window's
        device-resident last samples as this window's first inputs."""
        B_real = len(wb.seq_lens)
        _, B, P = self._bucket_dims(wb)
        ints, floats = self._pack_host(wb, B, B, P)
        self.kv_cache, out, last_ids = self._jit_packed_decode(
            self.params,
            self.kv_cache,
            ints,
            floats,
            self._base_key,
            B,
            P,
            num_steps,
            prev_tokens,
        )
        return (out, last_ids, B_real)

    def fetch_decode_window(self, pending):
        out, _, B_real = pending
        host = np.asarray(out)  # ONE fetch
        ids = host[0, :, :B_real]
        return ids, host[1, :, :B_real].view(np.float32), None

    # ------------------------------------------------------------ multi-step

    def _decode_multi_impl(self, params, kv, meta, sinfo, rng, num_steps):
        """K decode steps fused in one dispatch: on-device sampling feeds the
        next step's input, so the host is only consulted once per window.

        This replaces BOTH the reference's CUDA-graph replay loop and its
        overlap scheduler's future-token-ids machinery
        (reference: managers/tp_worker_client.py:34-40): the "future token"
        is simply the scan carry that never leaves the device.
        """
        ps = self.page_size
        B = meta.batch_size

        def body(carry, k):
            kv, tokens, positions, out_counts = carry
            loc = (
                meta.page_table[jnp.arange(B), positions // ps] * ps
                + positions % ps
            )
            step_meta = ForwardMeta(
                mode=ForwardMode.DECODE,
                tokens=tokens,
                positions=positions,
                out_cache_loc=loc,
                req_indices=jnp.arange(B, dtype=jnp.int32),
                page_table=meta.page_table,
                seq_lens=positions + 1,
                extend_lens=jnp.ones(B, jnp.int32),
                last_token_idx=jnp.arange(B, dtype=jnp.int32),
                active_adapters=meta.active_adapters,
                adapter_slots=meta.adapter_slots,
                rope_delta=meta.rope_delta,
                cross_slots=meta.cross_slots,
            )
            kv, logits = self.model(params, kv, step_meta)
            sinfo_k = sinfo
            if sinfo.output_token_counts is not None:
                sinfo_k = dataclasses.replace(
                    sinfo, output_token_counts=out_counts
                )
            ids, chosen = sample(
                logits, sinfo_k, jax.random.fold_in(rng, k),
                full_logprobs=False,
            )
            if out_counts is not None:
                out_counts = out_counts.at[jnp.arange(B), ids].add(1)
            return (kv, ids, positions + 1, out_counts), (ids, chosen)

        carry0 = (kv, meta.tokens, meta.positions, sinfo.output_token_counts)
        (kv, _, _, _), (all_ids, all_chosen) = jax.lax.scan(
            body, carry0, jnp.arange(num_steps, dtype=jnp.int32)
        )
        return kv, self._host_out(all_ids), self._host_out(all_chosen)  # [K, B]

    def decode_multi(self, wb: WorkerBatch, num_steps: int) -> StepOutput:
        """Run a K-step decode window. wb describes the FIRST step; the page
        table must already cover num_steps more tokens per request."""
        meta, sinfo = self._pad_to_buckets(wb)
        if self._dp_shard:
            meta, sinfo = self._shard_batch(meta, sinfo)
        self._rng, step_rng = jax.random.split(self._rng)
        self.kv_cache, ids, chosen = self._jit_decode_multi(
            self.params, self.kv_cache, meta, sinfo, step_rng, num_steps
        )
        return StepOutput(
            next_token_ids=ids,
            chosen_logprobs=chosen,
            batch_size=len(wb.seq_lens),
        )

    # ------------------------------------------------------------------- step

    TOP_LOGPROBS_K = 8

    def _host_out(self, x):
        """Host-bound step outputs: replicate across the mesh so the leader
        (and every host) can fetch them locally. Needed when the mesh spans
        processes (multi-host dp shards output rows); free elsewhere."""
        if self.mesh is not None and getattr(self.args, "num_nodes", 1) > 1:
            from jax.sharding import NamedSharding, PartitionSpec as P

            return jax.lax.with_sharding_constraint(
                x, NamedSharding(self.mesh, P())
            )
        return x

    def _step_impl(self, params, kv, meta, sinfo, rng, return_logprobs=False):
        kv, logits = self.model(params, kv, meta)
        if return_logprobs:
            ids, logprobs = sample(logits, sinfo, rng)
            chosen = jnp.take_along_axis(logprobs, ids[:, None], axis=-1)[:, 0]
            topv, topi = jax.lax.top_k(logprobs, self.TOP_LOGPROBS_K)
            return kv, *map(self._host_out, (ids, chosen, topv, topi))
        ids, chosen = sample(logits, sinfo, rng, full_logprobs=False)
        return kv, self._host_out(ids), self._host_out(chosen)

    def _shard_batch(self, meta: ForwardMeta, sinfo: SamplingBatchInfo):
        """device_put batch arrays with their leading dim over the dp axis."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        def put(x):
            if x is None:
                return None
            x = np.asarray(x)
            dp = self.mesh.shape["dp"]
            if x.shape[0] % dp != 0:
                return x  # unshardable remainder; leave replicated
            spec = P("dp", *([None] * (x.ndim - 1)))
            return jax.device_put(x, NamedSharding(self.mesh, spec))

        meta = jax.tree.map(put, meta)
        sinfo = jax.tree.map(put, sinfo)
        return meta, sinfo

    def forward_and_sample(self, wb: WorkerBatch) -> StepOutput:
        meta, sinfo = self._pad_to_buckets(wb)
        if self._dp_shard:
            meta, sinfo = self._shard_batch(meta, sinfo)
        self._rng, step_rng = jax.random.split(self._rng)
        self.kv_cache, ids, chosen = self._jit_step(
            self.params, self.kv_cache, meta, sinfo, step_rng
        )
        return StepOutput(
            next_token_ids=ids,
            chosen_logprobs=chosen,
            batch_size=len(wb.seq_lens),
        )

    # -------------------------------------------------------------- bucketing

    def _pad_to_buckets(self, wb: WorkerBatch):
        B_real = len(wb.seq_lens)
        if wb.mode == ForwardMode.DECODE:
            B = _next_bucket(self.args.decode_bs_buckets, B_real)
            T = B
        else:
            B = _pow2_bucket(B_real, 1, max(self.args.max_running_requests, 1))
            T = _next_bucket(self.args.prefill_token_buckets, len(wb.tokens))
        P_real = wb.page_table.shape[1] if wb.page_table.size else 1
        P = _pow2_bucket(max(P_real, 1), 4, self.max_pages_per_req)
        T_real = len(wb.tokens)

        def pad1(x, n, fill=0):
            out = np.full(n, fill, x.dtype if x.size else np.int32)
            out[: len(x)] = x
            return out

        tokens = pad1(wb.tokens.astype(np.int32), T)
        positions = pad1(wb.positions.astype(np.int32), T)
        out_loc = pad1(wb.out_cache_loc.astype(np.int32), T)  # dump slot 0
        req_idx = pad1(wb.req_indices.astype(np.int32), T, fill=B - 1)
        page_table = np.zeros((B, P), np.int32)
        if wb.page_table.size:
            w = min(P_real, P)
            page_table[:B_real, :w] = wb.page_table[:, :w]
        seq_lens = pad1(wb.seq_lens.astype(np.int32), B)
        extend_lens = pad1(wb.extend_lens.astype(np.int32), B)
        # last flat token index per request row
        last_idx = np.zeros(B, np.int32)
        csum = np.cumsum(wb.extend_lens)
        last_idx[:B_real] = np.maximum(csum - 1, 0)

        adapter_slots = None
        if wb.active_adapters is not None:
            adapter_slots = pad1(wb.adapter_slots.astype(np.int32), B)
        input_embeds = None
        if wb.input_embeds is not None:
            input_embeds = np.zeros((T, wb.input_embeds.shape[1]), np.float32)
            input_embeds[:T_real] = wb.input_embeds
        mrope_positions = None
        if wb.mrope_positions is not None:
            mrope_positions = np.zeros((3, T), np.int32)
            mrope_positions[:, :T_real] = wb.mrope_positions
        rope_delta = None
        if wb.rope_delta is not None:
            rope_delta = pad1(wb.rope_delta.astype(np.int32), B)
        mm_spans = None
        if wb.mm_spans is not None:
            mm_spans = np.zeros((B,) + wb.mm_spans.shape[1:], np.int32)
            mm_spans[:B_real] = wb.mm_spans
        cross_slots = cross_states = cross_lens = None
        if wb.cross_slots is not None:
            cross_slots = pad1(wb.cross_slots.astype(np.int32), B)
        if wb.cross_states is not None:
            cross_states = np.zeros((B,) + wb.cross_states.shape[1:], np.float32)
            cross_states[: wb.cross_states.shape[0]] = wb.cross_states
        if wb.cross_lens is not None:
            cross_lens = pad1(wb.cross_lens.astype(np.int32), B)
        meta = ForwardMeta(
            mode=wb.mode,
            tokens=tokens,
            positions=positions,
            out_cache_loc=out_loc,
            req_indices=req_idx,
            page_table=page_table,
            seq_lens=seq_lens,
            extend_lens=extend_lens,
            last_token_idx=last_idx,
            active_adapters=wb.active_adapters,
            adapter_slots=adapter_slots,
            input_embeds=input_embeds,
            mrope_positions=mrope_positions,
            rope_delta=rope_delta,
            cross_slots=cross_slots,
            cross_states=cross_states,
            cross_lens=cross_lens,
            mm_spans=mm_spans,
        )
        si = wb.sampling_info
        V = self.model_config.vocab_size

        def padB(x, fill):
            if x is None:
                return None
            out = np.full((B,) + x.shape[1:], fill, x.dtype)
            out[: x.shape[0]] = x
            return out

        sinfo = SamplingBatchInfo(
            temperature=padB(si.temperature, 0.0),
            top_p=padB(si.top_p, 1.0),
            top_k=padB(si.top_k, V),
            min_p=padB(si.min_p, 0.0),
            presence_penalty=padB(si.presence_penalty, 0.0),
            frequency_penalty=padB(si.frequency_penalty, 0.0),
            repetition_penalty=padB(si.repetition_penalty, 1.0),
            output_token_counts=padB(si.output_token_counts, 0),
            input_token_mask=padB(si.input_token_mask, False),
            vocab_bitmask=padB(wb.vocab_bitmask, 0xFFFFFFFF)
            if wb.vocab_bitmask is not None
            else None,
            logit_bias=padB(si.logit_bias, 0.0),
            custom_processors=si.custom_processors,
            # mask is [P, B_real]: pad the ROW axis (padding rows keep the
            # unprocessed logits; they are never read anyway)
            custom_proc_mask=(
                np.pad(
                    si.custom_proc_mask,
                    [(0, 0), (0, B - si.custom_proc_mask.shape[1])],
                )
                if si.custom_proc_mask is not None
                else None
            ),
            custom_proc_params=(
                tuple(
                    {k: padB(v, 0.0) for k, v in d.items()}
                    for d in si.custom_proc_params
                )
                if si.custom_proc_params is not None
                else None
            ),
        )
        return meta, sinfo

    # ------------------------------------------------------------- embeddings

    def _embed_impl(self, params, kv, meta):
        kv, hidden = self.model(params, kv, meta)
        emb = hidden.astype(jnp.float32)
        emb = emb / jnp.maximum(
            jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-9
        )
        return kv, self._host_out(emb)

    def _head_logits(self, params, h):
        """LM-head logits for hidden rows h — honors a quantized head
        (params["lm_head_q"], see quantize_lm_head)."""
        if "lm_head_q" in params:
            return self.model.quant_matmul(
                h, params["lm_head_q"], 0
            ).astype(jnp.float32)
        head = (
            params["embed"]
            if self.model_config.tie_word_embeddings
            else params["lm_head"]
        )
        return (h @ head.T).astype(jnp.float32)

    def run_embed(self, wb: WorkerBatch) -> np.ndarray:
        self._no_offload("embeddings")
        """Extend pass returning L2-normalised last-token hidden states
        (reference: scratchpad/nn/models/llama/llama_embedding.py)."""
        B_real = len(wb.seq_lens)
        meta, _ = self._pad_to_buckets(wb)
        meta = dataclasses.replace(meta, capture_hidden=True)
        if not hasattr(self, "_jit_embed"):
            self._jit_embed = jax.jit(self._embed_impl, donate_argnames=("kv",))
        self.kv_cache, emb = self._jit_embed(self.params, self.kv_cache, meta)
        return np.asarray(emb)[:B_real]

    # ---------------------------------------------------------------- scoring

    def _score_impl(self, params, kv, meta):
        """Per-token next-token logprobs for the fed sequence (teacher
        forcing) — the prompt-logprob primitive behind perplexity eval
        (reference: `sp benchmark` lm-eval flow needs served logprobs)."""
        kv, h = self.model(params, kv, meta)  # [T, H]
        T = h.shape[0]
        # next-token targets: tokens shifted left (last position unused)
        targets = jnp.concatenate(
            [meta.tokens[1:], jnp.zeros(1, jnp.int32)]
        )

        def chunk_fn(args):
            hc, tc = args  # [C, H], [C]
            logits = self._head_logits(params, hc)  # [C, V]
            lse = jax.nn.logsumexp(logits, axis=-1)
            chosen = jnp.take_along_axis(logits, tc[:, None], axis=-1)[:, 0]
            return chosen - lse

        C = 128
        pad = (-T) % C
        hp = jnp.pad(h, [(0, pad), (0, 0)]).reshape(-1, C, h.shape[1])
        tp = jnp.pad(targets, [(0, pad)]).reshape(-1, C)
        lps = jax.lax.map(chunk_fn, (hp, tp)).reshape(-1)[:T]
        # [T] logprob of token t+1 given prefix..t
        return kv, self._host_out(lps)

    def _spec_verify_impl(self, params, kv, meta):
        """Greedy speculative verification: one extend forward over
        [last_token, draft_1..draft_k] rows per request, returning the
        greedy continuation at EVERY row (reference stubs this —
        spec_info.py:4-24; here it's a working ngram/prompt-lookup
        verifier). Gemma's logit softcap is monotonic, so argmax is
        unaffected; chosen logprobs are pre-softcap."""
        meta = dataclasses.replace(meta, capture_all_hidden=True)
        kv, h = self.model(params, kv, meta)  # [T, H]

        def chunk_fn(hc):
            logits = self._head_logits(params, hc)  # [C, V]
            ids = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            lse = jax.nn.logsumexp(logits, axis=-1)
            chosen = jnp.take_along_axis(logits, ids[:, None], axis=-1)[:, 0]
            return ids, chosen - lse

        T = h.shape[0]
        C = 128
        pad = (-T) % C
        hp = jnp.pad(h, [(0, pad), (0, 0)]).reshape(-1, C, h.shape[1])
        ids, lps = jax.lax.map(chunk_fn, hp)
        return kv, *map(self._host_out, (ids.reshape(-1)[:T], lps.reshape(-1)[:T]))

    def run_spec_verify_h(self, wb: WorkerBatch):
        """Like run_spec_verify but also returns the target features
        (post-final-norm hidden rows) for EAGLE draft conditioning."""
        self._no_offload("speculative verification")
        if not hasattr(self, "_jit_spec_verify_h"):

            def _impl(params, kv, meta):
                meta2 = dataclasses.replace(meta, capture_all_hidden=True)
                kv, h = self.model(params, kv, meta2)

                def chunk_fn(hc):
                    logits = self._head_logits(params, hc)
                    ids = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                    lse = jax.nn.logsumexp(logits, axis=-1)
                    chosen = jnp.take_along_axis(
                        logits, ids[:, None], axis=-1
                    )[:, 0]
                    return ids, chosen - lse

                T = h.shape[0]
                C = 128
                pad = (-T) % C
                hp = jnp.pad(h, [(0, pad), (0, 0)]).reshape(-1, C, h.shape[1])
                ids, lps = jax.lax.map(chunk_fn, hp)
                return kv, *map(
                    self._host_out,
                    (ids.reshape(-1)[:T], lps.reshape(-1)[:T], h),
                )

            self._jit_spec_verify_h = jax.jit(_impl, donate_argnums=(1,))
        meta, _ = self._pad_to_buckets(wb)
        self.kv_cache, ids, lps, h = self._jit_spec_verify_h(
            self.params, self.kv_cache, meta
        )
        T_real = len(wb.tokens)
        return (
            np.asarray(ids)[:T_real],
            np.asarray(lps)[:T_real],
            np.asarray(h, np.float32)[:T_real],
        )

    def run_extend_with_hidden(self, wb: WorkerBatch):
        """Extend returning (ids, chosen_logprobs, features[T_real, H]) —
        the EAGLE prefill path (features feed the draft's pair inputs)."""
        self._no_offload("eagle extend")
        assert not wb.return_top_logprobs
        if not hasattr(self, "_jit_extend_h"):

            def _impl(params, kv, meta, sinfo, rng):
                meta2 = dataclasses.replace(meta, capture_all_hidden=True)
                kv, h = self.model(params, kv, meta2)
                logits = self._head_logits(
                    params, jnp.take(h, meta.last_token_idx, axis=0)
                )
                ids, chosen = sample(
                    logits, sinfo, rng, full_logprobs=False
                )
                return kv, *map(self._host_out, (ids, chosen, h))

            self._jit_extend_h = jax.jit(_impl, donate_argnums=(1,))
        B_real = len(wb.seq_lens)
        T_real = len(wb.tokens)
        meta, sinfo = self._pad_to_buckets(wb)
        self._rng, step_rng = jax.random.split(self._rng)
        self.kv_cache, ids, chosen, h = self._jit_extend_h(
            self.params, self.kv_cache, meta, sinfo, step_rng
        )
        return (
            np.asarray(ids)[:B_real],
            np.asarray(chosen)[:B_real],
            np.asarray(h, np.float32)[:T_real],
        )

    def run_spec_verify(self, wb: WorkerBatch):
        self._no_offload("speculative verification")
        """Returns (greedy_ids[T_real], chosen_logprobs[T_real])."""
        if not hasattr(self, "_jit_spec_verify"):
            self._jit_spec_verify = jax.jit(
                self._spec_verify_impl, donate_argnums=(1,)
            )
        meta, _ = self._pad_to_buckets(wb)
        self.kv_cache, ids, lps = self._jit_spec_verify(
            self.params, self.kv_cache, meta
        )
        T_real = len(wb.tokens)
        return np.asarray(ids)[:T_real], np.asarray(lps)[:T_real]

    def _spec_verify_sampled_impl(
        self, params, kv, meta, sinfo, rng, return_hidden=False
    ):
        """SAMPLED speculative verification: one extend forward over
        [last_token, draft...] rows, sampling the target continuation at
        every row with the owning request's temperature/top-k/top-p/min-p.

        With deterministic proposals (ngram suffix lookup, greedy draft
        chains), the draft distribution q is a point mass, so the standard
        speculative-sampling accept rule min(1, p/q) with its residual
        resample reduces to: sample t_j ~ p_j at every row, accept while
        t_j equals the draft, and emit the first mismatching t_j as the
        correction — the emitted token is p_j-distributed either way, so
        the target sampling distribution is preserved exactly. (The
        reference never implemented speculative execution at all —
        model_executor/speculative/spec_info.py:4-24.)"""
        from scratchpad_tpu.sampling.batch_info import SamplingBatchInfo
        from scratchpad_tpu.sampling.sampler import sample

        meta2 = dataclasses.replace(meta, capture_all_hidden=True)
        kv, h = self.model(params, kv, meta2)  # [T, H]
        # per-TOKEN sampling params: gather the padded per-request rows by
        # the flat rows' owning request (padding rows point at a zeroed
        # request row -> greedy, harmless)
        ri = meta.req_indices
        softcap = self.model_config.logit_softcap

        def chunk_fn(args):
            hc, ric, idx = args
            logits = self._head_logits(params, hc)  # [C, V]
            if softcap:
                # unlike greedy verify (argmax is softcap-invariant), the
                # sampled distribution needs the served logits exactly
                logits = softcap * jnp.tanh(logits / softcap)
            info_c = SamplingBatchInfo(
                temperature=sinfo.temperature[ric],
                top_p=sinfo.top_p[ric],
                top_k=sinfo.top_k[ric],
                min_p=sinfo.min_p[ric],
            )
            ids, chosen = sample(
                logits, info_c, jax.random.fold_in(rng, idx),
                full_logprobs=False,
            )
            return ids, chosen

        T = h.shape[0]
        C = 128
        pad = (-T) % C
        hp = jnp.pad(h, [(0, pad), (0, 0)]).reshape(-1, C, h.shape[1])
        rip = jnp.pad(ri, [(0, pad)]).reshape(-1, C)
        ids, lps = jax.lax.map(
            chunk_fn, (hp, rip, jnp.arange(hp.shape[0], dtype=jnp.int32))
        )
        out = (ids.reshape(-1)[:T], lps.reshape(-1)[:T])
        if return_hidden:
            out = out + (h,)  # EAGLE feature conditioning
        return kv, *map(self._host_out, out)

    def run_spec_verify_sampled(self, wb: WorkerBatch, return_hidden=False):
        """Returns (sampled_ids[T_real], chosen_logprobs[T_real]) plus the
        target hidden rows when ``return_hidden`` (EAGLE conditioning)."""
        self._no_offload("speculative verification")
        if not hasattr(self, "_jit_spec_verify_sampled"):
            self._jit_spec_verify_sampled = jax.jit(
                self._spec_verify_sampled_impl,
                donate_argnums=(1,),
                static_argnames=("return_hidden",),
            )
        meta, sinfo = self._pad_to_buckets(wb)
        self._rng, rng = jax.random.split(self._rng)
        T_real = len(wb.tokens)
        if return_hidden:
            self.kv_cache, ids, lps, h = self._jit_spec_verify_sampled(
                self.params, self.kv_cache, meta, sinfo, rng,
                return_hidden=True,
            )
            return (
                np.asarray(ids)[:T_real],
                np.asarray(lps)[:T_real],
                np.asarray(h)[:T_real],
            )
        self.kv_cache, ids, lps = self._jit_spec_verify_sampled(
            self.params, self.kv_cache, meta, sinfo, rng
        )
        return np.asarray(ids)[:T_real], np.asarray(lps)[:T_real]

    # ------------------------------------------------------ parameter offload

    def _no_offload(self, what: str) -> None:
        if self.param_offload:
            raise NotImplementedError(
                f"{what} is not supported with enable_param_offload"
            )

    def _init_param_offload(self) -> None:
        """Move the stacked decoder weights to host memory in groups.

        TPU-native rework of the reference's ParameterOffloadManager
        (reference: memory/param_offload.py:155-587): instead of module
        hooks + a prefetch thread, the per-group forward streams group g+1
        to the device (async jax.device_put = the prefetch) while group g
        computes. Device peak holds <= 2 groups instead of all layers.
        Throughput trades for capacity exactly as in the reference; decode
        windows collapse to single steps."""
        from scratchpad_tpu.models.llama import LlamaForCausalLM

        if type(self.model).__call__ is not LlamaForCausalLM.__call__:
            raise ValueError(
                "enable_param_offload supports the stacked-decoder "
                "(Llama-family) forward only"
            )
        if self.mesh is not None:
            raise ValueError("enable_param_offload is single-device for now")
        G = max(2, self.args.param_offload_groups)
        L = self.model_config.num_hidden_layers
        bounds = np.linspace(0, L, G + 1).astype(int)
        layers = self.params.pop("layers")
        cpu = jax.devices("cpu")[0]
        self._offload_groups = []
        self._offload_ids = []
        for g in range(G):
            s, e = int(bounds[g]), int(bounds[g + 1])
            if s == e:
                continue
            self._offload_groups.append(
                jax.tree.map(lambda a: jax.device_put(a[s:e], cpu), layers)
            )
            self._offload_ids.append(jnp.arange(s, e, dtype=jnp.int32))
        del layers
        self._offload_device = jax.devices()[0]
        self._jit_ol_embed = jax.jit(self.model.embed_tokens)
        self._jit_ol_group = jax.jit(
            self.model.layers_forward, donate_argnames=("kv",)
        )

        def _finish_sample(params, x, meta, sinfo, rng):
            logits = self.model.finish(params, x, meta)
            ids, chosen = sample(logits, sinfo, rng, full_logprobs=False)
            return ids, chosen

        self._jit_ol_finish = jax.jit(_finish_sample)
        logger.info(
            "param offload: %d decoder groups in host memory",
            len(self._offload_groups),
        )

    def _offload_forward_and_sample(self, wb: WorkerBatch) -> StepOutput:
        """One step with host-resident layers streamed group by group; the
        next group's transfer (async device_put) overlaps this group's
        compute — the prefetch-worker analogue."""
        if wb.return_top_logprobs:
            raise NotImplementedError(
                "top_logprobs with enable_param_offload not supported"
            )
        meta, sinfo = self._pad_to_buckets(wb)
        self._rng, rng = jax.random.split(self._rng)
        x = self._jit_ol_embed(self.params, meta)
        kv = self.kv_cache
        self.kv_cache = None
        G = len(self._offload_groups)
        nxt = jax.device_put(self._offload_groups[0], self._offload_device)
        for g in range(G):
            cur = nxt
            if g + 1 < G:
                nxt = jax.device_put(
                    self._offload_groups[g + 1], self._offload_device
                )
            x, kv = self._jit_ol_group(
                self.params, cur, self._offload_ids[g], x, kv, meta
            )
        self.kv_cache = kv
        ids, chosen = self._jit_ol_finish(self.params, x, meta, sinfo, rng)
        return StepOutput(
            next_token_ids=ids,
            chosen_logprobs=chosen,
            batch_size=len(wb.seq_lens),
        )

    # ----------------------------------------------------- host KV tier I/O

    def gather_pages(self, page_ids: np.ndarray):
        """Fetch logical pages (all layers) to host: ([n, L, ps, KH, D],
        scales or None). Used by the CPU KV tier on radix eviction.

        On a mesh the pool is head-sharded, so the gather jits with a
        fully-replicated output sharding (XLA inserts the all-gather); the
        result is then fully addressable on every host, which is what makes
        the host tier work on multi-node engines — every host's arena holds
        identical full pages because this call replays in lockstep there."""
        n = len(page_ids)
        L = self.kv_config.num_layers
        P = self.kv_config.num_pages
        g = (
            np.arange(L, dtype=np.int64)[:, None] * P
            + np.asarray(page_ids, np.int64)[None, :]
        ).reshape(-1)
        if self.mesh is not None:
            if not hasattr(self, "_jit_gather_pages"):
                from jax.sharding import NamedSharding, PartitionSpec

                rep = NamedSharding(self.mesh, PartitionSpec())
                self._jit_gather_pages = jax.jit(
                    lambda buf, idx: buf[idx], out_shardings=rep
                )
            fetch = lambda buf: np.asarray(self._jit_gather_pages(buf, g))
        else:
            fetch = lambda buf: np.asarray(buf[g])
        kv = fetch(self.kv_cache.kv)
        kv = kv.reshape((L, n) + kv.shape[1:]).swapaxes(0, 1)
        scale = None
        if self.kv_cache.scale is not None:
            scale = fetch(self.kv_cache.scale)
            scale = scale.reshape((L, n) + scale.shape[1:]).swapaxes(0, 1)
        return kv, scale

    def scatter_pages(self, page_ids: np.ndarray, kv: np.ndarray, scale) -> None:
        """Write host-tier pages back into the device cache at new page ids."""
        n = len(page_ids)
        L = self.kv_config.num_layers
        P = self.kv_config.num_pages
        g = (
            np.arange(L, dtype=np.int64)[:, None] * P
            + np.asarray(page_ids, np.int64)[None, :]
        ).reshape(-1)
        kvv = np.ascontiguousarray(kv.swapaxes(0, 1)).reshape(
            (L * n,) + kv.shape[2:]
        )
        if not hasattr(self, "_jit_scatter_pages"):
            self._jit_scatter_pages = jax.jit(
                lambda buf, idx, vals: buf.at[idx].set(vals),
                donate_argnums=(0,),
            )
        new_kv = self._jit_scatter_pages(self.kv_cache.kv, g, kvv)
        new_scale = self.kv_cache.scale
        if scale is not None:
            sv = np.ascontiguousarray(scale.swapaxes(0, 1)).reshape(
                (L * n,) + scale.shape[2:]
            )
            new_scale = self._jit_scatter_pages(self.kv_cache.scale, g, sv)
        self.kv_cache = dataclasses.replace(
            self.kv_cache, kv=new_kv, scale=new_scale
        )

    def resize_kv_pool(self, new_num_tokens: int) -> int:
        """Reallocate the paged KV cache for ``new_num_tokens`` tokens.

        TPU-native equivalent of the reference's runtime pool control
        (reference: managers/structs.py:251 MemoryPoolControlReqInput,
        memory/het_pool.py:13-120 expand/shrink): the combined cache array is
        rebuilt at the new page count. The layer->page fold renumbers with
        the page count, so callers must have flushed all cached KV first.
        Steps touching the new shape recompile (cached thereafter)."""
        ps = self.page_size
        new_pages = new_num_tokens // ps + 1
        if new_pages < 2:
            raise ValueError("KV pool must hold at least one page")
        from scratchpad_tpu.memory.kv_cache import create_kv_cache
        from scratchpad_tpu.memory.page_allocator import PageAllocator

        self.kv_cache = None  # release before allocating the replacement
        self.kv_config = dataclasses.replace(
            self.kv_config, num_pages=new_pages
        )
        self.kv_cache = create_kv_cache(
            self.kv_config,
            self.mesh,
            tp_axis=None if self.dp_attention else "tp",
        )
        self.page_allocator = PageAllocator(new_pages, ps)
        dump = self.page_allocator.alloc(1)
        assert dump is not None and dump[0] == 0
        self.max_running_requests = min(
            self.args.max_running_requests, new_pages - 1
        )
        self.max_total_num_tokens = (new_pages - 1) * ps
        logger.info(
            "KV pool resized: %d pages x %d tokens (%.2f GiB)",
            new_pages - 1,
            ps,
            new_pages * ps * self.kv_config.bytes_per_token() / 2**30,
        )
        return self.max_total_num_tokens

    def run_kv_only(self, wb: WorkerBatch) -> None:
        self._no_offload("draft KV mirroring")
        """Forward an extend batch purely to populate the KV cache (used to
        keep a speculative DRAFT model's cache in sync with accepted tokens;
        the reference never implemented its draft worker —
        model_executor/speculative/spec_info.py:4-24)."""
        if not hasattr(self, "_jit_kv_only"):

            def _impl(params, kv, meta):
                meta = dataclasses.replace(meta, capture_hidden=True)
                kv, _ = self.model(params, kv, meta)
                return kv

            self._jit_kv_only = jax.jit(_impl, donate_argnums=(1,))
        meta, _ = self._pad_to_buckets(wb)
        self.kv_cache = self._jit_kv_only(self.params, self.kv_cache, meta)

    def run_score(self, wb: WorkerBatch) -> np.ndarray:
        self._no_offload("sequence scoring")
        """Teacher-forcing logprobs for one extend batch; returns [T_real]."""
        T_real = len(wb.tokens)
        meta, _ = self._pad_to_buckets(wb)
        meta = dataclasses.replace(meta, capture_all_hidden=True)
        if not hasattr(self, "_jit_score"):
            self._jit_score = jax.jit(self._score_impl, donate_argnames=("kv",))
        self.kv_cache, lps = self._jit_score(self.params, self.kv_cache, meta)
        return np.asarray(lps)[:T_real]

    # ---------------------------------------------------------- weight update

    def _maybe_transpose_stacks(self, params: dict) -> dict:
        """EXPERIMENT (SPTPU_WT=1, off by default): store decoder matmul
        stacks [L, out, in] — the layout XLA's TPU dot prefers
        (models/llama.py lin). The r3 A/B measured noise-level tok/s
        change (the "transposed slice" fusions were VMEM prefetches, not
        waste), and flag-conditional layouts are a foot-gun for params
        handed between runners, so it stays opt-in for layout studies."""
        import os as _os

        twn = getattr(type(self.model), "TRANSPOSED_STACK_WEIGHTS", None)
        if (
            _os.environ.get("SPTPU_WT", "0") != "1"
            or self.mesh is not None
            or not twn
            or "layers" not in params
        ):
            return params
        lay = dict(params["layers"])
        for n in twn:
            if n in lay and lay[n].ndim == 3:
                lay[n] = jnp.swapaxes(lay[n], 1, 2)
        params = dict(params)
        params["layers"] = lay
        self.model.weights_transposed = True
        return params

    def update_weights(self, state: dict) -> tuple[bool, str]:
        self._no_offload("in-place weight update")
        """In-place weight swap with rollback on failure
        (reference: model_runner.py:236-323 update_weights). The caller must
        flush the radix cache afterwards — cached KV belongs to old weights."""
        old = self.params
        try:
            host = self.model.convert_hf_state(state, self._dtype())
            if self.args.quantization in ("w4a16", "w4", "w4a8"):
                from scratchpad_tpu.ops.quant import quantize_model_params

                host = quantize_model_params(host)
            if "toppings" in old:
                host["toppings"] = old["toppings"]
            host = self._maybe_transpose_stacks(host)
            if self.mesh is not None:
                specs = self.model.param_specs()
                if "layers_q" in host:
                    from scratchpad_tpu.ops.quant.w4a16 import quant_param_specs

                    specs = quant_param_specs(specs, host)
                self.params = place_params(host, specs, self.mesh)
            else:
                self.params = jax.tree.map(jnp.asarray, host)
            return True, "ok"
        except Exception as e:  # noqa: BLE001
            self.params = old
            return False, f"update failed, rolled back: {e}"

    # ------------------------------------------------------------- precompile

    def capture(self, decode_only: bool = True) -> None:
        """Pre-compile the decode bucket ladder on the hot (packed window)
        path (CUDA-graph capture analogue).

        Covers the window sizes serving actually picks (1 = grammar/
        top-logprobs, 4 = prefill-waiting cap, 8 = streaming cap, the
        configured window) and two PAGE buckets (the smallest + the one
        covering the context limit) — the r4 serving bench showed every
        uncovered (bs, window, P) combination stalling a live request on
        an inline compile."""
        t0 = time.monotonic()
        windows = sorted(
            {
                1,
                4,
                max(min(self.args.stream_interval, 64), 8),
                self.args.decode_window_size,
            }
        )
        if self.param_offload:
            windows = [1]  # offload streams layers once per single-step dispatch
        # cover the serving-typical page buckets (4..64 spans ~1k-token
        # contexts at ps=16) plus the context-limit bucket — {4, max}
        # alone left every mid-size context compiling inline on its first
        # live request (r4/r5 serving TTFT tails). SPTPU_CAPTURE_PMAX caps
        # the ladder when boot time is precious (e.g. the relay): shapes
        # above the cap compile inline if a request ever reaches them.
        pmax = _pow2_bucket(self.max_pages_per_req, 4, self.max_pages_per_req)
        cap_env = os.environ.get("SPTPU_CAPTURE_PMAX")
        if cap_env:
            pmax = min(pmax, max(4, int(cap_env)))
        p_buckets = sorted(
            {p for p in (4, 8, 16, 32, 64) if p <= pmax} | {pmax}
        )
        n = 0
        for bs in self.args.decode_bs_buckets:
            if bs > self.max_running_requests:
                break
            for k in windows:
                for p in p_buckets:
                    wb = self._dummy_decode_batch(bs, pages=p)
                    ids, _, _ = self.run_decode_window(wb, k)
                    n += 1
        if not decode_only:
            # EXTEND (T, B, P) ladder (VERDICT r4 item 3): the r4 serving
            # bench recorded TTFT ~10 s / goodput 0 because every fresh
            # extend shape compiled (or deserialized, through the relay)
            # INLINE on the first live request that hit it. Pre-run the
            # grid the scheduler can emit — prefill token buckets x the
            # pow2 request-count buckets x the two page buckets — so boot
            # pays the whole ladder before traffic (the reference captures
            # all graphs at init, model_executor/cuda_graph_runner.py:92).
            cap = max(self.args.max_prefill_tokens,
                      self.args.chunked_prefill_size)
            for t in self.args.prefill_token_buckets:
                if t > cap:
                    break
                for bs in (1, 2, 4, 8):
                    if bs > min(t, self.max_running_requests):
                        break
                    for p in p_buckets:
                        wb = self._dummy_extend_batch(t, bs, pages=p)
                        self.run_extend(wb)
                        n += 1
        logger.info(
            "captured %d step variants in %.1fs", n, time.monotonic() - t0
        )

    def _dummy_extend_batch(
        self, tokens: int, bs: int, pages: int = 4
    ) -> WorkerBatch:
        """A synthetic extend batch landing EXACTLY on the (T, B, P)
        buckets: bs requests, `tokens` total new tokens, everything writing
        into the dump page (page 0) — compile-only, no live state."""
        per = tokens // bs
        lens = np.full(bs, per, np.int32)
        lens[-1] = tokens - per * (bs - 1)
        sinfo = SamplingBatchInfo(
            temperature=np.zeros(bs, np.float32),
            top_p=np.ones(bs, np.float32),
            top_k=np.full(bs, self.model_config.vocab_size, np.int32),
            min_p=np.zeros(bs, np.float32),
        )
        return WorkerBatch(
            mode=ForwardMode.EXTEND,
            tokens=np.zeros(tokens, np.int32),
            positions=np.concatenate(
                [np.arange(n, dtype=np.int32) for n in lens]
            ),
            out_cache_loc=np.zeros(tokens, np.int32),
            req_indices=np.repeat(
                np.arange(bs, dtype=np.int32), lens
            ),
            page_table=np.zeros((bs, pages), np.int32),
            seq_lens=lens,
            extend_lens=lens,
            sampling_info=sinfo,
        )

    def _dummy_decode_batch(self, bs: int, pages: int = 4) -> WorkerBatch:
        sinfo = SamplingBatchInfo(
            temperature=np.zeros(bs, np.float32),
            top_p=np.ones(bs, np.float32),
            top_k=np.full(bs, self.model_config.vocab_size, np.int32),
            min_p=np.zeros(bs, np.float32),
        )
        return WorkerBatch(
            mode=ForwardMode.DECODE,
            tokens=np.zeros(bs, np.int32),
            positions=np.zeros(bs, np.int32),
            out_cache_loc=np.zeros(bs, np.int32),
            req_indices=np.arange(bs, dtype=np.int32),
            page_table=np.zeros((bs, pages), np.int32),
            seq_lens=np.ones(bs, np.int32),
            extend_lens=np.ones(bs, np.int32),
            sampling_info=sinfo,
        )
