"""Engine/server flags.

TPU-native analogue of the reference's flat ServerArgs dataclass
(reference: scratchpad/server/args.py:9-218). One dataclass drives the engine,
the scheduler and the HTTP server; ``resolve()`` materialises derived defaults
(the reference calls this ``translate_auto``).
"""

from __future__ import annotations

import argparse
import dataclasses
from typing import Optional


@dataclasses.dataclass
class ServerArgs:
    # model / weights
    model_path: str = ""
    preset: Optional[str] = None  # built-in architecture preset (offline runs)
    tokenizer_path: Optional[str] = None
    dtype: str = "bfloat16"
    # None | w4a16 | w4a8 (4-bit weights + per-token int8 activations on
    # the s8 MXU path; same storage as w4a16) | fp8 (quantize at load) |
    # awq | gptq | gptq_v2 (import a pre-quantized AutoAWQ/AutoGPTQ int4
    # checkpoint, bit-exact)
    quantization: Optional[str] = None
    kv_cache_dtype: str = "auto"  # auto | bfloat16 | int8 | fp8
    # 4-bit (group-128) LM head: the output projection reads its full
    # [V, H] matrix every decode step (1.05 GiB bf16 at 8B); tied models
    # keep the bf16 embedding for lookups and quantize a head copy
    # 4-bit LM head. None = auto: ON for W4-quantized single-device
    # engines — the head reads its FULL [V, H] bf16 matrix every decode
    # step (0.79 GiB at 3B tied-embedding models = ~1/3 of the quantized
    # config's per-step reads; 1.05 GiB at 8B), so leaving it bf16 caps
    # the W4 speedup. Off for bf16 engines and meshes.
    quantize_lm_head: Optional[bool] = None
    random_weights: bool = False  # initialise random weights (benchmarks)
    context_length: Optional[int] = None

    # scheduling (reference: server/args.py:23-45)
    schedule_policy: str = "lpm"  # lpm | fcfs | lof | random | dfs-weight
    chunked_prefill_size: int = 2048
    max_running_requests: int = 256
    max_prefill_tokens: int = 8192
    max_total_tokens: Optional[int] = None  # KV pool size in tokens
    schedule_conservativeness: float = 1.0
    enable_mixed_chunk: bool = False
    stream_interval: int = 1
    watchdog_timeout: float = 120.0
    # multi-turn session store bounds (Engine.open_session): LRU capacity
    # + idle TTL so long-lived serving can't accumulate history unbounded
    max_sessions: int = 1024
    session_ttl: float = 3600.0  # seconds idle before expiry; <= 0 = never

    # memory
    page_size: int = 16  # tokens per KV page (TPU DMA granularity)
    # KV pool lane layout: "auto" packs K|V of one head into a single
    # 128-lane row for head_dim <= 64 bf16 GQA models on the single-device
    # gqa backend (halves KV HBM + decode read; memory/kv_cache.py);
    # "padded" keeps the lane-padded [2Hkv, 128] layout; "packed" forces
    # packing (errors if unsupported)
    # auto | padded | packed | lanes (lane-folded heads: quantized TP pools
    # at any tp | 2*Hkv — auto-selected when the sublane layout can't slice)
    kv_layout: str = "auto"
    mem_fraction_static: float = 0.85
    disable_radix_cache: bool = False
    # CPU parameter offload: decoder layer groups live in host memory and
    # stream through the device double-buffered (capacity over throughput;
    # reference: memory/param_offload.py ParameterOffloadManager)
    enable_param_offload: bool = False
    param_offload_groups: int = 4
    # host KV tier: radix-evicted pages offload to a CPU arena of this many
    # tokens and promote back on prefix hits (0 = off; reference:
    # memory/het_pool.py heterogeneous pool)
    host_kv_cache_tokens: int = 0
    # cross-attention (Mllama): concurrent requests with an image (each
    # holds one cross-KV slot)
    cross_kv_slots: int = 16

    # parallelism: when no explicit mesh is handed to Engine, a mesh with
    # axes ("dp","pp","sp","tp") is built over the first
    # dp*pp*sp*tp local devices (reference: server/args.py:46 tp_size/
    # dp_size spawn per-rank processes; here one controller + one mesh)
    tp_size: int = 1
    dp_size: int = 1
    pp_size: int = 1
    sp_size: int = 1
    # cross-host serving (parallel/multihost.py): every node runs this same
    # program over ONE global mesh; node 0 is the leader (scheduler + HTTP)
    # and broadcasts the runner command stream over a TCP control plane;
    # nodes >= 1 run follower_loop (reference analogue: per-rank scheduler
    # processes fed by broadcast_pyobj, scratchpad/utils/utils.py:353-384)
    num_nodes: int = 1
    node_rank: int = 0
    dist_init_addr: Optional[str] = None  # host:port of jax.distributed coord
    control_plane_addr: Optional[str] = None  # host:port; default coord port+1
    # decode/prefill compile buckets (CUDA-graph-ladder analogue,
    # reference: model_executor/cuda_graph_runner.py:92-128)
    decode_bs_buckets: Optional[list[int]] = None
    prefill_token_buckets: Optional[list[int]] = None

    # decode windowing: K decode steps fused into one device dispatch with
    # on-device sampling feeding forward (amortises host round trips)
    decode_window_size: int = 16

    # attention / kernels
    attention_backend: str = "auto"  # auto | pallas | xla
    disable_jit: bool = False

    # sampling / constrained decoding
    grammar_backend: str = "native"  # native regex/json FSM engine
    disable_penalizer: bool = False
    # decode-window pipelining (device-chained token carry).
    # None = auto: ON for single-chip TPU decode (r3 on-chip A/B: 9,510
    # vs 9,398 tok/s; it also hides host detokenize/stream work on local
    # hosts), off on CPU/meshes. Set explicitly to force either way.
    enable_overlap: Optional[bool] = None
    # max in-flight decode windows when overlapping. None = auto (2): one
    # window executes while another stays queued, hiding the host's
    # dispatch + fetch relay round trips between windows.
    decode_pipeline_depth: Optional[int] = None
    # speculative decoding: None | "ngram" (prompt-lookup drafts) | "draft"
    # (a small draft model proposes, fused k-step window; its KV pool shares
    # the target's page geometry so the radix cache covers both). Drafts are
    # verified in one target extend pass; greedy requests only — sampled
    # ones use plain decode.
    speculative_algorithm: Optional[str] = None
    speculative_num_draft_tokens: int = 4
    speculative_ngram_max: int = 3  # longest suffix n-gram to match
    speculative_draft_preset: Optional[str] = None
    speculative_draft_model_path: Optional[str] = None
    # sequence-parallel prefill: fresh long prompts (no cached prefix) run
    # one unchunked ring-attention extend with the token axis sharded over
    # the mesh's "sp" axis (beyond reference — SURVEY.md §2.7: the reference
    # has no SP; long prompts are only chunked). Budget defaults to
    # chunked_prefill_size * sp_size.
    enable_sp_prefill: bool = False
    sp_prefill_tokens: Optional[int] = None
    # pipeline parallelism: partition the stacked decoder layers over the
    # mesh's "pp" axis and run GPipe-style pipelined forwards (beyond
    # reference — it builds PP groups but has no execution path,
    # reference: distributed/parallel_state.py:984-999). Microbatches > 1
    # split decode batches by rows to overlap the stages.
    enable_pp: bool = False
    pp_microbatches: int = 1
    # MoE expert parallelism: shard the expert axis over the mesh's tp axis
    # (each device owns whole experts; one psum combines) instead of
    # sharding every expert's ffw dim
    enable_ep: bool = False
    # DP attention: on dp x tp meshes, attention weights and the KV pool
    # stay UNSHARDED (full kv heads on every device) and attention token
    # rows shard over BOTH axes (dp, tp), while the MLP stays
    # tensor-parallel over tp — XLA inserts the row gather at the
    # attention/MLP boundary. Wins when num_kv_heads < tp_size (wide-TP GQA,
    # MLA where the single latent head cannot shard at all). The reference
    # has the flag + batch plumbing but no execution path
    # (reference: server/args.py:68 enable_dp_attention,
    # model_executor/forward_info.py:221-237 gathered_buffer).
    enable_dp_attention: bool = False

    # pre-compile the decode bucket ladder at server startup (reference:
    # init_cuda_graphs captures CUDA graphs before serving); disable for
    # fast dev restarts
    warmup_capture: bool = True

    # server
    host: str = "127.0.0.1"
    port: int = 3000
    served_model_name: Optional[str] = None
    chat_template: Optional[str] = None
    # text form of the VLM image placeholder in chat prompts
    mm_image_token: str = "<image>"
    # threads decoding/resizing images+video off the HTTP event loop
    # (reference: managers/image_processor.py:599 async executor pool)
    mm_preprocess_workers: int = 4
    # text form of the video placeholder + frames sampled per video
    # (reference: managers/image_processor.py encode_video)
    mm_video_token: str = "<video>"
    video_frames: int = 8
    api_key: Optional[str] = None

    # split <think> spans into `reasoning_content` (reference:
    # server/openai_api/reasoning_parser.py). None = off; "deepseek-r1"
    # starts requests inside a think block (the template opens the tag);
    # any other value ("qwen3", "default") splits on explicit tags only.
    reasoning_parser: Optional[str] = None
    # emit reasoning_content deltas incrementally while streaming
    # (reference: reasoning_parser.py stream_reasoning); False holds each
    # think block and emits it whole when it closes
    stream_reasoning: bool = True

    # accept base64-pickled per-request logit processors over HTTP
    # (arbitrary code execution by design — off unless opted in;
    # reference: server/args.py enable_custom_logit_processor)
    enable_custom_logit_processor: bool = False
    # abort requests whose logits go non-finite instead of streaming
    # garbage (reference: nn/layers/sampler.py:54-61 NaN detection)
    enable_nan_detection: bool = True

    # observability
    log_level: str = "info"
    enable_metrics: bool = True
    decode_log_interval: int = 40
    show_time_cost: bool = False

    # misc
    random_seed: int = 0
    # jax platform: auto (let jax pick) | cpu | tpu. "cpu" is the local
    # debug/verification path (the JAX_PLATFORMS env var can be overridden
    # by site customisations, so this goes through jax.config directly)
    device: str = "auto"

    def resolve(self) -> "ServerArgs":
        """Materialise derived defaults; idempotent."""
        if self.speculative_algorithm not in (None, "none", "ngram", "draft", "eagle"):
            raise ValueError(
                f"unknown speculative_algorithm {self.speculative_algorithm!r}"
                " (expected ngram | draft | eagle)"
            )
        if self.speculative_algorithm == "none":
            self.speculative_algorithm = None
        if self.speculative_algorithm == "draft" and not (
            self.speculative_draft_preset or self.speculative_draft_model_path
        ):
            raise ValueError(
                "speculative_algorithm='draft' needs speculative_draft_preset"
                " or speculative_draft_model_path"
            )
        if self.enable_param_offload and self.speculative_algorithm:
            raise ValueError(
                "enable_param_offload is incompatible with speculative decoding"
            )
        if self.host_kv_cache_tokens and self.speculative_algorithm == "draft":
            raise ValueError(
                "host_kv_cache_tokens is incompatible with draft-model "
                "speculation (promoted pages have no draft-model KV)"
            )
        if self.device != "auto":
            import jax

            jax.config.update("jax_platforms", self.device)
        if self.num_nodes > 1:
            if not self.dist_init_addr:
                raise ValueError("num_nodes > 1 needs dist_init_addr host:port")
            if self.control_plane_addr is None:
                host, port = self.dist_init_addr.rsplit(":", 1)
                self.control_plane_addr = f"{host}:{int(port) + 1}"
            # speculative decoding works on multi-host engines: ngram drafts
            # are host-computed, the draft model / EAGLE head relay their
            # command streams to followers; the host KV tier relays too
            # (gather/scatter_pages are replicated calls, parallel/multihost.py)
            if self.enable_param_offload:
                raise ValueError(
                    "multi-host serving: param offload unsupported yet"
                )
        if self.pp_size > 1:
            self.enable_pp = True
        if self.sp_size > 1:
            self.enable_sp_prefill = True
        if self.served_model_name is None:
            self.served_model_name = self.preset or self.model_path or "model"
        if self.tokenizer_path is None:
            self.tokenizer_path = self.model_path or None
        if self.decode_bs_buckets is None:
            ladder = [1, 2, 4, 8, 16, 32, 64, 128, 256]
            self.decode_bs_buckets = [
                b for b in ladder if b <= max(self.max_running_requests, 1)
            ] or [1]
        if self.prefill_token_buckets is None:
            # ladder must cover a whole prefill *batch* (sum over requests),
            # bounded by max_prefill_tokens; chunked_prefill_size only caps
            # one request's chunk
            cap = max(self.max_prefill_tokens, self.chunked_prefill_size)
            buckets, b = [], 128
            while b < cap:
                buckets.append(b)
                b *= 2
            buckets.append(cap)
            self.prefill_token_buckets = buckets
        return self

    @classmethod
    def add_cli_args(cls, parser: argparse.ArgumentParser) -> None:
        for f in dataclasses.fields(cls):
            name = "--" + f.name.replace("_", "-")
            if f.type == "bool" or isinstance(f.default, bool):
                parser.add_argument(
                    name,
                    action=argparse.BooleanOptionalAction,
                    default=f.default,
                )
            else:
                # annotations are strings (PEP 563); Optional[int] fields
                # default to None, so inspect the annotation text
                ann = str(f.type)
                typ = str
                if "list" in ann:
                    typ = str
                elif "int" in ann or isinstance(f.default, int):
                    typ = int
                elif "float" in ann or isinstance(f.default, float):
                    typ = float
                parser.add_argument(name, type=typ, default=f.default)

    @classmethod
    def from_cli_args(cls, args: argparse.Namespace) -> "ServerArgs":
        field_names = {f.name for f in dataclasses.fields(cls)}
        kwargs = {k: v for k, v in vars(args).items() if k in field_names}
        return cls(**kwargs).resolve()
