"""Synchronous/offline engine facade.

Single-controller analogue of AsyncLLMEngine
(reference: scratchpad/server/engine.py:10-152): instead of spawning
scheduler + detokenizer processes over ZMQ, the engine owns the Scheduler
in-process and pumps its step loop. The HTTP server wraps this engine with an
asyncio pump (scratchpad_tpu/server/http_server.py).
"""

from __future__ import annotations

import dataclasses
import time
import uuid
from typing import Any, Iterator, Optional, Union

import numpy as np

from scratchpad_tpu.config import ModelConfig, ServerArgs
from scratchpad_tpu.config.model_config import get_preset
from scratchpad_tpu.core.req import FinishReason, Req
from scratchpad_tpu.core.scheduler import Scheduler, StepEvent
from scratchpad_tpu.sampling.sampling_params import SamplingParams
from scratchpad_tpu.tokenizer.detokenizer import IncrementalDetokenizer
from scratchpad_tpu.utils import get_logger

logger = get_logger("engine")


@dataclasses.dataclass
class GenerationOutput:
    rid: str
    text: str
    output_ids: list[int]
    finish_reason: str
    prompt_tokens: int
    completion_tokens: int
    cached_tokens: int
    output_token_logprobs: Optional[list[float]] = None
    output_top_logprobs: Optional[list] = None  # [(values, token_ids), ...]
    ttft: Optional[float] = None
    e2e_latency: Optional[float] = None


def _resolve_model_config(args: ServerArgs) -> ModelConfig:
    if args.preset:
        # preset = architecture shortcut; an explicit model_path still
        # supplies the weights (e.g. a quantized checkpoint on disk)
        ov = dict(dtype=args.dtype, quantization=args.quantization)
        if args.model_path:
            ov["model_path"] = args.model_path
        model_config = get_preset(args.preset, **ov)
    else:
        model_config = ModelConfig.from_pretrained(
            args.model_path, dtype=args.dtype, quantization=args.quantization
        )
    if args.context_length:
        model_config.max_position_embeddings = args.context_length
    return model_config


def run_follower(server_args: ServerArgs) -> None:
    """Follower-node entry for cross-host serving: build the local shard of
    the SPMD engine (ModelRunner over the global mesh) and replay the
    leader's command stream until it stops (parallel/multihost.py)."""
    args = server_args.resolve()
    assert args.num_nodes > 1 and args.node_rank > 0
    from scratchpad_tpu.executor.model_runner import ModelRunner
    from scratchpad_tpu.parallel import mesh_from_args
    from scratchpad_tpu.parallel.multihost import (
        ControlPlane,
        follower_loop,
        init_multihost,
    )

    init_multihost(args)
    ctrl = ControlPlane(args.control_plane_addr, 0, is_leader=False)
    mesh = mesh_from_args(args)
    runner = ModelRunner(_resolve_model_config(args), args, mesh)
    # mirror the leader's speculative machinery so its "draft:"/"eagle:"
    # command streams replay on identical local state
    draft_runner = eagle = None
    if args.speculative_algorithm == "draft":
        from scratchpad_tpu.core.scheduler import build_draft_runner

        draft_runner = build_draft_runner(runner, args, mesh)
    elif args.speculative_algorithm == "eagle":
        from scratchpad_tpu.executor.eagle import EagleRunner

        eagle = EagleRunner(runner, args)
    logger.info("follower %d ready", args.node_rank)
    follower_loop(runner, ctrl, draft_runner=draft_runner, eagle=eagle)


class Engine:
    def __init__(
        self,
        server_args: ServerArgs,
        mesh=None,
        model_config: Optional[ModelConfig] = None,
        tokenizer: Any = None,
    ):
        self.args = server_args.resolve()
        if model_config is None:
            model_config = _resolve_model_config(self.args)
        elif self.args.context_length:
            model_config.max_position_embeddings = self.args.context_length
        self.model_config = model_config

        self.tokenizer = tokenizer
        if self.tokenizer is None and self.args.tokenizer_path:
            from transformers import AutoTokenizer

            self.tokenizer = AutoTokenizer.from_pretrained(self.args.tokenizer_path)
        self.detokenizer = IncrementalDetokenizer(self.tokenizer)

        self.eos_token_ids: frozenset[int] = frozenset(self._find_eos_ids())
        ctrl = None
        if self.args.num_nodes > 1:
            # leader side of cross-host serving (parallel/multihost.py);
            # followers never construct an Engine — they run run_follower()
            assert self.args.node_rank == 0, "only node 0 constructs Engine"
            from scratchpad_tpu.parallel.multihost import (
                ControlPlane,
                init_multihost,
            )

            init_multihost(self.args)
            ctrl = ControlPlane(
                self.args.control_plane_addr,
                self.args.num_nodes - 1,
                is_leader=True,
            )
        if mesh is None:
            from scratchpad_tpu.parallel import mesh_from_args

            mesh = mesh_from_args(self.args)
        self.scheduler = Scheduler(model_config, self.args, mesh=mesh)
        from scratchpad_tpu.server.metrics import LatencyStats

        # TTFT/ITL/TPOT/E2E sample sink; drained by /metrics histograms
        self.latency = LatencyStats()
        if ctrl is not None:
            from scratchpad_tpu.parallel.multihost import (
                LeaderEagle,
                LeaderRunner,
            )

            self.scheduler.runner = LeaderRunner(self.scheduler.runner, ctrl)
            if self.scheduler.host_tier is not None:
                # the tier captured the raw runner at Scheduler init; its
                # gather_pages calls must broadcast like everything else
                self.scheduler.host_tier.runner = self.scheduler.runner
            if self.scheduler.draft_runner is not None:
                self.scheduler.draft_runner = LeaderRunner(
                    self.scheduler.draft_runner, ctrl, prefix="draft:"
                )
            if self.scheduler.eagle is not None:
                self.scheduler.eagle = LeaderEagle(self.scheduler.eagle, ctrl)
            self._ctrl = ctrl
        self.grammar_backend = None
        if self.tokenizer is not None and self.args.grammar_backend == "native":
            try:
                from scratchpad_tpu.constrained import GrammarBackend

                self.grammar_backend = GrammarBackend(
                    self.tokenizer, model_config.vocab_size
                )
            except ImportError:
                pass

    def _find_eos_ids(self) -> set[int]:
        ids: set[int] = set()
        tok = self.tokenizer
        if tok is not None:
            if getattr(tok, "eos_token_id", None) is not None:
                ids.add(tok.eos_token_id)
        cfg_path = self.args.model_path
        if cfg_path:
            import json, os

            gc = os.path.join(cfg_path, "generation_config.json")
            if os.path.exists(gc):
                with open(gc) as f:
                    eos = json.load(f).get("eos_token_id")
                if isinstance(eos, int):
                    ids.add(eos)
                elif isinstance(eos, list):
                    ids.update(eos)
        return ids

    # -------------------------------------------------------------- requests

    def register_topping(self, name: str, adapter_path: str = None, state=None,
                         scaling: float = 1.0, delta_state=None) -> int:
        """Register a LoRA adapter — or, via ``delta_state``, a full-rank
        quantized weight-delta adapter — for per-request serving
        (reference: RegisterToppingsReqInput, managers/structs.py:611;
        delta kind: toppings_manager.py:462 _load_delta)."""
        if getattr(self, "toppings_manager", None) is None:
            from scratchpad_tpu.toppings import ToppingsManager

            import jax.numpy as jnp

            dt = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[self.args.dtype]
            self.toppings_manager = ToppingsManager(self.model_config, dtype=dt)
        if state is None and delta_state is None:
            # resolve path -> numpy state on the leader so the relayed
            # payload never depends on follower-side filesystem contents
            state, scaling = self.toppings_manager.load_path(adapter_path)
        if getattr(self, "_ctrl", None) is not None:
            # followers must register the SAME adapter before any batch
            # references it, else their jits keep the un-adapted branch and
            # the divergent SPMD programs deadlock the collectives; the
            # command stream is ordered, so broadcasting here suffices
            self._ctrl.broadcast(
                (
                    "register_topping",
                    dict(
                        name=name,
                        state=state,
                        delta_state=delta_state,
                        scaling=scaling,
                    ),
                )
            )
        if delta_state is not None:
            idx = self.toppings_manager.register_delta(name, delta_state, scaling)
        else:
            idx = self.toppings_manager.register_state(name, state, scaling)
        self.scheduler.runner.attach_toppings(self.toppings_manager)
        return idx

    def _make_req(
        self,
        prompt: Optional[str],
        input_ids: Optional[list[int]],
        sampling_params: Optional[SamplingParams],
        return_logprob: bool = False,
        rid: Optional[str] = None,
        topping: Optional[str] = None,
        image_data=None,
        video_data=None,
    ) -> Req:
        sp = sampling_params or SamplingParams()
        if input_ids is None:
            assert prompt is not None and self.tokenizer is not None
            input_ids = self.tokenizer.encode(prompt)
        mm_positions = mm_features = mm_spans = None
        mrope_table, mrope_delta = None, 0
        cross_states = cross_len = None
        if video_data is not None:
            assert image_data is None, (
                "one request carries images OR one video (v1)"
            )
            (
                input_ids,
                mm_positions,
                mm_features,
                mrope_table,
                mrope_delta,
                cross_states,
                mm_spans,
                cross_len,
            ) = self._prepare_video(list(input_ids), video_data)
        elif image_data is not None:
            (
                input_ids,
                mm_positions,
                mm_features,
                mrope_table,
                mrope_delta,
                cross_states,
                mm_spans,
                cross_len,
            ) = self._prepare_multimodal(list(input_ids), image_data)
        topping_idx = 0
        if topping:
            topping_idx = self.toppings_manager.lookup(topping)
        req = Req(
            rid=rid or uuid.uuid4().hex,
            origin_input_ids=list(input_ids),
            sampling_params=sp,
            eos_token_ids=self.eos_token_ids,
            return_logprob=return_logprob,
            topping_idx=topping_idx,
            mm_positions=mm_positions,
            mm_features=mm_features,
            mm_spans=mm_spans,
            mrope_table=mrope_table,
            mrope_delta=mrope_delta,
            cross_states=cross_states,
            cross_len=cross_len,
        )
        gk = sp.grammar_key()
        if gk is not None and self.grammar_backend is not None:
            req.grammar = self.grammar_backend.get_grammar(*gk)
        return req

    def preprocess_image(self, img):
        """PIL image -> normalized [3, S, S] pixels at the model's expected
        resolution — or, for tiled cross-attention models (Mllama with
        max_num_tiles > 1), the HF-equivalent (tiles, aspect_ratio_id,
        n_tiles) tuple (multimodal/image.py preprocess_tiled). Static
        shapes either way: tiles are zero-padded to max_num_tiles."""
        from scratchpad_tpu.multimodal import preprocess_clip

        model = self.scheduler.runner.model
        if (
            getattr(model, "has_cross_attention", False)
            and getattr(model, "vision", None) is not None
            and model.vision.max_tiles > 1
        ):
            from scratchpad_tpu.multimodal.image import preprocess_tiled

            return preprocess_tiled(
                img,
                model.vision.image_size,
                model.vision.supported_aspect_ratios,
                model.vision.max_tiles,
            )
        mm = getattr(self.model_config, "multimodal", None) or {}
        if getattr(model, "uses_mrope", False):  # Qwen2-VL fixed square
            return preprocess_clip(img, model.vision.image_size)
        size = (mm.get("vision_config") or {}).get("image_size", 336)
        if hasattr(model, "image_mean"):  # SigLIP-style normalization
            import numpy as _np

            return preprocess_clip(
                img, size,
                mean=_np.asarray(model.image_mean, _np.float32),
                std=_np.asarray(model.image_std, _np.float32),
            )
        return preprocess_clip(img, size)

    def _prepare_video(self, input_ids: list[int], video_data):
        """Encode sampled video frames and splice them into the prompt
        (VERDICT r2 item 9; reference: managers/image_processor.py:20
        encode_video + HF video_grid_thw). Frames ride the same ViT as
        images; the single video placeholder expands to frames x patches
        content-hashed pseudo ids and the mrope TIME component advances
        per frame (models/qwen2_vl.py compute_mrope video spans)."""
        import hashlib

        model = self.scheduler.runner.model
        if not getattr(model, "supports_video", False):
            raise ValueError(
                f"{self.model_config.architecture} does not accept video_data"
            )
        px = np.asarray(video_data, np.float32)
        assert px.ndim == 4, "video_data must be [T, C, H, W] frame pixels"
        expected = getattr(getattr(model, "vision", None), "image_size", None)
        if expected is not None and px.shape[2:] != (expected, expected):
            raise ValueError(
                f"video frames are {px.shape[2]}x{px.shape[3]} but the model "
                f"expects {expected}x{expected} (use Engine.preprocess_image "
                "per frame)"
            )
        # real temporal patches (HF video_grid_thw: t = T/temporal_patch);
        # features come back per temporal patch, not per raw frame
        feats = self.scheduler.runner.encode_videos(px)  # [grid_t, Pn, H]
        T, Pn, H = feats.shape
        vid_tok = model.video_token_index
        n_ph = sum(1 for t in input_ids if t == vid_tok)
        if n_ph == 1:
            expand = T * Pn  # one placeholder = the whole video
        elif n_ph == T * Pn:
            expand = 1  # pre-expanded (HF-processor style); must be one run
            first = next(
                i for i, t in enumerate(input_ids) if t == vid_tok
            )
            run = input_ids[first : first + T * Pn]
            if any(t != vid_tok for t in run):
                raise ValueError(
                    "pre-expanded video tokens must form one contiguous run"
                )
        else:
            raise ValueError(
                f"prompt has {n_ph} video tokens for a {T}-frame video "
                f"({Pn} patches/frame); send 1 or {T * Pn}"
            )
        vhash = int.from_bytes(
            hashlib.blake2b(px.tobytes(), digest_size=8).digest(), "little"
        )
        out_ids: list[int] = []
        positions: list[int] = []
        spans: list[tuple] = []
        consumed = 0
        for t in input_ids:
            if t == vid_tok:
                if consumed == 0:
                    spans.append((len(out_ids), T * Pn, T))
                for j in range(expand):
                    pid = (vhash + consumed * expand + j) % (2**30)
                    positions.append(len(out_ids))
                    out_ids.append(-1 - pid)
                consumed += 1
            else:
                out_ids.append(t)
        mrope_table, mrope_delta = None, 0
        if getattr(model, "uses_mrope", False):
            mrope_table, mrope_delta = model.compute_mrope(out_ids, spans)
        return (
            out_ids,
            np.asarray(positions, np.int64),
            feats.reshape(T * Pn, H),
            mrope_table,
            mrope_delta,
            None,
            None,
            None,
        )

    def _prepare_multimodal(self, input_ids: list[int], image_data):
        """Encode images and splice them into the prompt.

        Analogue of the reference's image-processor + pad_input_ids scheme
        (reference: scratchpad/managers/image_processor.py:281-479): each
        ``<image>`` placeholder expands into num_image_tokens NEGATIVE pseudo
        ids derived from the image content hash (distinct images never
        radix-alias), and the projected vision features ride on the request
        as embedding overrides for exactly those rows.
        """
        import hashlib

        model = self.scheduler.runner.model
        if not getattr(model, "is_multimodal", False):
            raise ValueError(
                f"{self.model_config.architecture} does not accept image_data"
            )
        cross_len = None
        if isinstance(image_data, tuple):
            # tiled Mllama input from preprocess_image: (tiles
            # [max_tiles, C, S, S], aspect_ratio_id, n_tiles)
            assert getattr(model, "has_cross_attention", False), (
                "tiled image tuples are for cross-attention (Mllama) models"
            )
            tiles, ar_id, n_tiles = image_data
            px = np.asarray(tiles, np.float32)[None]  # [1, Tm, C, S, S]
            feats = self.scheduler.runner.encode_images(
                px, np.array([ar_id], np.int32), np.array([n_tiles], np.int32)
            )  # [1, Tm*P0, H]
            cross_len = int(n_tiles) * model.vision.num_patches
        else:
            px = np.asarray(image_data, np.float32)
            if px.ndim == 3:
                px = px[None]
            assert px.ndim == 4, "image_data must be [N, C, H, W] pixel values"
            expected = getattr(
                getattr(model, "vision", None), "image_size", None
            )
            if expected is not None and px.shape[2:] != (expected, expected):
                raise ValueError(
                    f"image_data is {px.shape[2]}x{px.shape[3]} but "
                    f"{self.model_config.architecture} expects "
                    f"{expected}x{expected} pixels (use Engine.preprocess_image)"
                )
            feats = self.scheduler.runner.encode_images(px)  # [N, P, H]
        cross_states = None
        if getattr(model, "has_cross_attention", False):
            # Mllama: the image contributes CROSS-attention states, not
            # embedded rows; the single placeholder row per image keeps the
            # learned <|image|> embedding under a content-hashed pseudo id
            assert px.shape[0] == 1, "one image per request for Mllama (v1)"
            cross_states = np.asarray(feats[0], np.float32)  # [S_img, H]
            if cross_len is None:
                cross_len = cross_states.shape[0]
            emb = self.scheduler.runner.image_token_embedding()
            feats = np.broadcast_to(emb, (1, 1, emb.shape[-1]))
        N, Pn, H = feats.shape
        img_tok = model.image_token_index
        n_ph = sum(1 for t in input_ids if t == img_tok)
        if n_ph == N * Pn:
            expand = 1  # prompt arrived pre-expanded (HF-processor style)
        elif n_ph == N:
            expand = Pn
        else:
            raise ValueError(
                f"prompt has {n_ph} image tokens for {N} images "
                f"({Pn} patches each)"
            )
        hashes = [
            int.from_bytes(
                hashlib.blake2b(px[i].tobytes(), digest_size=8).digest(),
                "little",
            )
            for i in range(N)
        ]
        out_ids: list[int] = []
        positions: list[int] = []
        spans: list[tuple[int, int]] = []  # (start_row, n_tokens) per image
        consumed = 0  # image-token occurrences seen so far
        for t in input_ids:
            if t == img_tok:
                if expand == 1:  # each occurrence = one patch
                    img_i, patch0 = divmod(consumed, Pn)
                    if patch0 == 0:
                        spans.append((len(out_ids), Pn))
                else:  # each occurrence = one whole image
                    img_i, patch0 = consumed, 0
                    spans.append((len(out_ids), Pn))
                for j in range(expand):
                    pid = (hashes[img_i] + patch0 + j) % (2**30)
                    positions.append(len(out_ids))
                    out_ids.append(-1 - pid)
                consumed += 1
            else:
                out_ids.append(t)
        mrope_table, mrope_delta = None, 0
        if getattr(model, "uses_mrope", False):
            mrope_table, mrope_delta = model.compute_mrope(out_ids, spans)
        # Gemma3-MM: image spans attend bidirectionally; keep the absolute
        # (start, end) ranges so the extend mask can honor them
        mm_spans = None
        if getattr(model, "bidirectional_image_attention", False):
            mm_spans = [(s0, s0 + n) for s0, n in spans]
        return (
            out_ids,
            np.asarray(positions, np.int64),
            feats.reshape(N * Pn, H),
            mrope_table,
            mrope_delta,
            cross_states,
            mm_spans,
            cross_len,
        )

    # ------------------------------------------------------------ sync API

    def generate(
        self,
        prompt: Optional[Union[str, list[str]]] = None,
        input_ids: Optional[Union[list[int], list[list[int]]]] = None,
        sampling_params: Optional[
            Union[SamplingParams, list[SamplingParams]]
        ] = None,
        return_logprob: bool = False,
        topping: Optional[Union[str, list]] = None,
        image_data=None,
        video_data=None,
    ) -> Union[GenerationOutput, list[GenerationOutput]]:
        """Blocking generation for one prompt or a batch
        (reference: server/engine.py:68 generate). ``image_data``: pixel
        values [N, C, H, W] (or a per-prompt list of such) for VLM models;
        prompts reference images via the model's image token."""
        batched = isinstance(prompt, list) or (
            input_ids is not None
            and len(input_ids) > 0
            and isinstance(input_ids[0], (list, tuple))
        )
        prompts = prompt if isinstance(prompt, list) else [prompt]
        if input_ids is not None and not batched:
            idss = [input_ids]
        else:
            idss = input_ids if input_ids is not None else [None] * len(prompts)
        if prompt is None:
            prompts = [None] * len(idss)
        sps = (
            sampling_params
            if isinstance(sampling_params, list)
            else [sampling_params] * len(prompts)
        )
        tops = topping if isinstance(topping, list) else [topping] * len(prompts)
        imgs = (
            image_data
            if isinstance(image_data, list)
            else [image_data] * len(prompts)
        )
        vids = (
            video_data
            if isinstance(video_data, list)
            else [video_data] * len(prompts)
        )
        # parallel sampling (n > 1): pre-cache each prompt's prefix with a
        # zero-token warmup request, then expand into n stochastic clones
        # (reference: managers/tokenizer.py:321 _handle_batch_request)
        if any(s is not None and s.n > 1 for s in sps):
            warmups = []
            for p, i, s, t, im, vd in zip(
                prompts, idss, sps, tops, imgs, vids
            ):
                if s is not None and s.n > 1:
                    warmups.append(
                        self._make_req(
                            p,
                            i,
                            dataclasses.replace(s, max_new_tokens=0, n=1),
                            topping=t,
                            image_data=im,
                            video_data=vd,
                        )
                    )
            for r in warmups:
                self.scheduler.add_request(r)
            while any(not r.finished() for r in warmups):
                if not self.scheduler.step() and not self.scheduler.has_work():
                    break
            new = ([], [], [], [], [], [])
            for p, i, s, t, im, vd in zip(
                prompts, idss, sps, tops, imgs, vids
            ):
                reps = s.n if s is not None else 1
                for _ in range(reps):
                    new[0].append(p)
                    new[1].append(i)
                    new[2].append(
                        dataclasses.replace(s, n=1) if s is not None else None
                    )
                    new[3].append(t)
                    new[4].append(im)
                    new[5].append(vd)
            prompts, idss, sps, tops, imgs, vids = new
            batched = True
        reqs = [
            self._make_req(
                p, i, s, return_logprob, topping=t, image_data=im,
                video_data=vd,
            )
            for p, i, s, t, im, vd in zip(
                prompts, idss, sps, tops, imgs, vids
            )
        ]
        for r in reqs:
            self.scheduler.add_request(r)
        pending = {r.rid for r in reqs}
        while pending:
            events = self.scheduler.step()
            if not events and not self.scheduler.has_work():
                break
            for ev in events:
                self._postprocess_event(ev)
                if ev.req.finished() and ev.req.rid in pending:
                    pending.discard(ev.req.rid)
        for ev in self.scheduler.drain():
            self._postprocess_event(ev)
        outs = [self._to_output(r) for r in reqs]
        return outs if batched else outs[0]

    def generate_stream(
        self,
        prompt: Optional[str] = None,
        input_ids: Optional[list[int]] = None,
        sampling_params: Optional[SamplingParams] = None,
        image_data=None,
        video_data=None,
    ) -> Iterator[dict]:
        """Streaming generation for a single request; yields text deltas."""
        req = self._make_req(
            prompt, input_ids, sampling_params, image_data=image_data,
            video_data=video_data,
        )
        req.stream = True
        self.scheduler.add_request(req)
        while not req.finished():
            events = self.scheduler.step()
            if not events and not self.scheduler.has_work():
                break
            for ev in events:
                self._postprocess_event(ev)
            safe = IncrementalDetokenizer.stream_safe_len(req)
            ntok = len(req.output_ids)
            if safe > req.stream_sent_len:
                delta = req.decoded_text[req.stream_sent_len : safe]
                req.stream_sent_len = safe
                req.stream_sent_tokens = ntok
                yield {"delta": delta, "finished": False}
            elif ntok > req.stream_sent_tokens and not req.finished():
                # token progress without streamable text (see async_runner)
                req.stream_sent_tokens = ntok
                yield {"delta": "", "finished": False}
        for ev in self.scheduler.drain():
            self._postprocess_event(ev)
        if len(req.decoded_text) > req.stream_sent_len:
            yield {
                "delta": req.decoded_text[req.stream_sent_len :],
                "finished": False,
            }
            req.stream_sent_len = len(req.decoded_text)
        yield {
            "delta": "",
            "finished": True,
            "output": self._to_output(req),
        }

    # --------------------------------------------------------------- helpers

    def _postprocess_event(self, ev: StepEvent) -> None:
        req = ev.req
        if ev.new_tokens:
            self.latency.on_tokens(req, len(ev.new_tokens))
        if req.finished():
            self.latency.on_finish(req)
        if not ev.new_tokens:
            return
        self.detokenizer.step(req)
        if not req.finished() and self.detokenizer.check_stop_strings(req):
            # scheduler cleans this req at the start of its next step
            pass

    def _to_output(self, req: Req) -> GenerationOutput:
        if req.finished() and req.read_offset < len(req.output_ids):
            self.detokenizer.step(req)
            self.detokenizer.check_stop_strings(req)
        reason = req.finished_reason or FinishReason.ABORT
        return GenerationOutput(
            rid=req.rid,
            text=req.decoded_text,
            output_ids=list(req.output_ids),
            finish_reason=reason.to_openai(),
            prompt_tokens=len(req.origin_input_ids),
            completion_tokens=len(req.output_ids),
            cached_tokens=req.cached_prefix_len,
            output_token_logprobs=(
                list(req.output_token_logprobs) if req.return_logprob else None
            ),
            output_top_logprobs=(
                list(req.output_top_logprobs)
                if req.output_top_logprobs
                else None
            ),
            ttft=(
                req.first_token_at - req.created_at if req.first_token_at else None
            ),
            e2e_latency=(
                req.finished_at - req.created_at if req.finished_at else None
            ),
        )

    def encode(
        self,
        prompt: Optional[Union[str, list[str]]] = None,
        input_ids: Optional[Union[list[int], list[list[int]]]] = None,
    ):
        """Embedding inference: L2-normalised last-token hidden states
        (reference: llama_embedding.py + /v1/embeddings)."""
        batched = isinstance(prompt, list) or (
            input_ids is not None
            and len(input_ids) > 0
            and isinstance(input_ids[0], (list, tuple))
        )
        prompts = prompt if isinstance(prompt, list) else [prompt]
        if input_ids is not None and not batched:
            idss = [input_ids]
        else:
            idss = input_ids if input_ids is not None else [None] * len(prompts)
        if prompt is None:
            prompts = [None] * len(idss)
        reqs = []
        for p, i in zip(prompts, idss):
            r = self._make_req(p, i, SamplingParams(max_new_tokens=0))
            r.is_embedding = True
            reqs.append(r)
            self.scheduler.add_request(r)
        while any(not r.finished() for r in reqs):
            if not self.scheduler.step() and not self.scheduler.has_work():
                break
        embs = [r.embedding for r in reqs]
        return embs if batched else embs[0]

    # --------------------------------------------------------------- sessions

    def _session_store(self) -> dict:
        """Bounded session store: LRU capacity cap + TTL sweep so long-lived
        serving can't grow session history without bound (VERDICT r3 weak 9;
        reference bounds its per-request state the same way —
        managers/detokenizer.py:211 LimitedCapacityDict)."""
        if not hasattr(self, "_sessions"):
            import collections

            # sid -> (history token list, last-use monotonic time)
            self._sessions: "collections.OrderedDict" = collections.OrderedDict()
        return self._sessions

    def _session_sweep(self) -> None:
        import time as _time

        store = self._session_store()
        ttl = self.args.session_ttl
        if ttl > 0:
            now = _time.monotonic()
            dead = [s for s, (_, t) in store.items() if now - t > ttl]
            for s in dead:
                del store[s]
        cap = self.args.max_sessions
        while cap > 0 and len(store) > cap:
            store.popitem(last=False)  # LRU eviction

    def open_session(self) -> str:
        """Multi-turn session: subsequent generate(session_id=...) calls
        continue from the accumulated token history; the radix cache makes
        re-prefill an O(new tokens) operation
        (reference: session fields in GenerateReqInput, managers/structs.py)."""
        import time as _time

        store = self._session_store()
        sid = uuid.uuid4().hex
        store[sid] = ([], _time.monotonic())
        self._session_sweep()
        return sid

    def close_session(self, sid: str) -> None:
        getattr(self, "_sessions", {}).pop(sid, None)

    def session_generate(
        self,
        sid: str,
        prompt: Optional[str] = None,
        input_ids: Optional[list[int]] = None,
        sampling_params: Optional[SamplingParams] = None,
    ) -> GenerationOutput:
        import time as _time

        store = self._session_store()
        if sid not in store:
            raise KeyError(f"unknown or expired session {sid!r}")
        history, _ = store[sid]
        if input_ids is None:
            input_ids = self.tokenizer.encode(prompt)
        full = history + list(input_ids)
        out = self.generate(input_ids=full, sampling_params=sampling_params)
        store[sid] = (full + out.output_ids, _time.monotonic())
        store.move_to_end(sid)  # refresh LRU position
        self._session_sweep()
        return out

    def score(self, input_ids: list[int]) -> list[float]:
        """Teacher-forcing next-token logprobs for a sequence (perplexity
        building block). Engine must be idle; pages are borrowed and freed."""
        import numpy as np

        from scratchpad_tpu.executor.forward_meta import ForwardMode
        from scratchpad_tpu.executor.model_runner import WorkerBatch
        from scratchpad_tpu.sampling.batch_info import SamplingBatchInfo

        sched = self.scheduler
        sched.drain()
        assert not sched.has_work(), "score() requires an idle engine"
        n = len(input_ids)
        ps = sched.page_size
        pages = sched._alloc_pages(-(-n // ps))
        assert pages is not None, "prompt too long for KV pool"
        try:
            pos = np.arange(n)
            loc = (pages[pos // ps] * ps + pos % ps).astype(np.int32)
            sinfo = SamplingBatchInfo(
                temperature=np.zeros(1, np.float32),
                top_p=np.ones(1, np.float32),
                top_k=np.full(1, self.model_config.vocab_size, np.int32),
                min_p=np.zeros(1, np.float32),
            )
            wb = WorkerBatch(
                mode=ForwardMode.EXTEND,
                tokens=np.asarray(input_ids, np.int32),
                positions=pos.astype(np.int32),
                out_cache_loc=loc,
                req_indices=np.zeros(n, np.int32),
                page_table=pages[None, :].astype(np.int32),
                seq_lens=np.array([n], np.int32),
                extend_lens=np.array([n], np.int32),
                sampling_info=sinfo,
            )
            lps = sched.runner.run_score(wb)
        finally:
            sched.allocator.free(pages)
        # position t holds logprob of token t+1; the last has no target
        return lps[: n - 1].tolist()

    def perplexity(self, input_ids: list[int]) -> float:
        import math

        lps = self.score(input_ids)
        return math.exp(-sum(lps) / max(len(lps), 1))

    def update_weights(self, model_path: str = None, state: dict = None):
        """Swap weights in place; flushes the radix cache on success
        (reference: scheduler.py:1834-1842 update_weights + flush)."""
        self.scheduler.drain()
        assert not self.scheduler.has_work(), "drain requests first"
        if state is None:
            from scratchpad_tpu.executor.weight_loader import load_hf_state

            state = load_hf_state(model_path)
        ok, msg = self.scheduler.runner.update_weights(state)
        if ok:
            self.flush_cache()
        return ok, msg

    def flush_cache(self) -> None:
        self.scheduler.drain()
        assert not self.scheduler.has_work()
        self.scheduler.tree_cache.reset()
        self.scheduler.allocator.clear()
        self.scheduler.allocator.alloc(1)  # re-reserve dump page
        if self.scheduler.host_tier is not None:
            self.scheduler.host_tier.reset()

    def resize_kv_pool(self, new_num_tokens: int) -> int:
        """Grow/shrink the KV pool at runtime; returns the new token
        capacity (reference: SystemController /memory_pool/increase)."""
        self.scheduler.drain()
        return self.scheduler.resize_kv_pool(new_num_tokens)

    def shutdown(self) -> None:
        ctrl = getattr(self, "_ctrl", None)
        if ctrl is not None:
            ctrl.close()  # sends ("stop",) to every follower
