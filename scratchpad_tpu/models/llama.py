"""Llama family (Llama 2/3.x, TinyLlama) — functional JAX implementation.

Replaces the reference's torch LlamaForCausalLM
(reference: scratchpad/nn/models/llama/llama.py:275-423). Params are a pytree
with all decoder layers stacked on a leading axis and the forward is a single
`lax.scan` over layers, so trace/compile time is independent of depth.

Tensor parallelism: head/ffn dims carry PartitionSpecs over the mesh "tp"
axis (see param_specs); XLA's SPMD partitioner inserts the all-reduces the
reference issues manually after o_proj/down_proj
(reference: scratchpad/nn/layers/linear.py:1007, RowParallelLinear).
"""

from __future__ import annotations

from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from scratchpad_tpu.config.model_config import ModelConfig
from scratchpad_tpu.executor.forward_meta import ForwardMeta, ForwardMode
from scratchpad_tpu.memory.kv_cache import KVCache
from scratchpad_tpu.models.common import (
    apply_rope,
    compute_inv_freq,
    rms_norm,
    shard_rows,
    silu_mul,
)
from scratchpad_tpu.ops.attention import (
    decode_attention_xla,
    extend_attention_xla,
    write_kv,
)


class LlamaForCausalLM:
    """Functional model: __call__(params, kv, meta) -> (kv, logits)."""

    # the decoder body consumes the fused gate|up W4 stack when present
    # (quantize_model_params fuse_gate_up)
    supports_fused_gate_up = True
    # the logits epilogue consumes params["lm_head_q"] when present
    # (model_runner quantize_lm_head auto)
    supports_quantized_lm_head = True

    def __init__(self, cfg: ModelConfig):
        self.cfg = cfg
        self.inv_freq = compute_inv_freq(cfg)
        # multimodal 3-D rope (Qwen2-VL): channel->component map, or None
        self.mrope_comp = None
        if cfg.rope_scaling and cfg.rope_scaling.get("mrope_section"):
            from scratchpad_tpu.models.common import mrope_channel_components

            self.mrope_comp = mrope_channel_components(
                cfg.rope_scaling["mrope_section"], cfg.head_dim
            )
        from scratchpad_tpu.models.common import rope_attention_scale

        self.sm_scale = float(
            rope_attention_scale(cfg) / np.sqrt(cfg.head_dim)
        )
        # attention impls; the executor may swap in Pallas kernels
        self.decode_attention = decode_attention_xla
        self.extend_attention = extend_attention_xla
        # W4A16 matmul: Pallas on accelerators (4-bit-native storage when
        # converted), XLA reference path on CPU / SPTPU_W4_IMPL=xla
        from scratchpad_tpu.models.common import make_quant_matmul

        self.quant_matmul = make_quant_matmul()

    # ------------------------------------------------------------- parameters

    def init_params(self, rng: jax.Array, dtype=jnp.bfloat16) -> dict[str, Any]:
        """Random init (bench/tests without checkpoints)."""
        cfg = self.cfg
        H, L = cfg.hidden_size, cfg.num_hidden_layers
        D, Hq, Hkv = cfg.head_dim, cfg.num_attention_heads, cfg.num_kv_heads
        I, V = cfg.intermediate_size, cfg.vocab_size
        keys = iter(jax.random.split(rng, 16))

        def init(key, shape, scale_dim):
            return (
                jax.random.normal(key, shape, jnp.float32) / np.sqrt(scale_dim)
            ).astype(dtype)

        params = {
            "embed": init(next(keys), (V, H), H),
            "layers": {
                "input_norm": jnp.ones((L, H), dtype),
                "post_norm": jnp.ones((L, H), dtype),
                "wq": init(next(keys), (L, H, Hq * D), H),
                "wk": init(next(keys), (L, H, Hkv * D), H),
                "wv": init(next(keys), (L, H, Hkv * D), H),
                "wo": init(next(keys), (L, Hq * D, H), Hq * D),
                "gate": init(next(keys), (L, H, I), H),
                "up": init(next(keys), (L, H, I), H),
                "down": init(next(keys), (L, I, H), I),
            },
            "final_norm": jnp.ones((H,), dtype),
        }
        if cfg.attention_bias:
            params["layers"]["bq"] = jnp.zeros((L, Hq * D), dtype)
            params["layers"]["bk"] = jnp.zeros((L, Hkv * D), dtype)
            params["layers"]["bv"] = jnp.zeros((L, Hkv * D), dtype)
        if cfg.use_qk_norm:
            params["layers"]["q_norm"] = jnp.ones((L, D), dtype)
            params["layers"]["k_norm"] = jnp.ones((L, D), dtype)
        if not cfg.tie_word_embeddings:
            params["lm_head"] = init(next(keys), (V, H), H)
        return params

    def param_specs(self, tp_axis: str = "tp") -> dict[str, Any]:
        """PartitionSpec tree matching init_params / load_hf_params layout."""
        t = tp_axis
        specs = {
            "embed": P(t, None),  # vocab-sharded (reference: vocab_parallel_embedding.py)
            "layers": {
                "input_norm": P(None, None),
                "post_norm": P(None, None),
                "wq": P(None, None, t),
                "wk": P(None, None, t),
                "wv": P(None, None, t),
                "wo": P(None, t, None),
                "gate": P(None, None, t),
                "up": P(None, None, t),
                "down": P(None, t, None),
            },
            "final_norm": P(None),
        }
        if self.cfg.attention_bias:
            specs["layers"]["bq"] = P(None, t)
            specs["layers"]["bk"] = P(None, t)
            specs["layers"]["bv"] = P(None, t)
        if self.cfg.use_qk_norm:
            specs["layers"]["q_norm"] = P(None, None)
            specs["layers"]["k_norm"] = P(None, None)
        if not self.cfg.tie_word_embeddings:
            specs["lm_head"] = P(t, None)
        return specs

    # ------------------------------------------------------------ hf weights

    HF_LAYER_MAP = {
        "self_attn.q_proj.weight": ("wq", True),
        "self_attn.k_proj.weight": ("wk", True),
        "self_attn.v_proj.weight": ("wv", True),
        "self_attn.o_proj.weight": ("wo", True),
        "self_attn.q_proj.bias": ("bq", False),
        "self_attn.k_proj.bias": ("bk", False),
        "self_attn.v_proj.bias": ("bv", False),
        "self_attn.q_norm.weight": ("q_norm", False),
        "self_attn.k_norm.weight": ("k_norm", False),
        "mlp.gate_proj.weight": ("gate", True),
        "mlp.up_proj.weight": ("up", True),
        "mlp.down_proj.weight": ("down", True),
        "input_layernorm.weight": ("input_norm", False),
        "post_attention_layernorm.weight": ("post_norm", False),
    }

    def convert_hf_state(self, state: dict[str, np.ndarray], dtype=jnp.bfloat16):
        """Map a flat HF state dict to our stacked-layer pytree (host-side).

        Equivalent of the reference's per-model ``load_weights``
        (reference: scratchpad/nn/models/llama/llama.py:336-418). HF linear
        weights are [out, in]; we store [in, out] so forward is x @ W.
        """
        cfg = self.cfg
        L = cfg.num_hidden_layers
        layers: dict[str, list] = {}
        out: dict[str, Any] = {"layers": {}}
        for name, w in state.items():
            if name.startswith("model.layers."):
                rest = name[len("model.layers.") :]
                idx_s, sub = rest.split(".", 1)
                tgt, transpose = self.HF_LAYER_MAP[sub]
                layers.setdefault(tgt, [None] * L)[int(idx_s)] = (
                    w.T if transpose else w
                )
            elif name == "model.embed_tokens.weight":
                out["embed"] = w
            elif name == "model.norm.weight":
                out["final_norm"] = w
            elif name == "lm_head.weight":
                if not cfg.tie_word_embeddings:
                    out["lm_head"] = w
            elif name.endswith("rotary_emb.inv_freq"):
                pass
            else:
                raise KeyError(f"unmapped HF weight {name}")
        for k, ws in layers.items():
            assert all(x is not None for x in ws), f"missing layer weights for {k}"
            out["layers"][k] = np.stack(ws)
        if cfg.tie_word_embeddings and "lm_head" in out:
            del out["lm_head"]
        return jax.tree.map(lambda x: jnp.asarray(x, dtype), out)

    # ---------------------------------------------------------------- forward

    def embed_tokens(self, params: dict, meta: ForwardMeta) -> jax.Array:
        x = jnp.take(params["embed"], meta.tokens, axis=0)  # [T, H]
        if meta.input_embeds is not None:
            # multimodal rows carry NEGATIVE placeholder ids; their embedding
            # comes from the vision encoder (take() clips the negative index)
            x = jnp.where(
                (meta.tokens < 0)[:, None],
                meta.input_embeds.astype(x.dtype),
                x,
            )
        return x

    def finish(
        self, params: dict, x: jax.Array, meta: ForwardMeta
    ) -> jax.Array:
        """Final norm + LM head (or hidden-state capture)."""
        cfg = self.cfg
        h = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
        if getattr(meta, "capture_all_hidden", False):
            return h  # [T, H] for sequence scoring
        last = jnp.take(h, meta.last_token_idx, axis=0)  # [B, H]
        if getattr(meta, "capture_hidden", False):
            return last
        if "lm_head_q" in params:
            logits = self.quant_matmul(
                last, params["lm_head_q"], 0
            ).astype(jnp.float32)
        else:
            head = (
                params["embed"]
                if cfg.tie_word_embeddings
                else params["lm_head"]
            )
            logits = (last @ head.T).astype(jnp.float32)  # [B, V]
        if cfg.logit_softcap:
            logits = cfg.logit_softcap * jnp.tanh(logits / cfg.logit_softcap)
        return logits

    def __call__(
        self, params: dict, kv: KVCache, meta: ForwardMeta
    ) -> tuple[KVCache, jax.Array]:
        if getattr(self, "pp_mesh", None) is not None:
            from scratchpad_tpu.parallel.pp import pp_call

            return pp_call(
                self, params, kv, meta, self.pp_mesh, self.pp_microbatches
            )
        cfg = self.cfg
        L = cfg.num_hidden_layers
        x = self.embed_tokens(params, meta)
        x, kv_out = self.layers_forward(
            params,
            params["layers"],
            # host-side ids: the unrolled layer loop passes each layer's
            # CONCRETE index so the attention kernel statics its page
            # offset (ops/attention/gqa_decode.py static_layer)
            np.arange(L, dtype=np.int32),
            x,
            kv,
            meta,
        )
        return kv_out, self.finish(params, x, meta)

    def layers_forward(
        self,
        params: dict,
        layer_stack: dict,
        layer_ids: jax.Array,
        x: jax.Array,
        kv: KVCache,
        meta: ForwardMeta,
    ) -> tuple[jax.Array, KVCache]:
        """Scan the decoder over ``layer_stack`` (all layers, or one
        offload group with global ``layer_ids``)."""
        cfg = self.cfg
        Hq, Hkv, D = cfg.num_attention_heads, cfg.num_kv_heads, cfg.head_dim
        T = meta.num_tokens
        inv_freq = jnp.asarray(self.inv_freq)

        if meta.mode == ForwardMode.DECODE:
            attend = self.decode_attention
        else:
            attend = self.extend_attention

        # DP attention (set by the executor on dp x tp meshes with
        # enable_dp_attention): attention weights/KV are replicated, so pin
        # attention rows over BOTH mesh axes and the residual stream back to
        # dp rows for the tensor-parallel MLP
        dpa_mesh = self.mesh if getattr(self, "dp_attention", False) else None

        # quantized weights are captured (not scan-sliced): the Pallas W4
        # kernel indexes the layer via a prefetched BlockSpec so no
        # per-layer dynamic-slice copy ever materialises
        qlayers = params.get("layers_q")
        toppings = params.get("toppings")
        use_toppings = toppings is not None and meta.active_adapters is not None
        if use_toppings:
            from scratchpad_tpu.toppings.manager import apply_topping

            token_slot = meta.adapter_slots[meta.req_indices]  # [T]

        def lin(x_, lp, name, lidx):
            if qlayers is not None and name in qlayers:
                ql = qlayers[name]
                from scratchpad_tpu.ops.quant.fp8 import Fp8Linear, fp8_matmul

                if isinstance(ql, Fp8Linear):
                    y = fp8_matmul(x_, ql, lidx)
                else:
                    y = self.quant_matmul(x_, ql, lidx)
            else:
                w = lp[name]
                if getattr(self, "weights_transposed", False):
                    # stacks stored [L, out, in] (HF orientation): contract
                    # x's feature dim with w dim 1 — the layout XLA's TPU
                    # dot prefers, eliminating the per-step transposed
                    # weight-slice fusions seen in the r3 decode profile
                    y = jax.lax.dot_general(
                        x_, w, (((1,), (1,)), ((), ()))
                    )
                else:
                    y = x_ @ w
            if use_toppings:
                y = apply_topping(
                    x_, y, toppings, name, lidx,
                    meta.active_adapters, token_slot,
                )
            return y

        def body(carry, layer):
            x, kv_c = carry
            lp, lidx = layer
            h = rms_norm(x, lp["input_norm"], cfg.rms_norm_eps)
            q = lin(h, lp, "wq", lidx)
            kn = lin(h, lp, "wk", lidx)
            vn = lin(h, lp, "wv", lidx)
            if cfg.attention_bias:
                q = q + lp["bq"]
                kn = kn + lp["bk"]
                vn = vn + lp["bv"]
            q = shard_rows(q.reshape(T, Hq, D), dpa_mesh, ("dp", "tp"))
            kn = shard_rows(kn.reshape(T, Hkv, D), dpa_mesh, ("dp", "tp"))
            vn = shard_rows(vn.reshape(T, Hkv, D), dpa_mesh, ("dp", "tp"))
            if cfg.use_qk_norm:
                q = rms_norm(q, lp["q_norm"], cfg.rms_norm_eps)
                kn = rms_norm(kn, lp["k_norm"], cfg.rms_norm_eps)
            if self.mrope_comp is not None and meta.mrope_positions is not None:
                from scratchpad_tpu.models.common import apply_mrope

                comp = jnp.asarray(self.mrope_comp)
                q = apply_mrope(q, meta.mrope_positions, inv_freq, comp)
                kn = apply_mrope(kn, meta.mrope_positions, inv_freq, comp)
            else:
                rpos = meta.positions
                if meta.rope_delta is not None:
                    # all three mrope components equal beyond the prompt, so
                    # plain rope at a shifted position is exact
                    rpos = rpos + meta.rope_delta[meta.req_indices]
                q = apply_rope(q, rpos, inv_freq)
                kn = apply_rope(kn, rpos, inv_freq)
            kv_c = write_kv(kv_c, kn, vn, lidx, meta.out_cache_loc)
            attn = attend(
                q,
                kv_c,
                lidx,
                meta,
                page_size=self.page_size,
                sm_scale=self.sm_scale,
                logit_cap=cfg.attn_logit_softcap,
                # uniform window (Mistral v0.1/v0.2); per-layer window
                # models (Gemma, GPT-OSS) have their own forwards
                sliding_window=cfg.sliding_window,
            )
            attn = shard_rows(attn, dpa_mesh, ("dp", "tp"))
            x = x + lin(attn.reshape(T, Hq * D), lp, "wo", lidx)
            # row gather at the attention/MLP boundary: back to dp-sharded
            # rows so gate/up/down run tensor-parallel over tp
            x = shard_rows(x, dpa_mesh, "dp")
            h2 = rms_norm(x, lp["post_norm"], cfg.rms_norm_eps)
            if qlayers is not None and "gate_up_f" in qlayers:
                # fused gate|up W4 matmul (single-device): one kernel call
                # quantizes/reads the activations once for both projections
                gu = self.quant_matmul(h2, qlayers["gate_up_f"], lidx)
                Ih = gu.shape[-1] // 2
                g, u = gu[..., :Ih], gu[..., Ih:]
                if use_toppings:
                    g = apply_topping(
                        h2, g, toppings, "gate", lidx,
                        meta.active_adapters, token_slot,
                    )
                    u = apply_topping(
                        h2, u, toppings, "up", lidx,
                        meta.active_adapters, token_slot,
                    )
                act = silu_mul(g, u)
            else:
                act = silu_mul(
                    lin(h2, lp, "gate", lidx), lin(h2, lp, "up", lidx)
                )
            x = x + lin(act, lp, "down", lidx)
            return (x, kv_c), None

        # Unrolled layer loop (default): lax.scan over stacked weights made
        # XLA materialise a dynamic-slice COPY of every layer's weight
        # before its matmul — the r3 decode profile showed those
        # constant_dynamic-slice fusions + oversized matmul fusions roughly
        # DOUBLING weight HBM traffic (copy at ~full bandwidth, then read
        # again). Static a[l] slices are contiguous views the matmuls read
        # in place. Trace/compile cost grows with depth; set
        # SPTPU_LAYER_SCAN=1 to restore the scan (e.g. for very deep
        # models where compile time dominates).
        import os as _os

        if _os.environ.get("SPTPU_LAYER_SCAN", "0") == "1":
            (x, kv_out), _ = jax.lax.scan(
                body,
                (x, kv),
                (layer_stack, jnp.asarray(layer_ids)),
            )
            return x, kv_out
        carry = (x, kv)
        nl = layer_ids.shape[0]
        for l in range(nl):
            lp = jax.tree.map(lambda a: a[l], layer_stack)
            lid = layer_ids[l]  # concrete np.int32 when ids are host-side
            carry, _ = body(carry, (lp, lid))
        x, kv_out = carry
        return x, kv_out

    # decoder matmul stacks the executor may store transposed ([L, out,
    # in]) on single-chip runs — see model_runner SPTPU_WT and lin()
    TRANSPOSED_STACK_WEIGHTS = ("wq", "wk", "wv", "wo", "gate", "up", "down")
    # set by the executor before jit (page size is static per engine)
    page_size: int = 16
    # DP attention (models/common.py dp_attention_respec): the per-layer
    # params that must replicate when attention runs data-parallel
    ATTN_PARAM_KEYS = frozenset(
        {"wq", "wk", "wv", "wo", "bq", "bk", "bv", "q_norm", "k_norm"}
    )
    dp_attention: bool = False
    # pipeline parallelism: set by the executor when the mesh has a "pp"
    # axis (parallel/pp.py pp_call takes over __call__)
    pp_mesh = None
    pp_microbatches: int = 1
