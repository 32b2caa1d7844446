"""Mixtral-style sparse MoE models.

Counterpart of the reference's Llama-MoE family
(reference: scratchpad/nn/models/llama/llama_moe.py:243,
llama_quant_moe.py:29-36, nn/layers/fused_moe/patch.py:92).

TPU-first expert execution: decode is memory-bound and every expert's
weights are resident, so the forward LOOPS over experts with per-token
routing masks — dense MXU matmuls, no gather/scatter dispatch (the
reference needs triteia's sbmm batched expert GEMM for this). Routing
follows HF Mixtral: softmax over all experts -> top-k -> renormalize.
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
from scratchpad_tpu.ops.attention import write_kv
from scratchpad_tpu.ops.attention.xla_backend import (
    decode_attention_xla,
    extend_attention_xla,
)


class MixtralForCausalLM:
    page_size: int = 16
    norm_topk: bool = True
    # DP attention (models/common.py dp_attention_respec)
    ATTN_PARAM_KEYS = frozenset({"wq", "wk", "wv", "wo", "q_norm", "k_norm"})
    dp_attention: bool = False

    def __init__(self, cfg: ModelConfig):
        assert cfg.num_experts > 0, "MoE model needs num_experts"
        self.cfg = cfg
        self.inv_freq = compute_inv_freq(cfg)
        self.sm_scale = cfg.head_dim**-0.5
        self.decode_attention = decode_attention_xla
        self.extend_attention = extend_attention_xla
        from scratchpad_tpu.models.common import make_quant_matmul

        self.quant_matmul = make_quant_matmul()

    # ------------------------------------------------------------ parameters

    def init_params(self, rng: jax.Array, dtype=jnp.bfloat16) -> dict[str, Any]:
        cfg = self.cfg
        H, L, E = cfg.hidden_size, cfg.num_hidden_layers, cfg.num_experts
        D, Hq, Hkv = cfg.head_dim, cfg.num_attention_heads, cfg.num_kv_heads
        I = cfg.moe_intermediate_size or cfg.intermediate_size
        V = cfg.vocab_size
        keys = iter(jax.random.split(rng, 16))

        def init(key, shape, scale_dim):
            n = int(np.prod(shape))
            if n > 2**28:  # big expert stacks: stream via numpy
                from scratchpad_tpu.models.common import init_stacked_lean

                seed = int(jax.random.randint(key, (), 0, 2**31 - 1))
                return init_stacked_lean(seed, shape, scale_dim, dtype)
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
                "router": init(next(keys), (L, H, E), H),
                "w1": init(next(keys), (L, E, H, I), H),  # gate
                "w3": init(next(keys), (L, E, H, I), H),  # up
                "w2": init(next(keys), (L, E, I, H), I),  # down
            },
            "final_norm": jnp.ones((H,), dtype),
        }
        if cfg.use_qk_norm:
            params["layers"]["q_norm"] = jnp.ones((L, D), dtype)
            params["layers"]["k_norm"] = jnp.ones((L, D), dtype)
        if not cfg.tie_word_embeddings:
            params["lm_head"] = init(next(keys), (V, H), H)
        return params

    def param_specs(self, tp_axis: str = "tp") -> dict[str, Any]:
        t = tp_axis
        # EP shards the EXPERT axis over the mesh (each device owns E/tp
        # whole experts and psums contributions); default TP shards every
        # expert's ffw dim instead. EP needs no collectives inside the
        # expert matmuls and keeps each matmul full-width on the MXU.
        if getattr(self, "use_ep", False):
            we1 = we3 = P(None, t, None, None)
            we2 = P(None, t, None, None)
        else:
            we1 = we3 = P(None, None, None, t)
            we2 = P(None, None, t, None)
        specs = {
            "embed": P(t, None),
            "layers": {
                "input_norm": P(None, None),
                "post_norm": P(None, None),
                "wq": P(None, None, t),
                "wk": P(None, None, t),
                "wv": P(None, None, t),
                "wo": P(None, t, None),
                "router": P(None, None, None),
                "w1": we1,
                "w3": we3,
                "w2": we2,
            },
            "final_norm": P(None),
        }
        if self.cfg.use_qk_norm:
            specs["layers"]["q_norm"] = P(None, None)
            specs["layers"]["k_norm"] = P(None, None)
        if not self.cfg.tie_word_embeddings:
            specs["lm_head"] = P(t, None)
        return specs

    def convert_hf_state(self, state: dict[str, np.ndarray], dtype=jnp.bfloat16):
        cfg = self.cfg
        L, E = cfg.num_hidden_layers, cfg.num_experts
        layers: dict[str, list] = {}
        out: dict[str, Any] = {"layers": {}}

        def put(tgt, l, w, e=None):
            if tgt in ("w1", "w2", "w3"):
                slot = layers.setdefault(tgt, [[None] * E for _ in range(L)])
                slot[l][e] = w
            else:
                layers.setdefault(tgt, [None] * L)[l] = w

        for name, w in state.items():
            if name.startswith("model.layers."):
                rest = name[len("model.layers.") :]
                l_s, sub = rest.split(".", 1)
                l = int(l_s)
                if sub.startswith("block_sparse_moe.experts."):
                    parts = sub.split(".")
                    e = int(parts[2])
                    which = parts[3]  # w1|w2|w3
                    put(which, l, w.T, e)
                elif sub == "block_sparse_moe.gate.weight":
                    put("router", l, w.T)
                elif sub == "self_attn.q_proj.weight":
                    put("wq", l, w.T)
                elif sub == "self_attn.k_proj.weight":
                    put("wk", l, w.T)
                elif sub == "self_attn.v_proj.weight":
                    put("wv", l, w.T)
                elif sub == "self_attn.o_proj.weight":
                    put("wo", l, w.T)
                elif sub == "input_layernorm.weight":
                    put("input_norm", l, w)
                elif sub == "post_attention_layernorm.weight":
                    put("post_norm", l, w)
                else:
                    raise KeyError(f"unmapped {name}")
            elif name == "model.embed_tokens.weight":
                out["embed"] = w
            elif name == "model.norm.weight":
                out["final_norm"] = w
            elif name == "lm_head.weight":
                if not cfg.tie_word_embeddings:
                    out["lm_head"] = w
            else:
                raise KeyError(f"unmapped {name}")
        for k, ws in layers.items():
            if k in ("w1", "w2", "w3"):
                out["layers"][k] = np.stack(
                    [np.stack(row) for row in ws]
                )  # [L, E, ...]
            else:
                out["layers"][k] = np.stack(ws)
        return jax.tree.map(lambda x: jnp.asarray(x, dtype), out)

    # ---------------------------------------------------------------- forward

    def _moe(self, h: jax.Array, lp: dict, lidx=None, qlayers=None) -> jax.Array:
        """Masked expert loop (reference: fused_moe_forward_native,
        nn/layers/fused_moe/patch.py:92). Quantized experts ride the W4
        kernel with the (layer, expert) dims flattened into its prefetched
        index — the triteia-sbmm role (reference:
        nn/models/llama/llama_quant_moe.py:29-36)."""
        cfg = self.cfg
        E, K = cfg.num_experts, cfg.num_experts_per_tok
        logits = (h @ lp["router"]).astype(jnp.float32)  # [T, E]
        probs = jax.nn.softmax(logits, axis=-1)
        topv, topi = jax.lax.top_k(probs, K)  # [T, K]
        if self.norm_topk:  # HF Mixtral always; Qwen3-MoE iff norm_topk_prob
            topv = topv / jnp.sum(topv, axis=-1, keepdims=True)
        # per-token weight for each expert: [T, E]
        w_full = jnp.zeros((h.shape[0], E), jnp.float32)
        for k in range(K):
            w_full = w_full + jax.nn.one_hot(topi[:, k], E) * topv[:, k : k + 1]
        quant = qlayers is not None and "w1" in qlayers
        mesh = getattr(self, "mesh", None)
        if (
            getattr(self, "use_ep", False)
            and not quant  # EP shards whole experts; the flat (L*E) quant
            # stacks interleave experts fastest, so EP + W4 stays dense
            and mesh is not None
            and mesh.shape.get("tp", 1) > 1
            and E % mesh.shape["tp"] == 0
        ):
            return self._moe_ep(h, lp, w_full, mesh)
        if quant:
            from scratchpad_tpu.ops.quant.fp8 import Fp8Linear, fp8_matmul

            def qmm(x_, name, fe):
                ql = qlayers[name]
                if isinstance(ql, Fp8Linear):
                    return fp8_matmul(x_, ql, fe)
                return self.quant_matmul(x_, ql, fe)

        y = jnp.zeros_like(h)
        for e in range(E):
            if quant:
                fe = lidx * E + e  # flat (layer, expert) index
                contrib = qmm(
                    silu_mul(qmm(h, "w1", fe), qmm(h, "w3", fe)), "w2", fe
                )
            else:
                contrib = (
                    silu_mul(h @ lp["w1"][e], h @ lp["w3"][e]) @ lp["w2"][e]
                )
            y = y + contrib * w_full[:, e : e + 1].astype(h.dtype)
        return y

    def _moe_ep(self, h, lp, w_full, mesh):
        """Expert-parallel execution: each tp shard owns E/tp whole experts,
        runs the masked dense loop over its local experts for all tokens,
        and the shards' partial sums combine with ONE psum (the XLA
        analogue of the reference's all-to-all EP dispatch)."""
        from jax import shard_map
        from jax.sharding import PartitionSpec as PS

        tp = mesh.shape["tp"]
        E_loc = self.cfg.num_experts // tp

        def body(h_, wts, w1, w3, w2):
            y = jnp.zeros_like(h_)
            for e in range(E_loc):
                contrib = silu_mul(h_ @ w1[e], h_ @ w3[e]) @ w2[e]
                y = y + contrib * wts[:, e : e + 1].astype(h_.dtype)
            return jax.lax.psum(y, "tp")

        return shard_map(
            body,
            mesh=mesh,
            in_specs=(
                PS(),  # tokens replicated
                PS(None, "tp"),  # routing weights: expert axis sharded
                PS("tp", None, None),
                PS("tp", None, None),
                PS("tp", None, None),
            ),
            out_specs=PS(),
            check_vma=False,
        )(h, w_full, lp["w1"], lp["w3"], lp["w2"])

    def __call__(self, params: dict, kv: KVCache, meta: ForwardMeta):
        cfg = self.cfg
        L = cfg.num_hidden_layers
        Hq, Hkv, D = cfg.num_attention_heads, cfg.num_kv_heads, cfg.head_dim
        T = meta.num_tokens
        inv_freq = jnp.asarray(self.inv_freq)

        x = jnp.take(params["embed"], meta.tokens, axis=0)
        attend = (
            self.decode_attention
            if meta.mode == ForwardMode.DECODE
            else self.extend_attention
        )

        qlayers = params.get("layers_q")

        def lin(x_, lp, name, lidx):
            if qlayers is not None and name in qlayers:
                ql = qlayers[name]
                from scratchpad_tpu.ops.quant.fp8 import Fp8Linear, fp8_matmul

                if isinstance(ql, Fp8Linear):
                    return fp8_matmul(x_, ql, lidx)
                return self.quant_matmul(x_, ql, lidx)
            return x_ @ lp[name]

        dpa_mesh = self.mesh if getattr(self, "dp_attention", False) else None

        def body(carry, layer):
            x, kv_c = carry
            lp, lidx = layer
            h = rms_norm(x, lp["input_norm"], cfg.rms_norm_eps)
            q = shard_rows(
                lin(h, lp, "wq", lidx).reshape(T, Hq, D), dpa_mesh, ("dp", "tp")
            )
            kn = shard_rows(
                lin(h, lp, "wk", lidx).reshape(T, Hkv, D), dpa_mesh, ("dp", "tp")
            )
            vn = shard_rows(
                lin(h, lp, "wv", lidx).reshape(T, Hkv, D), dpa_mesh, ("dp", "tp")
            )
            if cfg.use_qk_norm:
                q = rms_norm(q, lp["q_norm"], cfg.rms_norm_eps)
                kn = rms_norm(kn, lp["k_norm"], cfg.rms_norm_eps)
            q = apply_rope(q, meta.positions, inv_freq)
            kn = apply_rope(kn, meta.positions, inv_freq)
            kv_c = write_kv(kv_c, kn, vn, lidx, meta.out_cache_loc)
            attn = attend(
                q, kv_c, lidx, meta,
                page_size=self.page_size,
                sm_scale=self.sm_scale,
                logit_cap=None,
                sliding_window=None,
            )
            attn = shard_rows(attn, dpa_mesh, ("dp", "tp"))
            x = x + lin(attn.reshape(T, Hq * D), lp, "wo", lidx)
            # back to dp rows: experts run tensor-parallel over tp
            x = shard_rows(x, dpa_mesh, "dp")
            h2 = rms_norm(x, lp["post_norm"], cfg.rms_norm_eps)
            x = x + self._moe(h2, lp, lidx, qlayers)
            return (x, kv_c), None

        from scratchpad_tpu.models.common import scan_layers

        (x, kv_out), _ = scan_layers(
            body, (x, kv), (params["layers"], np.arange(L, dtype=np.int32))
        )
        h = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
        if getattr(meta, "capture_all_hidden", False):
            return kv_out, h
        if getattr(meta, "capture_hidden", False):
            return kv_out, jnp.take(h, meta.last_token_idx, axis=0)
        last = jnp.take(h, meta.last_token_idx, axis=0)
        head = params["embed"] if cfg.tie_word_embeddings else params["lm_head"]
        logits = (last @ head.T).astype(jnp.float32)
        return kv_out, logits


class Qwen3MoeForCausalLM(MixtralForCausalLM):
    """Qwen3-MoE: the Mixtral sparse-expert decoder plus per-head qk RMS
    norm; top-k renormalization follows the checkpoint's norm_topk_prob.
    HF names: mlp.gate / mlp.experts.N.{gate,up,down}_proj, q_norm/k_norm.
    """

    def __init__(self, cfg: ModelConfig):
        cfg.use_qk_norm = True
        super().__init__(cfg)
        self.norm_topk = bool(cfg.norm_topk_prob)

    _HF_SUB = {
        "self_attn.q_proj.weight": "wq",
        "self_attn.k_proj.weight": "wk",
        "self_attn.v_proj.weight": "wv",
        "self_attn.o_proj.weight": "wo",
        "input_layernorm.weight": "input_norm",
        "post_attention_layernorm.weight": "post_norm",
        "mlp.gate.weight": "router",
    }
    _HF_EXPERT = {"gate_proj": "w1", "up_proj": "w3", "down_proj": "w2"}

    def convert_hf_state(self, state, dtype=jnp.bfloat16):
        cfg = self.cfg
        L, E = cfg.num_hidden_layers, cfg.num_experts
        layers: dict[str, list] = {}
        out: dict[str, Any] = {"layers": {}}

        def put(tgt, l, w, e=None):
            if tgt in ("w1", "w2", "w3"):
                slot = layers.setdefault(tgt, [[None] * E for _ in range(L)])
                slot[l][e] = w
            else:
                layers.setdefault(tgt, [None] * L)[l] = w

        for name, w in state.items():
            if name.startswith("model.layers."):
                rest = name[len("model.layers.") :]
                l_s, sub = rest.split(".", 1)
                l = int(l_s)
                if sub.startswith("mlp.experts."):
                    parts = sub.split(".")
                    put(self._HF_EXPERT[parts[3]], l, w.T, int(parts[2]))
                elif sub == "self_attn.q_norm.weight":
                    put("q_norm", l, w)
                elif sub == "self_attn.k_norm.weight":
                    put("k_norm", l, w)
                elif sub in self._HF_SUB:
                    tgt = self._HF_SUB[sub]
                    put(tgt, l, w.T)
                else:
                    raise KeyError(f"unmapped {name}")
            elif name == "model.embed_tokens.weight":
                out["embed"] = w
            elif name == "model.norm.weight":
                out["final_norm"] = w
            elif name == "lm_head.weight":
                if not cfg.tie_word_embeddings:
                    out["lm_head"] = w
            else:
                raise KeyError(f"unmapped {name}")
        for k, ws in layers.items():
            if k in ("w1", "w2", "w3"):
                out["layers"][k] = np.stack([np.stack(row) for row in ws])
            else:
                out["layers"][k] = np.stack(ws)
        return jax.tree.map(lambda x: jnp.asarray(x, dtype), out)
