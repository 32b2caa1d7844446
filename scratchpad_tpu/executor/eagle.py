"""EAGLE speculative drafts: a 1-layer head conditioned on target features.

The reference never implemented its EAGLE stub
(reference: scratchpad/model_executor/speculative/spec_info.py:4-24,
scheduler TARGET_VERIFY/DRAFT_EXTEND plumbing with draft_worker=None). This
is a working EAGLE-1-style implementation on the draft-runner framework:

- draft = ``fc`` [2H -> H] + ONE decoder layer sharing the target's
  embedding and lm_head; input at position i is
  ``fc(concat(embed(x_{i+1}), f_i))`` where f_i is the target's hidden
  state (post final norm) at position i.
- the draft keeps its own 1-layer paged KV mirroring the target's page
  geometry (same page tables, same radix lifetime).
- windows: the first step consumes the TRUE last feature; later steps feed
  the draft's own hidden back (the EAGLE autoregressive trick). After
  verification the accepted span is re-extended with TRUE features from the
  verify pass, so the persistent draft KV never contains pseudo-feature
  rows (EAGLE's stable_kv semantics).

v1 keeps all feature hand-off on the host (small [*, H] arrays per round);
a device-resident feature cache is the follow-up optimization.
"""

from __future__ import annotations

import copy
import dataclasses
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from scratchpad_tpu.config import ModelConfig, ServerArgs
from scratchpad_tpu.executor.forward_meta import ForwardMeta, ForwardMode
from scratchpad_tpu.memory.kv_cache import KVCacheConfig, create_kv_cache
from scratchpad_tpu.models.llama import LlamaForCausalLM
from scratchpad_tpu.utils import get_logger

logger = get_logger("eagle")


class EagleRunner:
    """Owns the EAGLE head params + 1-layer KV pool + jitted steps."""

    def __init__(self, target_runner, args: ServerArgs):
        self.target = target_runner
        self.args = args
        cfg: ModelConfig = target_runner.model_config
        ecfg = copy.copy(cfg)
        ecfg.num_hidden_layers = 1
        self.model = LlamaForCausalLM(ecfg)
        self.model.page_size = target_runner.page_size
        self.cfg = ecfg
        dt = target_runner._dtype()

        if args.speculative_draft_model_path:
            from scratchpad_tpu.executor.weight_loader import load_hf_state

            state = load_hf_state(args.speculative_draft_model_path)
            self.params = self.convert_hf_state(state, dt)
        else:
            rng = jax.random.PRNGKey(args.random_seed + 7)
            base = self.model.init_params(rng, dt)
            H = cfg.hidden_size
            fc = (
                jax.random.normal(jax.random.fold_in(rng, 9), (2 * H, H))
                / np.sqrt(2 * H)
            ).astype(dt)
            self.params = {"layers": base["layers"], "fc": fc, "fc_b": None}

        kvc = dataclasses.replace(
            target_runner.kv_config,
            num_layers=1,
            quantized=False,
            quant_dtype=jnp.int8,
            dtype=dt,
            cross_layers=0,
        )
        self.kv_config = kvc
        self.kv_cache = create_kv_cache(kvc)
        self._jits: dict = {}

    def convert_hf_state(self, state, dtype):
        """Import a trained EAGLE-1 head: fc.weight + layers.0.* (llama
        naming, no final norm)."""
        fc = fc_b = None
        lang = {}
        for name, w in state.items():
            if name in ("fc.weight", "model.fc.weight"):
                fc = w.T
            elif name in ("fc.bias", "model.fc.bias"):
                fc_b = w
            elif ".layers." in name or name.startswith("layers."):
                lang["model.layers." + name.split("layers.", 1)[1]] = w
            elif name.endswith("embed_tokens.weight") or name.endswith(
                "lm_head.weight"
            ):
                pass  # shared with the target
        lang["model.embed_tokens.weight"] = np.zeros(
            (self.cfg.vocab_size, self.cfg.hidden_size), np.float32
        )
        lang["model.norm.weight"] = np.ones(self.cfg.hidden_size, np.float32)
        params = self.model.convert_hf_state(lang, dtype)
        assert fc is not None, "EAGLE checkpoint missing fc.weight"
        return {
            "layers": params["layers"],
            "fc": jnp.asarray(fc, dtype),
            "fc_b": jnp.asarray(fc_b, dtype) if fc_b is not None else None,
        }

    # ------------------------------------------------------------- internals

    def _embed_head(self):
        tp = self.target.params
        embed = tp["embed"]
        if "lm_head" not in tp and not (
            self.target.model_config.tie_word_embeddings
        ):
            raise ValueError(
                "eagle needs the bf16 LM head; disable quantize_lm_head"
            )
        head = (
            embed
            if self.target.model_config.tie_word_embeddings
            else tp["lm_head"]
        )
        return embed, head

    def _fuse(self, params, emb, feats):
        x = jnp.concatenate([emb, feats.astype(emb.dtype)], axis=-1)
        y = x @ params["fc"]
        if params.get("fc_b") is not None:
            y = y + params["fc_b"]
        return y

    # -------------------------------------------------------------- kv write

    def write_pairs(self, wb_like: dict) -> None:
        """KV-only extend of TRUE pairs (x_{i+1}, f_i) at positions i.

        ``wb_like``: tokens_next [M], positions [M], out_cache_loc [M],
        req_indices [M], feats [M, H] np; page_table/seq_lens/extend_lens
        batch arrays. Static-shaped by padding to the target's buckets.
        """
        if "pairs" not in self._jits:

            def _impl(eparams, embed, kv, meta, feats):
                emb = jnp.take(embed, meta.tokens, axis=0)
                x = self._fuse(eparams, emb, feats)
                _, kv = self.model.layers_forward(
                    {}, eparams["layers"], jnp.zeros(1, jnp.int32), x, kv, meta
                )
                return kv

            self._jits["pairs"] = jax.jit(_impl, donate_argnums=(2,))
        embed, _ = self._embed_head()
        meta, feats = self._pad_pairs(wb_like)
        self.kv_cache = self._jits["pairs"](
            self.params, embed, self.kv_cache, meta, feats
        )

    def _pad_pairs(self, w: dict):
        from scratchpad_tpu.executor.model_runner import _next_bucket, _pow2_bucket

        T_real = len(w["tokens"])
        B_real = len(w["seq_lens"])
        T = _next_bucket(self.args.prefill_token_buckets, T_real)
        B = _pow2_bucket(B_real, 1, max(self.args.max_running_requests, 1))
        P_real = w["page_table"].shape[1]
        P = _pow2_bucket(max(P_real, 1), 4, self.target.max_pages_per_req)

        def pad1(x, n, fill=0):
            out = np.full(n, fill, np.int32)
            out[: len(x)] = x
            return out

        pt = np.zeros((B, P), np.int32)
        pt[:B_real, : min(P_real, P)] = w["page_table"][:, :P]
        H = w["feats"].shape[1]
        feats = np.zeros((T, H), np.float32)
        feats[:T_real] = w["feats"]
        meta = ForwardMeta(
            mode=ForwardMode.EXTEND,
            tokens=pad1(w["tokens"], T),
            positions=pad1(w["positions"], T),
            out_cache_loc=pad1(w["out_cache_loc"], T),
            req_indices=pad1(w["req_indices"], T, fill=B - 1),
            page_table=pt,
            seq_lens=pad1(w["seq_lens"], B),
            extend_lens=pad1(w["extend_lens"], B),
            last_token_idx=np.zeros(B, np.int32),
        )
        return meta, feats

    # --------------------------------------------------------------- window

    def propose(
        self,
        first_tokens: np.ndarray,  # [B] last accepted token per request
        first_feats: np.ndarray,  # [B, H] its TRUE feature
        positions: np.ndarray,  # [B] target position of that token (= c)
        page_table: np.ndarray,  # [B, P]
        k: int,
    ) -> np.ndarray:
        """k fused draft steps; returns greedy drafts [k, B].

        Step j consumes the pair at draft position c-1+j; step 1 uses the
        true feature, later steps the draft's own hidden."""
        key = ("win", k)
        if key not in self._jits:

            def _impl(eparams, embed, head, kv, tokens, feats, pos, pt):
                B = tokens.shape[0]
                ps = self.model.page_size

                def body(carry, _):
                    kv, t, f, p = carry
                    dpos = p - 1  # draft pair position
                    loc = pt[jnp.arange(B), dpos // ps] * ps + dpos % ps
                    meta = ForwardMeta(
                        mode=ForwardMode.DECODE,
                        tokens=t,
                        positions=dpos,
                        out_cache_loc=loc,
                        req_indices=jnp.arange(B, dtype=jnp.int32),
                        page_table=pt,
                        seq_lens=dpos + 1,
                        extend_lens=jnp.ones(B, jnp.int32),
                        last_token_idx=jnp.arange(B, dtype=jnp.int32),
                    )
                    emb = jnp.take(embed, t, axis=0)
                    x = self._fuse(eparams, emb, f)
                    h, kv = self.model.layers_forward(
                        {}, eparams["layers"], jnp.zeros(1, jnp.int32),
                        x, kv, meta,
                    )
                    logits = (h @ head.T).astype(jnp.float32)
                    d = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                    return (kv, d, h, p + 1), d

                (kv, _, _, _), drafts = jax.lax.scan(
                    body, (kv, tokens, feats, pos), None, length=k
                )
                return kv, drafts  # [k, B]

            self._jits[key] = jax.jit(_impl, donate_argnums=(3,))
        embed, head = self._embed_head()
        B_real = len(first_tokens)
        from scratchpad_tpu.executor.model_runner import _next_bucket, _pow2_bucket

        B = _next_bucket(self.args.decode_bs_buckets, B_real)
        P = _pow2_bucket(
            max(page_table.shape[1], 1), 4, self.target.max_pages_per_req
        )

        def padB(x, fill=0):
            out = np.full((B,) + x.shape[1:], fill, x.dtype)
            out[:B_real] = x
            return out

        pt = np.zeros((B, P), np.int32)
        pt[:B_real, : min(page_table.shape[1], P)] = page_table[:, :P]
        self.kv_cache, drafts = self._jits[key](
            self.params,
            embed,
            head,
            self.kv_cache,
            padB(first_tokens.astype(np.int32)),
            padB(first_feats.astype(np.float32)),
            padB(positions.astype(np.int32), fill=1),
            pt,
        )
        return np.asarray(drafts)[:, :B_real]
