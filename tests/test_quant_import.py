"""AWQ/GPTQ checkpoint import: pack/unpack round trips and bit-exact
conversion into the engine's nibble-plane QuantizedLinear format."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow
import jax.numpy as jnp

from scratchpad_tpu.ops.quant.import_hf import (
    convert_quantized_layers,
    pack_awq,
    pack_gptq,
    split_quant_tensors,
    unpack_awq,
    unpack_gptq,
)
from scratchpad_tpu.ops.quant.w4a16 import dequantize_w4, slice_layer


def rand_q(rng, In, Out, gs):
    G = In // gs
    q = rng.integers(0, 16, (In, Out)).astype(np.uint8)
    z = rng.integers(1, 15, (G, Out)).astype(np.float32)
    s = rng.uniform(0.01, 0.1, (G, Out)).astype(np.float32)
    return q, z, s


class TestRoundTrip:
    def test_awq(self):
        rng = np.random.default_rng(0)
        q, z, s = rand_q(rng, 64, 32, 16)
        q2, z2, s2 = unpack_awq(*pack_awq(q, z, s))
        np.testing.assert_array_equal(q2, q)
        np.testing.assert_array_equal(z2, z)
        np.testing.assert_array_equal(s2, s)

    @pytest.mark.parametrize("v2", [False, True])
    def test_gptq(self, v2):
        rng = np.random.default_rng(1)
        q, z, s = rand_q(rng, 64, 32, 16)
        qw, qz, sc = pack_gptq(q, z, s, v2=v2)
        q2, z2, s2 = unpack_gptq(qw, qz, sc, v2=v2)
        np.testing.assert_array_equal(q2, q)
        np.testing.assert_array_equal(z2, z)
        np.testing.assert_array_equal(s2, s)

    def test_gptq_act_order_rejected(self):
        rng = np.random.default_rng(2)
        q, z, s = rand_q(rng, 64, 32, 16)
        qw, qz, sc = pack_gptq(q, z, s)
        g_idx = np.argsort(rng.random(64)) // 16  # shuffled group map
        with pytest.raises(NotImplementedError):
            unpack_gptq(qw, qz, sc, g_idx=g_idx)

    def test_gptq_trivial_g_idx_ok(self):
        rng = np.random.default_rng(3)
        q, z, s = rand_q(rng, 64, 32, 16)
        qw, qz, sc = pack_gptq(q, z, s)
        g_idx = np.arange(64) // 16
        q2, _, _ = unpack_gptq(qw, qz, sc, g_idx=g_idx)
        np.testing.assert_array_equal(q2, q)


class TestCheckpointConversion:
    def make_state(self, rng, L=2, In=64, Out=32, gs=8, method="awq"):
        """A synthetic flat HF state dict with quantized attention/MLP."""
        state = {}
        truth = {}
        mods = {
            "self_attn.q_proj": (In, Out),
            "self_attn.k_proj": (In, Out),
            "self_attn.v_proj": (In, Out),
            "self_attn.o_proj": (Out, In),
            "mlp.gate_proj": (In, Out),
            "mlp.up_proj": (In, Out),
            "mlp.down_proj": (Out, In),
        }
        for li in range(L):
            for sub, (i, o) in mods.items():
                q, z, s = rand_q(rng, i, o, gs)
                truth[(li, sub)] = (q, z, s)
                pre = f"model.layers.{li}.{sub}"
                if method == "awq":
                    qw, qz, sc = pack_awq(q, z, s)
                else:
                    qw, qz, sc = pack_gptq(q, z, s)
                state[f"{pre}.qweight"] = qw
                state[f"{pre}.qzeros"] = qz
                state[f"{pre}.scales"] = sc
            state[f"model.layers.{li}.input_layernorm.weight"] = np.ones(In)
        state["model.embed_tokens.weight"] = np.zeros((10, In))
        return state, truth

    @pytest.mark.parametrize("method", ["awq", "gptq"])
    def test_convert_bit_exact(self, method):
        rng = np.random.default_rng(4)
        state, truth = self.make_state(rng, method=method)
        plain, quant = split_quant_tensors(state)
        assert "model.embed_tokens.weight" in plain
        assert all(k.endswith((".qweight", ".qzeros", ".scales")) for k in quant)
        layers_q = convert_quantized_layers(
            quant, 2, method, dtype=jnp.float32
        )
        assert set(layers_q) == {"wq", "wk", "wv", "wo", "gate", "up", "down"}
        name_map = {
            "wq": "self_attn.q_proj", "wk": "self_attn.k_proj",
            "wv": "self_attn.v_proj", "wo": "self_attn.o_proj",
            "gate": "mlp.gate_proj", "up": "mlp.up_proj",
            "down": "mlp.down_proj",
        }
        for tgt, ql in layers_q.items():
            for li in range(2):
                q, z, s = truth[(li, name_map[tgt])]
                In = q.shape[0]
                # dequantized import == (q - z) * s computed from the truth
                got = np.asarray(
                    dequantize_w4(slice_layer(ql, li), jnp.float32)
                )
                gs = ql.group_size
                want = (q.astype(np.float32) - np.repeat(z, gs, 0)) * np.repeat(
                    s, gs, 0
                )
                np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_engine_runs_on_imported_quant(self, tmp_path):
        """End-to-end: a tiny AWQ checkpoint on disk loads and serves."""
        from safetensors.numpy import save_file

        from scratchpad_tpu.config import ServerArgs
        from scratchpad_tpu.config.model_config import get_preset
        from scratchpad_tpu.sampling.sampling_params import SamplingParams
        from scratchpad_tpu.server.engine import Engine

        cfg = get_preset("tiny-debug")
        rng = np.random.default_rng(5)
        H, I = cfg.hidden_size, cfg.intermediate_size
        D = cfg.head_dim
        Hq, Hkv = cfg.num_attention_heads, cfg.num_kv_heads
        state = {}
        for li in range(cfg.num_hidden_layers):
            pre = f"model.layers.{li}"
            for sub, (i, o) in {
                "self_attn.q_proj": (H, Hq * D),
                "self_attn.k_proj": (H, Hkv * D),
                "self_attn.v_proj": (H, Hkv * D),
                "self_attn.o_proj": (Hq * D, H),
                "mlp.gate_proj": (H, I),
                "mlp.up_proj": (H, I),
                "mlp.down_proj": (I, H),
            }.items():
                q, z, s = rand_q(rng, i, o, min(16, i // 4))
                qw, qz, sc = pack_awq(q, z, s * 0.05)
                state[f"{pre}.{sub}.qweight"] = qw
                state[f"{pre}.{sub}.qzeros"] = qz
                state[f"{pre}.{sub}.scales"] = sc
            state[f"{pre}.input_layernorm.weight"] = np.ones(H, np.float32)
            state[f"{pre}.post_attention_layernorm.weight"] = np.ones(
                H, np.float32
            )
        state["model.embed_tokens.weight"] = rng.standard_normal(
            (cfg.vocab_size, H)
        ).astype(np.float32) * 0.05
        state["model.norm.weight"] = np.ones(H, np.float32)
        state["lm_head.weight"] = rng.standard_normal(
            (cfg.vocab_size, H)
        ).astype(np.float32) * 0.05
        save_file(state, str(tmp_path / "model.safetensors"))

        args = ServerArgs(
            preset="tiny-debug",
            model_path=str(tmp_path),
            quantization="awq",
            dtype="float32",
            page_size=4,
            max_total_tokens=1024,
        )
        class DummyTok:
            eos_token_id = 0
            chat_template = None

            def decode(self, ids, **kw):
                return " ".join(map(str, ids))

        eng = Engine(args, tokenizer=DummyTok())
        sp = SamplingParams(temperature=0.0, max_new_tokens=4)
        out = eng.generate(input_ids=[3, 5, 7, 9], sampling_params=sp)
        assert len(out.output_ids) == 4
        eng.scheduler.check_memory_leak()
