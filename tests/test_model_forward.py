import numpy as np
import pytest

pytestmark = pytest.mark.slow

from scratchpad_tpu.config import ServerArgs
from scratchpad_tpu.config.model_config import ModelConfig, get_preset
from scratchpad_tpu.executor.model_runner import ModelRunner

from tests.utils import greedy_generate

TINY = dict(preset="tiny-debug")


@pytest.fixture(scope="module")
def runner():
    cfg = get_preset("tiny-debug")
    args = ServerArgs(
        random_weights=True, max_total_tokens=4096, page_size=4, dtype="float32"
    )
    return ModelRunner(cfg, args)


def test_chunked_prefill_matches_full(runner):
    """Splitting prefill into chunks must not change the generation."""
    rng = np.random.default_rng(0)
    prompt = rng.integers(1, 400, 21).tolist()
    full = greedy_generate(runner, prompt, 8)
    runner.page_allocator.clear()
    runner.page_allocator.alloc(1)  # re-reserve dump page
    chunked = greedy_generate(runner, prompt, 8, chunk=5)
    runner.page_allocator.clear()
    runner.page_allocator.alloc(1)
    assert full == chunked


def test_generation_deterministic(runner):
    prompt = list(range(1, 15))
    a = greedy_generate(runner, prompt, 6)
    runner.page_allocator.clear()
    runner.page_allocator.alloc(1)
    b = greedy_generate(runner, prompt, 6)
    runner.page_allocator.clear()
    runner.page_allocator.alloc(1)
    assert a == b


class TestHFParity:
    """Bit-level parity with HuggingFace torch Llama on identical weights
    (the reference's core e2e test strategy, tests/e2e/test_engine.py)."""

    @pytest.fixture(scope="class")
    def tiny_pair(self, tmp_path_factory):
        torch = pytest.importorskip("torch")
        from transformers import LlamaConfig, LlamaForCausalLM

        hf_cfg = LlamaConfig(
            vocab_size=512,
            hidden_size=128,
            intermediate_size=256,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=2,
            head_dim=32,
            max_position_embeddings=1024,
            rms_norm_eps=1e-5,
            rope_theta=10000.0,
            tie_word_embeddings=False,
            attention_bias=False,
            mlp_bias=False,
        )
        torch.manual_seed(0)
        hf_model = LlamaForCausalLM(hf_cfg).eval().to(torch.float32)
        state = {
            k: v.numpy() for k, v in hf_model.state_dict().items()
        }
        cfg = ModelConfig(
            architecture="LlamaForCausalLM",
            vocab_size=512,
            hidden_size=128,
            intermediate_size=256,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=2,
            head_dim=32,
            max_position_embeddings=1024,
            rope_theta=10000.0,
            tie_word_embeddings=False,
        )
        args = ServerArgs(max_total_tokens=4096, page_size=4, dtype="float32")
        runner = ModelRunner.__new__(ModelRunner)
        # build runner with converted params
        model_params = None
        from scratchpad_tpu.models.llama import LlamaForCausalLM as OurLlama

        params = OurLlama(cfg).convert_hf_state(state, dtype="float32")
        runner = ModelRunner(cfg, args, params=params)
        return runner, hf_model

    def test_greedy_parity(self, tiny_pair):
        torch = pytest.importorskip("torch")
        runner, hf_model = tiny_pair
        rng = np.random.default_rng(1)
        for plen in (5, 17):
            prompt = rng.integers(1, 500, plen).tolist()
            ours = greedy_generate(runner, prompt, 10)
            runner.page_allocator.clear()
            runner.page_allocator.alloc(1)
            with torch.no_grad():
                hf_out = hf_model.generate(
                    torch.tensor([prompt]),
                    max_new_tokens=10,
                    do_sample=False,
                    temperature=None,
                    top_p=None,
                    top_k=None,
                )
            theirs = hf_out[0, plen:].tolist()
            assert ours == theirs, f"plen={plen}: {ours} vs {theirs}"

    def test_logits_close(self, tiny_pair):
        torch = pytest.importorskip("torch")
        runner, hf_model = tiny_pair
        prompt = list(range(1, 12))
        from tests.utils import SimpleSession

        import jax.numpy as jnp
        from scratchpad_tpu.executor.forward_meta import ForwardMode
        from scratchpad_tpu.executor.model_runner import WorkerBatch
        from tests.utils import greedy_sinfo

        s = SimpleSession(runner)
        n = len(prompt)
        s._ensure_pages(n)
        wb = WorkerBatch(
            mode=ForwardMode.EXTEND,
            tokens=np.asarray(prompt, np.int32),
            positions=np.arange(n, dtype=np.int32),
            out_cache_loc=s._slots(0, n),
            req_indices=np.zeros(n, np.int32),
            page_table=s.pages[None, :].astype(np.int32),
            seq_lens=np.array([n], np.int32),
            extend_lens=np.array([n], np.int32),
            sampling_info=greedy_sinfo(1, 512),
        )
        meta, sinfo = runner._pad_to_buckets(wb)
        _, logits = runner.model(runner.params, runner.kv_cache, meta)
        ours = np.asarray(logits)[0]
        runner.page_allocator.clear()
        runner.page_allocator.alloc(1)
        with torch.no_grad():
            hf_logits = hf_model(torch.tensor([prompt])).logits[0, -1].numpy()
        np.testing.assert_allclose(ours, hf_logits, rtol=2e-4, atol=2e-4)
