"""Pipeline-parallel engine correctness on the virtual CPU mesh.

The reference builds PP groups but never executes a pipelined forward
(reference: scratchpad/distributed/parallel_state.py:984-999); here PP is a
real execution mode (parallel/pp.py), so these tests assert bit-equal
greedy outputs against the single-device engine.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow
import jax
from jax.sharding import Mesh

from scratchpad_tpu.config import ServerArgs
from scratchpad_tpu.sampling.sampling_params import SamplingParams
from scratchpad_tpu.server.engine import Engine


def make_engine(mesh=None, **kw):
    args = ServerArgs(
        preset="tiny-debug",
        random_weights=True,
        dtype="float32",
        page_size=4,
        max_total_tokens=2048,
        **kw,
    )
    return Engine(args, mesh=mesh)


def pp_mesh(pp):
    devs = jax.devices()
    if len(devs) < pp:
        pytest.skip(f"needs {pp} devices")
    return Mesh(np.array(devs[:pp]), ("pp",))


def prompts():
    rng = np.random.default_rng(0)
    return [rng.integers(1, 500, n).tolist() for n in (9, 25, 14)]


class TestPipelineParallel:
    def test_pp2_matches_single_device(self):
        sp = SamplingParams(temperature=0.0, max_new_tokens=6)
        ref = [
            o.output_ids
            for o in make_engine().generate(
                input_ids=prompts(), sampling_params=[sp] * 3
            )
        ]
        eng = make_engine(mesh=pp_mesh(2), enable_pp=True)
        got = [
            o.output_ids
            for o in eng.generate(input_ids=prompts(), sampling_params=[sp] * 3)
        ]
        assert got == ref
        eng.scheduler.check_memory_leak()

    def test_pp2_microbatched_decode_matches(self):
        """2 stages with 2 decode microbatches (row-split pipeline)."""
        sp = SamplingParams(temperature=0.0, max_new_tokens=5)
        ref = [
            o.output_ids
            for o in make_engine().generate(
                input_ids=prompts(), sampling_params=[sp] * 3
            )
        ]
        eng = make_engine(mesh=pp_mesh(2), enable_pp=True, pp_microbatches=2)
        got = [
            o.output_ids
            for o in eng.generate(input_ids=prompts(), sampling_params=[sp] * 3)
        ]
        assert got == ref
        eng.scheduler.check_memory_leak()

    def test_pp_rejects_unsupported_mesh(self):
        devs = jax.devices()
        if len(devs) < 4:
            pytest.skip("needs 4 devices")
        mesh = Mesh(np.array(devs[:4]).reshape(2, 2), ("pp", "dp"))
        with pytest.raises(ValueError, match="pp-only or pp x tp"):
            make_engine(mesh=mesh, enable_pp=True)

    def test_pp_size_builds_mesh(self):
        """--pp-size builds the mesh and implies enable_pp (no explicit
        mesh handed to Engine — the CLI serving path)."""
        if len(jax.devices()) < 2:
            pytest.skip("needs 2 devices")
        sp = SamplingParams(temperature=0.0, max_new_tokens=4)
        ref = [
            o.output_ids
            for o in make_engine().generate(
                input_ids=prompts(), sampling_params=[sp] * 3
            )
        ]
        eng = make_engine(pp_size=2)
        assert eng.scheduler.runner.pp_size == 2
        got = [
            o.output_ids
            for o in eng.generate(input_ids=prompts(), sampling_params=[sp] * 3)
        ]
        assert got == ref

    def test_pp2_tp2_matches_single_device(self):
        """pp x tp composed mesh: layers shard over pp (manual shard_map
        axis), weights keep their tp axes (GSPMD-auto inside the pipeline
        ticks)."""
        devs = jax.devices()
        if len(devs) < 4:
            pytest.skip("needs 4 devices")
        sp = SamplingParams(temperature=0.0, max_new_tokens=6)
        ref = [
            o.output_ids
            for o in make_engine().generate(
                input_ids=prompts(), sampling_params=[sp] * 3
            )
        ]
        mesh = Mesh(np.array(devs[:4]).reshape(2, 2), ("pp", "tp"))
        eng = make_engine(mesh=mesh, enable_pp=True)
        got = [
            o.output_ids
            for o in eng.generate(input_ids=prompts(), sampling_params=[sp] * 3)
        ]
        assert got == ref
        eng.scheduler.check_memory_leak()
