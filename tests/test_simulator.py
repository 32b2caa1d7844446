"""Cluster simulator sanity tests."""

import json
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.simulator.core import (
    ClusterSimulator,
    SimConfig,
    gen_synthetic_workload,
)


def test_single_engine_completes():
    sim = ClusterSimulator(SimConfig(), num_engines=1)
    reqs = gen_synthetic_workload(50, rate=20.0, seed=1)
    report = sim.run(reqs)
    assert report["completed"] == 50
    assert report["throughput_tok_s"] > 0
    assert report["ttft_mean_s"] > 0


def test_more_engines_help_under_load():
    reqs = lambda: gen_synthetic_workload(200, rate=50.0, seed=2)
    r1 = ClusterSimulator(SimConfig(), 1).run(reqs())
    r4 = ClusterSimulator(SimConfig(), 4).run(reqs())
    assert r4["makespan_s"] < r1["makespan_s"]
    assert r4["e2e_mean_s"] < r1["e2e_mean_s"]


def test_routing_policies_balance(tmp_path):
    for policy in ("random", "round-robin", "shortest"):
        sim = ClusterSimulator(SimConfig(), 3, policy)
        report = sim.run(gen_synthetic_workload(120, rate=100.0, seed=3))
        assert report["completed"] == 120
        loads = report["per_engine_decode_tokens"]
        assert min(loads) > 0, (policy, loads)
    trace = tmp_path / "trace.json"
    sim.write_chrome_trace(str(trace))
    data = json.loads(trace.read_text())
    assert len(data["traceEvents"]) > 0


def test_faster_hardware_faster():
    reqs = lambda: gen_synthetic_workload(100, rate=0.0, seed=4)
    v5e = ClusterSimulator(SimConfig(hardware="tpu-v5e"), 1).run(reqs())
    v5p = ClusterSimulator(SimConfig(hardware="tpu-v5p"), 1).run(reqs())
    assert v5p["makespan_s"] < v5e["makespan_s"]
