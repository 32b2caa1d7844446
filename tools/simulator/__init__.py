from tools.simulator.core import (
    ClusterSimulator,
    EngineSim,
    HARDWARE_PARAMS,
    SimConfig,
    SimRequest,
    gen_synthetic_workload,
)

__all__ = [
    "ClusterSimulator",
    "EngineSim",
    "HARDWARE_PARAMS",
    "SimConfig",
    "SimRequest",
    "gen_synthetic_workload",
]
