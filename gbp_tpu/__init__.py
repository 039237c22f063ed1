"""gbp-tpu: TPU-native Gaussian Belief Propagation for SLAM / SfM.

Public surface (see README.md / docs/PARITY.md for the full map):

    from gbp_tpu import GraphBuilder, GBPConfig, init_state, run, sweep
    from gbp_tpu.core import oracle, schedules, sweep_cm   # CM fast path
    from gbp_tpu.models import ba, pose_graph, toy, online # + streaming BA
    from gbp_tpu.parallel import halo, halo_cm, multihost  # scaling paths
    from gbp_tpu.parallel import sharding, spmd, schur
    from gbp_tpu.io import bal, g2o
    from gbp_tpu.frontend import features, pipeline, init_pose
"""
from gbp_tpu.core.graph import FactorBlock, Graph, GraphBuilder, VariableBlock
from gbp_tpu.core.sweep import (
    GBPConfig,
    GBPState,
    energy,
    init_state,
    run,
    sweep,
    update_beliefs,
)
from gbp_tpu.gaussians import Gaussian

__all__ = [
    "FactorBlock",
    "GBPConfig",
    "GBPState",
    "Gaussian",
    "Graph",
    "GraphBuilder",
    "VariableBlock",
    "energy",
    "init_state",
    "run",
    "sweep",
    "update_beliefs",
]
__version__ = "0.1.0"
