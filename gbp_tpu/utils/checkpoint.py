"""Checkpoint / resume of GBP runs via orbax.

The reference has no checkpointing (SURVEY.md §5 'Checkpoint: none'); for
long-running / distributed solves the entire algorithm state is the SoA
pytree (beliefs, messages, linearization points, relinearization counters) —
exactly `GBPState` — so checkpointing is a single orbax save of that pytree.
The graph itself (topology, measurements, priors) is input data, rebuilt from
the problem file; optionally save it alongside for self-contained resumes
(prior weakening mutates priors, so resuming mid-schedule needs it).
"""
from __future__ import annotations

import os

import orbax.checkpoint as ocp


def save(path, state, graph=None) -> None:
    """Save a GBPState (and optionally the Graph pytree) to `path`."""
    with ocp.StandardCheckpointer() as ckptr:
        item = {"state": state} if graph is None else {"state": state, "graph": graph}
        ckptr.save(os.path.abspath(path), item, force=True)


def restore(path, state_template, graph_template=None):
    """Restore a checkpoint saved by `save`.

    state_template / graph_template supply the pytree structure and static
    metadata (factor types, wiring); array leaves are loaded from disk.
    Returns state, or (state, graph) when graph_template is given.
    """
    item = {"state": state_template}
    if graph_template is not None:
        item["graph"] = graph_template
    with ocp.StandardCheckpointer() as ckptr:
        out = ckptr.restore(os.path.abspath(path), item)
    if graph_template is not None:
        return out["state"], out["graph"]
    return out["state"]
