"""Checkpoint / resume of GBP runs via orbax.

The reference has no checkpointing (SURVEY.md §5 'Checkpoint: none'); for
long-running / distributed solves the entire algorithm state is the SoA
pytree (beliefs, messages, linearization points, relinearization counters) —
exactly `GBPState` — so checkpointing is a single orbax save of that pytree.
The graph itself (topology, measurements, priors) is input data, rebuilt
from the problem file; save it alongside for self-contained resumes (prior
weakening mutates priors), and put the schedule position (sweep index,
weakenings applied) in `extras` so a resume continues the prior-annealing
schedule exactly where it left off.
"""
from __future__ import annotations

import os

import jax.numpy as jnp
import orbax.checkpoint as ocp


def save(path, state, graph=None, extras: dict | None = None) -> None:
    """Save a GBPState, optionally the Graph pytree, and optionally an
    `extras` dict of scalars/arrays (e.g. {"sweep": i, "weakened": k} — the
    prior-weakening schedule position) to `path`."""
    item = {"state": state}
    if graph is not None:
        item["graph"] = graph
    if extras is not None:
        item["extras"] = {k: jnp.asarray(v) for k, v in extras.items()}
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), item, force=True)


def restore(path, state_template, graph_template=None,
            extras_template: dict | None = None):
    """Restore a checkpoint saved by `save`.

    state_template / graph_template supply the pytree structure and static
    metadata (factor types, wiring); array leaves are loaded from disk.
    Returns state, (state, graph), (state, extras), or
    (state, graph, extras) depending on which templates are given."""
    item = {"state": state_template}
    if graph_template is not None:
        item["graph"] = graph_template
    if extras_template is not None:
        item["extras"] = {k: jnp.asarray(v)
                          for k, v in extras_template.items()}
    with ocp.StandardCheckpointer() as ckptr:
        out = ckptr.restore(os.path.abspath(path), item)
    ret = [out["state"]]
    if graph_template is not None:
        ret.append(out["graph"])
    if extras_template is not None:
        ret.append(out["extras"])
    return ret[0] if len(ret) == 1 else tuple(ret)
