"""Message schedules: synchronous, wildfire, and priority (top-k) sweeps.

The reference implements only the synchronous schedule (joeaortiz/gbp
`Graph.synchronous_iteration`, SURVEY.md C4); wildfire/priority schedules are
part of the north-star spec [BASELINE.json: "synchronous/wildfire sweep
schedules"] and are described in arXiv:1910.14139 §5.2 ("wildfire" — a node
broadcasts only when its belief changed enough) and arXiv:2107.02308 §3.5
(GBP converges under arbitrary/partial schedules).

TPU-native form: a schedule is a per-sweep boolean `active` mask per factor
block, fed to `sweep(..., active=...)` — inactive factors keep their previous
messages and skip relinearization, so a masked sweep does the same batched
work with `where`-selects (no gather/compaction: data-dependent shapes would
defeat XLA; the FLOPs saved by compaction are tiny next to the memory traffic
either way, the win is message *staleness control* and convergence behavior).

Scores: a factor's urgency is how far its adjacent beliefs have moved since it
last sent messages, measured at the current belief means vs the means it last
broadcast from (`last_x`).  This is exactly the wildfire criterion of
1910.14139 applied per-factor.
"""
from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

from gbp_tpu.core.graph import Graph
from gbp_tpu.core.sweep import (
    GBPConfig,
    GBPState,
    f32_exact,
    gather_linpoint,
    sweep,
)


class ScheduleState(flax.struct.PyTreeNode):
    """Per-factor bookkeeping: the adjacent means each factor last fired from."""

    last_x: tuple  # per fblock [m, tdof]


def init_schedule(graph: Graph, state: GBPState) -> ScheduleState:
    """Start with infinite urgency so every factor fires on the first sweep
    (otherwise beliefs == priors, scores == 0, and nothing would ever fire)."""
    return ScheduleState(
        last_x=tuple(
            jnp.full_like(state.f[fi].linpoint, jnp.inf)
            for fi in range(len(graph.fblocks))
        )
    )


def scores(graph: Graph, state: GBPState, sched: ScheduleState) -> tuple:
    """Per-fblock [m] urgency: |current adjacent means - means at last fire|."""
    out = []
    for fi in range(len(graph.fblocks)):
        x = gather_linpoint(graph, state, fi)
        out.append(jnp.linalg.norm(x - sched.last_x[fi], axis=-1))
    return tuple(out)


def wildfire_masks(graph: Graph, state: GBPState, sched: ScheduleState,
                   tau: float) -> tuple:
    """active[fi] = score > tau.  tau <= 0 reduces to the synchronous schedule."""
    return tuple(s > tau for s in scores(graph, state, sched))


def priority_masks(graph: Graph, state: GBPState, sched: ScheduleState,
                   frac: float) -> tuple:
    """Top-`frac` of factors by urgency per block (at least 1 per block).

    `frac` must be a static (Python) float under jit: the top-k size is a
    shape-like quantity (mark it static_argnums when jitting callers)."""
    masks = []
    for fb, s in zip(graph.fblocks, scores(graph, state, sched)):
        m = s.shape[0]
        # Budget on REAL factors only: ELL/partition layouts pad blocks with
        # invalid clone rows whose adjacent means move like their group's —
        # counting them would both shrink the effective fraction and let
        # clones crowd real factors out of the top-k.
        n_real = fb.n_valid if fb.n_valid is not None else m
        if fb.valid is not None:
            s = jnp.where(fb.valid, s, -jnp.inf)
        k = max(1, min(int(frac * n_real), m))
        thresh = jax.lax.top_k(s, k)[0][-1]
        masks.append(s >= thresh)
    return tuple(masks)


def _advance(sched: ScheduleState, graph: Graph, state: GBPState,
             active: tuple) -> ScheduleState:
    """Record fire points: last_x <- current means where the factor fired."""
    new_last = []
    for fi in range(len(graph.fblocks)):
        x = gather_linpoint(graph, state, fi)
        new_last.append(jnp.where(active[fi][:, None], x, sched.last_x[fi]))
    return ScheduleState(last_x=tuple(new_last))


@f32_exact
def wildfire_sweep(graph: Graph, state: GBPState, sched: ScheduleState,
                   cfg: GBPConfig, tau: float):
    """One wildfire iteration; returns (state, sched)."""
    active = wildfire_masks(graph, state, sched, tau)
    sched = _advance(sched, graph, state, active)
    return sweep(graph, state, cfg, active=active), sched


@f32_exact
def priority_sweep(graph: Graph, state: GBPState, sched: ScheduleState,
                   cfg: GBPConfig, frac: float):
    """One top-k priority iteration; returns (state, sched)."""
    active = priority_masks(graph, state, sched, frac)
    sched = _advance(sched, graph, state, active)
    return sweep(graph, state, cfg, active=active), sched


@f32_exact
def run_wildfire(graph: Graph, state: GBPState, cfg: GBPConfig,
                 n_iters: int, tau: float):
    """n_iters wildfire sweeps in one compiled fori_loop; returns state."""
    sched = init_schedule(graph, state)

    def body(_, carry):
        s, sc = carry
        return wildfire_sweep(graph, s, sc, cfg, tau)

    state, _ = jax.lax.fori_loop(0, n_iters, body, (state, sched))
    return state


@f32_exact
def run_priority(graph: Graph, state: GBPState, cfg: GBPConfig,
                 n_iters: int, frac: float):
    """n_iters priority sweeps in one compiled fori_loop; returns state."""
    sched = init_schedule(graph, state)

    def body(_, carry):
        s, sc = carry
        return priority_sweep(graph, s, sc, cfg, frac)

    state, _ = jax.lax.fori_loop(0, n_iters, body, (state, sched))
    return state


def random_masks(graph: Graph, key, keep_prob: float) -> tuple:
    """Independent Bernoulli(keep_prob) activity per factor (the message-loss
    / node-failure robustness setting of arXiv:2107.02308 §3.5)."""
    keys = jax.random.split(key, len(graph.fblocks))
    return tuple(
        jax.random.bernoulli(k, keep_prob, (fb.count,))
        for k, fb in zip(keys, graph.fblocks)
    )


@f32_exact
def run_random(graph: Graph, state: GBPState, cfg: GBPConfig,
               n_iters: int, keep_prob: float, key):
    """n_iters sweeps with random factor dropout in one compiled loop.

    GBP converges under lossy/partial schedules (2107.02308 §3.5); this is
    both a robustness test harness and the model for tolerating dropped halo
    exchanges in distributed runs (SURVEY.md §5 'failure detection')."""

    def body(i, s):
        masks = random_masks(graph, jax.random.fold_in(key, i), keep_prob)
        return sweep(graph, s, cfg, active=masks)

    return jax.lax.fori_loop(0, n_iters, body, state)


# --------------------------------------------------------------------------
# Component-major fast-path variants (VERDICT r2 item 5): the same wildfire /
# priority / random schedules driving core/sweep_cm.py.  The schedule mask is
# computed in CM layout (free ELL broadcast + one tiny mean-table take —
# sweep_cm.expand_means) and composed with the validity mask inside
# sweep_cm.sweep, whose kernels already honor `act` per factor.
# --------------------------------------------------------------------------


class CMScheduleState(flax.struct.PyTreeNode):
    """CM-layout bookkeeping: adjacent means each factor last fired from."""

    last_x: jnp.ndarray  # [tdof, T, LANE]


def init_schedule_cm(cmg, state) -> CMScheduleState:
    from gbp_tpu.core import sweep_cm

    x = sweep_cm.expand_means(cmg, state)
    return CMScheduleState(last_x=jnp.full_like(x, jnp.inf))


def _scores_cm(cmg, state, sched):
    """Urgency [T, LANE] plus the current means (reused for _advance)."""
    from gbp_tpu.core import sweep_cm

    x = sweep_cm.expand_means(cmg, state)
    d = x - sched.last_x
    return jnp.sqrt(jnp.sum(d * d, axis=0)), x


@f32_exact
def wildfire_sweep_cm(cmg, state, sched: CMScheduleState, cfg: GBPConfig,
                      tau: float):
    """One wildfire iteration on the CM fast path; returns (state, sched)."""
    from gbp_tpu.core import sweep_cm

    s, x = _scores_cm(cmg, state, sched)
    active = (s > tau)[None]
    sched = CMScheduleState(last_x=jnp.where(active, x, sched.last_x))
    return sweep_cm.sweep(cmg, state, cfg, active=active), sched


@f32_exact
def priority_sweep_cm(cmg, state, sched: CMScheduleState, cfg: GBPConfig,
                      frac: float):
    """One top-k priority iteration on the CM fast path (static `frac`)."""
    from gbp_tpu.core import sweep_cm

    s, x = _scores_cm(cmg, state, sched)
    fb = cmg.fb
    n_real = fb.n_valid if fb.n_valid is not None else fb.count
    s = jnp.where(cmg.act[0] > 0.5, s, -jnp.inf)
    k = max(1, min(int(frac * n_real), cmg.mp))
    thresh = jax.lax.top_k(s.reshape(-1), k)[0][-1]
    active = (s >= thresh)[None]
    sched = CMScheduleState(last_x=jnp.where(active, x, sched.last_x))
    return sweep_cm.sweep(cmg, state, cfg, active=active), sched


@f32_exact
def run_wildfire_cm(cmg, state, cfg: GBPConfig, n_iters: int, tau: float):
    sched = init_schedule_cm(cmg, state)

    def body(_, carry):
        s, sc = carry
        return wildfire_sweep_cm(cmg, s, sc, cfg, tau)

    state, _ = jax.lax.fori_loop(0, n_iters, body, (state, sched))
    return state


@f32_exact
def run_priority_cm(cmg, state, cfg: GBPConfig, n_iters: int, frac: float):
    sched = init_schedule_cm(cmg, state)

    def body(_, carry):
        s, sc = carry
        return priority_sweep_cm(cmg, s, sc, cfg, frac)

    state, _ = jax.lax.fori_loop(0, n_iters, body, (state, sched))
    return state


@f32_exact
def run_random_cm(cmg, state, cfg: GBPConfig, n_iters: int, keep_prob: float,
                  key):
    """Random factor dropout on the CM fast path (message-loss robustness,
    arXiv:2107.02308 §3.5)."""
    from gbp_tpu.core import sweep_cm

    def body(i, s):
        mask = jax.random.bernoulli(
            jax.random.fold_in(key, i), keep_prob,
            (1,) + cmg.act.shape[1:])
        return sweep_cm.sweep(cmg, s, cfg, active=mask)

    return jax.lax.fori_loop(0, n_iters, body, state)
