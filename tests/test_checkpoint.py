"""Checkpoint/resume: a restored run must continue bit-identically
(SURVEY.md §5 — the whole algorithm state is the GBPState pytree)."""
import jax
import numpy as np

from gbp_tpu.core.sweep import GBPConfig, init_state, run
from gbp_tpu.utils import checkpoint

from tests.test_sweep_linear import build_chain

CFG = GBPConfig(eta_damping=0.4, num_undamped_iters=3, min_linear_iters=2)


def test_save_restore_resume_identical(tmp_path):
    graph, means = build_chain(seed=4)
    state = init_state(graph, means)
    runj = jax.jit(run, static_argnums=3)

    state = runj(graph, state, CFG, 7)  # mid-run (messages, counters nonzero)
    checkpoint.save(tmp_path / "ckpt", state, graph=graph)

    # Straight-through reference.
    ref = runj(graph, state, CFG, 9)

    # Restore into fresh templates and resume.
    template = init_state(graph, means)
    r_state, r_graph = checkpoint.restore(tmp_path / "ckpt", template, graph)
    for a, b in zip(
        jax.tree_util.tree_leaves(r_state), jax.tree_util.tree_leaves(state)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    resumed = runj(r_graph, r_state, CFG, 9)
    for a, b in zip(
        jax.tree_util.tree_leaves(resumed), jax.tree_util.tree_leaves(ref)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_mid_prior_weakening_schedule(tmp_path):
    """VERDICT r1: a resume must continue the prior-annealing schedule where
    it left off — the weakened graph AND the schedule position (sweep index,
    weakenings applied) round-trip through the checkpoint."""
    import jax.numpy as jnp

    from gbp_tpu.models import ba

    sim = ba.simulate(n_cams=5, n_lmks=40, seed=6)
    graph, means = ba.build(sim, dtype=jnp.float64)
    cfg = GBPConfig(eta_damping=0.4, num_undamped_iters=6, min_linear_iters=8)
    runj = jax.jit(run, static_argnums=3)

    # reference: 3 schedule periods of 5 sweeps, weakening after each
    g, st = graph, init_state(graph, means)
    for k in range(3):
        st = runj(g, st, cfg, 5)
        g = ba.weaken_priors(g, 0.1)
    ref = runj(g, st, cfg, 5)

    # checkpoint after period 2, resume in a "fresh process"
    g2, st2 = graph, init_state(graph, means)
    for k in range(2):
        st2 = runj(g2, st2, cfg, 5)
        g2 = ba.weaken_priors(g2, 0.1)
    checkpoint.save(tmp_path / "ck", st2, graph=g2,
                    extras={"sweep": 10, "weakened": 2})
    r_state, r_graph, r_extras = checkpoint.restore(
        tmp_path / "ck", init_state(graph, means), graph,
        extras_template={"sweep": 0, "weakened": 0})
    assert int(r_extras["sweep"]) == 10 and int(r_extras["weakened"]) == 2
    # continue the schedule from the restored position
    g3, st3 = r_graph, r_state
    for k in range(int(r_extras["weakened"]), 3):
        st3 = runj(g3, st3, cfg, 5)
        g3 = ba.weaken_priors(g3, 0.1)
    got = runj(g3, st3, cfg, 5)
    for a, b in zip(jax.tree_util.tree_leaves(got),
                    jax.tree_util.tree_leaves(ref)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_into_cm(tmp_path):
    """VERDICT r2 item 8: checkpointing was one-way for the fast paths.
    A GBPState checkpoint must resume INTO the resident component-major
    sweep (sweep_cm.from_gbp_state) bit-identically to an uninterrupted CM
    run — real rows and beliefs exactly equal."""
    import jax.numpy as jnp

    from gbp_tpu.core import sweep_cm
    from gbp_tpu.models import ba

    sim = ba.simulate(n_cams=6, n_lmks=50, seed=3)
    graph, means = ba.build(sim, dtype=jnp.float64, layout="ell")
    cfg = GBPConfig(eta_damping=0.4, num_undamped_iters=6, min_linear_iters=8,
                    message_form="pallas")
    cmg = sweep_cm.prepare(graph, segsum_exact=True)
    assert cmg is not None
    runcm = jax.jit(sweep_cm.run, static_argnums=3)

    ref = runcm(cmg, sweep_cm.init_state(cmg, means), cfg, 12)

    mid = runcm(cmg, sweep_cm.init_state(cmg, means), cfg, 6)
    checkpoint.save(tmp_path / "cm", sweep_cm.to_gbp_state(cmg, mid))
    template = sweep_cm.to_gbp_state(cmg, sweep_cm.init_state(cmg, means))
    r_state = checkpoint.restore(tmp_path / "cm", template)
    resumed = runcm(cmg, sweep_cm.from_gbp_state(cmg, r_state), cfg, 6)

    got = sweep_cm.to_gbp_state(cmg, resumed)
    want = sweep_cm.to_gbp_state(cmg, ref)
    for a, b in zip(jax.tree_util.tree_leaves(got),
                    jax.tree_util.tree_leaves(want)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for vi in range(2):
        np.testing.assert_array_equal(np.asarray(resumed.v[vi].mean),
                                      np.asarray(ref.v[vi].mean))


def test_halo_state_save_restore_resume(tmp_path):
    """VERDICT r2 item 8: HaloState (owner-sharded beliefs + ghosts + factor
    shards) must checkpoint and resume bit-identically to an uninterrupted
    halo run, with shardings restored from the template."""
    import jax.numpy as jnp

    from gbp_tpu.models import ba
    from gbp_tpu.parallel import halo, sharding

    sim = ba.simulate(n_cams=8, n_lmks=100, seed=5)
    graph, means = ba.build(sim, dtype=jnp.float64, layout="none")
    cfg = GBPConfig(eta_damping=0.4, num_undamped_iters=6, min_linear_iters=8)
    mesh = sharding.make_mesh(8)

    hp, st0, run_halo = halo.distribute(graph, means, mesh)
    ref = run_halo(hp.hgraph, run_halo(hp.hgraph, st0, cfg, 8), cfg, 8)

    mid = run_halo(hp.hgraph, st0, cfg, 8)
    checkpoint.save(tmp_path / "halo", mid, extras={"sweep": 8})

    # "Fresh process": rebuild the partition, restore into its placed state.
    hp2, template, run2 = halo.distribute(graph, means, mesh)
    r_state, r_extras = checkpoint.restore(
        tmp_path / "halo", template, extras_template={"sweep": 0})
    assert int(r_extras["sweep"]) == 8
    for leaf in jax.tree_util.tree_leaves(r_state):
        assert len(leaf.sharding.device_set) == 8  # restored SHARDED
    resumed = run2(hp2.hgraph, r_state, cfg, 8)

    for a, b in zip(jax.tree_util.tree_leaves(resumed),
                    jax.tree_util.tree_leaves(ref)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
