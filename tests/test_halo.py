"""Halo-sharded SPMD (gbp_tpu/parallel/halo.py) on the 8-device virtual CPU
mesh: owner-sharded beliefs with boundary-only collectives must reproduce the
single-device f64 result to 1e-9, move O(boundary) bytes per sweep, and keep
per-chip variable memory O(n/P + boundary)."""
import jax
import jax.numpy as jnp
import numpy as np

from gbp_tpu.core.sweep import GBPConfig, init_state, run
from gbp_tpu.models import ba, pose_graph
from gbp_tpu.parallel import halo, sharding


def _single(graph, means, cfg, n):
    state = init_state(graph, means)
    return jax.jit(run, static_argnums=3)(graph, state, cfg, n)


def test_halo_ba_matches_single_device():
    sim = ba.simulate(n_cams=8, n_lmks=120, seed=0)
    graph, means = ba.build(sim, dtype=jnp.float64, layout="none")
    cfg = GBPConfig(eta_damping=0.4, num_undamped_iters=6, min_linear_iters=8)
    single = _single(graph, means, cfg, 30)

    mesh = sharding.make_mesh(8)
    hp, st, run_halo = halo.distribute(graph, means, mesh)
    out = run_halo(hp.hgraph, st, cfg, 30)
    got = halo.collect_means(hp, out)
    for vbi in range(2):
        np.testing.assert_allclose(
            got[vbi], np.asarray(single.v[vbi].mean), rtol=1e-9, atol=1e-11)


def test_halo_ba_intrinsics_matches_single_device():
    """9-dof intrinsics cameras (beyond-reference) under the halo partition:
    the owner-sharded sweep must reproduce the single-device result for the
    wider camera block too (pins dof-agnostic exchange packing)."""
    import os
    from gbp_tpu.io import bal as balio
    data = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                        "data")
    problem = balio.prune(balio.read_bal(os.path.join(data, "toy_ba.txt")))
    sim = balio.to_sim(problem, pix_sigma=1.0)
    sim["intrinsics"] = sim["intrinsics"] * np.array([1.05, 1.0, 1.0])
    graph, means, _ = ba.build_bal(sim, dtype=jnp.float64, layout="none",
                                   optimize_intrinsics=True)
    cfg = GBPConfig(eta_damping=0.4, num_undamped_iters=6, min_linear_iters=8)
    single = _single(graph, means, cfg, 30)

    mesh = sharding.make_mesh(8)
    hp, st, run_halo = halo.distribute(graph, means, mesh)
    out = run_halo(hp.hgraph, st, cfg, 30)
    got = halo.collect_means(hp, out)
    for vbi in range(2):
        np.testing.assert_allclose(
            got[vbi], np.asarray(single.v[vbi].mean), rtol=1e-9, atol=1e-11)


def test_halo_pose_graph_matches_single_device():
    sim = pose_graph.simulate_manhattan(n_poses=64, seed=4, loop_prob=0.5,
                                        loop_radius=3.0)
    graph, means = pose_graph.build(sim, dtype=jnp.float64)
    cfg = pose_graph.default_config()
    single = _single(graph, means, cfg, 25)

    mesh = sharding.make_mesh(8)
    hp, st, run_halo = halo.distribute(graph, means, mesh)
    out = run_halo(hp.hgraph, st, cfg, 25)
    got = halo.collect_means(hp, out)
    np.testing.assert_allclose(
        got[0], np.asarray(single.v[0].mean), rtol=1e-9, atol=1e-11)


def test_halo_collectives_are_o_boundary():
    """The whole point: per-sweep collective bytes must be far below the
    replicated-psum volume (O(all variables)) that parallel/spmd.py moves.
    Uses the corridor scene — the locality regime (city-scale north star) the
    halo partition targets; the arc scene has every landmark visible from
    most cameras, so there everything is boundary by construction."""
    sim = ba.simulate_corridor(n_cams=64, lmks_per_cam=30, window=3, seed=1)
    graph, means = ba.build(sim, dtype=jnp.float64, layout="none")
    hp = halo.partition(graph, 8)
    b = halo.collective_bytes(hp, itemsize=8)
    assert b["halo_bytes_per_sweep"] < 0.35 * b["replicated_psum_bytes_per_sweep"], b
    # the contiguous keyframe partition should have picked the ppermute
    # neighbor exchange for the landmark block
    assert b["modes"][1] == "permute", b


def test_halo_comm_modes_agree():
    """gather and permute lowerings of the exchange are the same math."""
    sim = ba.simulate_corridor(n_cams=24, lmks_per_cam=10, window=2, seed=7)
    graph, means = ba.build(sim, dtype=jnp.float64, layout="none")
    cfg = GBPConfig(eta_damping=0.4, num_undamped_iters=6, min_linear_iters=8)
    mesh = sharding.make_mesh(8)
    outs = []
    for mode in ("gather", "permute"):
        hp = halo.partition(graph, 8, comm_mode=mode)
        st = halo.init_state(hp, means)
        run_halo = halo.make_run(mesh, hp, st)
        out = run_halo(hp.hgraph, st, cfg, 12)
        outs.append(halo.collect_means(hp, out))
    # The two lowerings sum received contributions in different orders, so
    # they differ by f64 rounding (amplified over nonlinear sweeps) — not
    # bitwise.
    for vbi in range(2):
        np.testing.assert_allclose(outs[0][vbi], outs[1][vbi],
                                   rtol=1e-7, atol=1e-7)


def test_halo_memory_scales_with_mesh():
    """Per-chip owned belief state must shrink ~linearly with chip count; the
    replicated design kept it constant at O(n)."""
    sim = ba.simulate_corridor(n_cams=64, lmks_per_cam=30, window=3, seed=1)
    graph, means = ba.build(sim, dtype=jnp.float64, layout="none")
    hp = halo.partition(graph, 8)
    n_lmks = graph.vblocks[1].count
    lmk_comm = hp.hgraph.comm[1]
    # owned landmarks per chip ~ n/P (+imbalance), not n
    assert lmk_comm.n_own_max < 0.3 * n_lmks, (lmk_comm.n_own_max, n_lmks)
    # ghosts per chip are a small fraction (window overlap only)
    assert lmk_comm.n_ghost_max < 0.15 * n_lmks, (lmk_comm.n_ghost_max, n_lmks)
    # and every landmark is owned exactly once
    all_ids = np.concatenate([ids[ids >= 0] for ids in hp.owned_ids[1]])
    assert sorted(all_ids.tolist()) == list(range(n_lmks))


def test_halo_corridor_annealed_converges_and_matches():
    """End-to-end on the locality scene with the reference's prior-annealing
    schedule (strong initial priors weakened over sweeps, arXiv:2003.03134
    §4 — chain-structured BA diverges without it): the halo run must track
    the single-device f64 run AND reach the GN optimum (~1px)."""
    sim = ba.simulate_corridor(n_cams=24, lmks_per_cam=12, window=2, seed=2)
    graph, means = ba.build(sim, dtype=jnp.float64, layout="none",
                            cam_prior_prec=1000.0, lmk_prior_prec=1000.0)
    cfg = GBPConfig(eta_damping=0.4, num_undamped_iters=6, min_linear_iters=8)
    mesh = sharding.make_mesh(8)
    hp, st, run_halo = halo.distribute(graph, means, mesh)

    g = graph
    s_single = init_state(g, means)
    runj = jax.jit(run, static_argnums=3)
    for it in range(4):
        s_single = runj(g, s_single, cfg, 10)
        st = run_halo(hp.hgraph, st, cfg, 10)
        if it < 3:
            g = ba.weaken_priors(g, 0.1)
            hp = halo.weaken_priors(hp, 0.1)
    got = halo.collect_means(hp, st)
    for vbi in range(2):
        np.testing.assert_allclose(
            got[vbi], np.asarray(s_single.v[vbi].mean), rtol=1e-6, atol=1e-8)
    are = float(ba.avg_reprojection_error(g, s_single, k=sim["k"]))
    assert are < 1.5, are


def test_halo_partition_balances_factor_counts():
    """VERDICT r1: balance by factor count, not equal ID ranges."""
    rng = np.random.default_rng(3)
    # skewed BA: some cameras see many more landmarks than others
    sim = ba.simulate(n_cams=12, n_lmks=300, seed=3)
    graph, means = ba.build(sim, dtype=jnp.float64, layout="none")
    hp = halo.partition(graph, 4)
    valid = np.asarray(hp.hgraph.fblocks[0].valid)
    per_chip = valid.sum(axis=1)
    assert per_chip.max() <= 1.6 * per_chip.mean(), per_chip


def test_halo_energy_matches_single_device():
    from gbp_tpu.core.sweep import energy

    sim = ba.simulate(n_cams=6, n_lmks=60, seed=5)
    graph, means = ba.build(sim, dtype=jnp.float64, layout="none")
    cfg = GBPConfig()
    mesh = sharding.make_mesh(8)
    hp, st, run_halo = halo.distribute(graph, means, mesh)
    out = run_halo(hp.hgraph, st, cfg, 10)
    e_halo = halo.energy_halo(hp, out, mesh)

    single = _single(graph, means, cfg, 10)
    e_single = float(energy(graph, single))
    np.testing.assert_allclose(e_halo, e_single, rtol=1e-8)


def test_halo_se3_pose_graph_matches_single_device():
    """SE(3) pose graph (full 6x6 edge information) under the halo exchange."""
    from tests.test_se3_pose_graph import simulate_se3

    data = simulate_se3(n_poses=40, seed=2)
    graph, means = pose_graph.build_g2o(data, dtype=jnp.float64)
    cfg = pose_graph.default_config()
    single = _single(graph, means, cfg, 20)

    mesh = sharding.make_mesh(8)
    hp, st, run_halo = halo.distribute(graph, means, mesh)
    out = run_halo(hp.hgraph, st, cfg, 20)
    got = halo.collect_means(hp, out)
    np.testing.assert_allclose(
        got[0], np.asarray(single.v[0].mean), rtol=1e-8, atol=1e-10)
