"""Real-TPU checks (see conftest.py for why these cannot run in interpret
mode).  Kept small: each jit costs ~10-40 s of XLA compile over the tunnel."""
import jax
import numpy as np

from gbp_tpu.core import sweep_cm
from gbp_tpu.core.sweep import GBPConfig, init_state, run
from gbp_tpu.models import ba

CFG = GBPConfig(eta_damping=0.4, num_undamped_iters=6, min_linear_iters=8,
                message_form="pallas")


def _ba(n_cams=8, n_lmks=150, seed=0):
    sim = ba.simulate(n_cams=n_cams, n_lmks=n_lmks, seed=seed)
    graph, means = ba.build(sim)
    return sim, graph, means


def test_cm_fori_equals_dispatched_bitwise():
    """The round-1 miscompile class: a fused kernel arrangement that is
    correct per-dispatch but corrupted inside lax.fori_loop.  Any change to
    kernel inputs/outputs must keep this bit-identical.  Covers BOTH gather
    modes (the 'table' kernels have a different operand arrangement)."""
    _, graph, means = _ba()
    n = 6
    for mode in ("rows", "table"):
        cmg = sweep_cm.prepare(graph, gather_mode=mode)
        st0 = sweep_cm.init_state(cmg, means)
        a = jax.jit(sweep_cm.run, static_argnums=3)(cmg, st0, CFG, n)
        sweepj = jax.jit(sweep_cm.sweep)
        b = st0
        for _ in range(n):
            b = sweepj(cmg, b, CFG)
        for la, lb in zip(jax.tree_util.tree_leaves(a),
                          jax.tree_util.tree_leaves(b)):
            np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_cm_table_matches_rows_on_chip():
    """In-kernel table reconstruction must be EXACT (one-hot MXU dot at
    HIGHEST precision): table mode == rows mode bitwise after real sweeps."""
    _, graph, means = _ba(seed=4)
    outs = []
    for mode in ("rows", "table"):
        cmg = sweep_cm.prepare(graph, gather_mode=mode, segsum_exact=True)
        outs.append(jax.jit(sweep_cm.run, static_argnums=3)(
            cmg, sweep_cm.init_state(cmg, means), CFG, 10))
    for vi in range(2):
        np.testing.assert_array_equal(
            np.asarray(outs[0].v[vi].mean), np.asarray(outs[1].v[vi].mean))


def test_cm_matches_row_pallas_on_chip():
    """Persistent-CM sweep vs the row-major pallas path ON CHIP (true f32
    MXU/VPU numerics; interpret-mode parity already holds in tests/test_cm).
    Early BA sweeps are knife-edge, so compare a short damped run."""
    sim, graph, means = _ba(seed=1)
    n = 12
    s_ref = jax.jit(run, static_argnums=3)(graph, init_state(graph, means), CFG, n)
    cmg = sweep_cm.prepare(graph, segsum_exact=True)
    s_cm = jax.jit(sweep_cm.run, static_argnums=3)(
        cmg, sweep_cm.init_state(cmg, means), CFG, n)
    for vi in range(2):
        np.testing.assert_allclose(
            np.asarray(s_cm.v[vi].mean), np.asarray(s_ref.v[vi].mean),
            rtol=1e-4, atol=1e-4)


def test_cm_segsum_split_accuracy_on_chip():
    """The bf16 hi/lo segment-sum must track the 6-pass exact variant."""
    sim, graph, means = _ba(seed=2)
    outs = []
    for exact in (True, False):
        cmg = sweep_cm.prepare(graph, segsum_exact=exact)
        outs.append(jax.jit(sweep_cm.run, static_argnums=3)(
            cmg, sweep_cm.init_state(cmg, means), CFG, 10))
    for vi in range(2):
        np.testing.assert_allclose(
            np.asarray(outs[1].v[vi].mean), np.asarray(outs[0].v[vi].mean),
            rtol=2e-4, atol=2e-4)


def test_ba_converges_on_chip():
    """20 sweeps of BA: energy finite and strictly decreasing overall."""
    from gbp_tpu.core.sweep import energy

    sim, graph, means = _ba(n_cams=10, n_lmks=300, seed=3)
    cmg = sweep_cm.prepare(graph)
    st = sweep_cm.init_state(cmg, means)
    e0 = float(energy(graph, st))
    st = jax.jit(sweep_cm.run, static_argnums=3)(cmg, st, CFG, 20)
    e1 = float(energy(graph, st))
    assert np.isfinite(e1) and e1 < e0, (e0, e1)
    are = float(ba.avg_reprojection_error(graph, st, k=sim["k"]))
    assert np.isfinite(are) and are < 3.0, are


def test_halo_cm_on_chip_single_mesh():
    """The CM-under-halo sweep compiles and matches plain CM ON CHIP with a
    1-chip mesh (all exchange machinery inline; Mosaic sees the kernels
    inside shard_map + fori_loop)."""
    import numpy as np
    from jax.sharding import Mesh

    from gbp_tpu.parallel import halo, halo_cm

    sim = ba.simulate(n_cams=8, n_lmks=150, seed=0)
    g_none, m_none = ba.build(sim, layout="none")
    mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1), ("graph",))
    out = halo_cm.distribute(g_none, m_none, mesh)
    assert out is not None
    hp, hcm, st, run_fn = out
    st = run_fn(hcm, st, CFG, 12)
    got = halo.collect_means(hp, st)

    graph, means = ba.build(sim)
    cmg = sweep_cm.prepare(graph, segsum_exact=True)
    ref = jax.jit(sweep_cm.run, static_argnums=3)(
        cmg, sweep_cm.init_state(cmg, means), CFG, 12)
    for vbi in range(2):
        np.testing.assert_allclose(
            got[vbi], np.asarray(ref.v[vbi].mean), rtol=2e-4, atol=2e-4)


def test_bal_distortion_cm_on_chip():
    """The BAL camera model (z-negation + radial distortion) runs through
    the fused CM kernels on real silicon — the one component-form factor
    with in-kernel distortion math (ops/comp_factors.py)."""
    import numpy as np

    from gbp_tpu.io import bal as balio

    problem = balio.prune(balio.read_bal("data/toy_ba.txt"))
    sim = balio.to_sim(problem, pix_sigma=1.0)
    graph, means, px_scale = ba.build_bal(sim)
    cmg = sweep_cm.prepare(graph, segsum_exact=True)
    assert cmg is not None and cmg.fb.ftype.name == "bal_reprojection_normalized"
    st = sweep_cm.init_state(cmg, means)
    st = jax.jit(sweep_cm.run, static_argnums=3)(cmg, st, CFG, 30)
    are = float(ba.avg_reprojection_error(
        graph, sweep_cm.to_gbp_state(cmg, st), px_scale=px_scale))
    assert np.isfinite(are) and are < 3.0, are
