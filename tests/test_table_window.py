"""Camera-window table kernels (ops/messages_pallas.py `*_tabblk`,
`segsum_cm_blk`; core/sweep_cm.py window/locality-sort logic).

On locality-rich graphs (corridor / city-scale BA — SURVEY.md §7
"partition quality") the in-kernel one-hot table dots contract over a
per-grid-tile camera WINDOW instead of the whole padded camera count,
cutting the reconstruction/reduction MXU work by ~n_cams/win_w.  The
locality sort RELABELS the ELL variable block (round 4: resident beliefs
live in sorted order across sweeps — per-sweep unpermutes ate the whole
window win on chip; state converters restore user order), and permutes
the segsum accumulation order: results match the full-table path to
summation-order rounding, not bitwise (the same class as the
generic-vs-CM comparisons in test_sweep_cm.py).
"""
import jax
import jax.numpy as jnp
import numpy as np

from gbp_tpu.core import sweep_cm
from gbp_tpu.core.sweep import GBPConfig, init_state, run
from gbp_tpu.models import ba

CFG = GBPConfig(eta_damping=0.4, num_undamped_iters=6, min_linear_iters=8)


def _corridor_graph(n_cams=320, lmks_per_cam=20):
    sim = ba.simulate_corridor(n_cams=n_cams, lmks_per_cam=lmks_per_cam,
                               window=3, seed=1)
    return ba.build(sim, layout="ell", dtype=jnp.float64,
                    cam_prior_prec=1000.0, lmk_prior_prec=1000.0)


def test_window_engages_via_locality_sort():
    """Corridor landmark ids are random, so the natural ELL order has
    full-range camera spans: windowing must engage via the group sort."""
    graph, _ = _corridor_graph()
    cmg = sweep_cm.prepare(graph, window=True)
    assert cmg.gather_mode == "table"
    assert cmg.win_w > 0 and cmg.win_w * 2 <= cmg.win_ncpad
    assert cmg.vperm is not None and cmg.rowperm is not None
    # Coverage invariant: every gathered id inside its tile's window.
    from gbp_tpu.ops.messages_pallas import TILE
    gidx = np.asarray(cmg.gidx_rm).reshape(-1, TILE)
    starts = np.asarray(cmg.win_starts)
    assert (gidx.min(1) >= starts).all()
    assert (gidx.max(1) < starts + cmg.win_w).all()


def test_window_off_for_small_or_nonlocal_graphs():
    # Small camera count: window would not shrink the dots.
    sim = ba.simulate_corridor(n_cams=64, lmks_per_cam=20, window=3, seed=0)
    graph, _ = ba.build(sim, layout="ell", dtype=jnp.float64)
    cmg = sweep_cm.prepare(graph, window=True)
    assert cmg.win_w == 0 and cmg.vperm is None
    # Arc scene at scale: every landmark sees most cameras — no locality
    # even after sorting.
    sim = ba.simulate(n_cams=260, n_lmks=600, seed=0)
    graph, _ = ba.build(sim, layout="ell", dtype=jnp.float64)
    cmg = sweep_cm.prepare(graph, window=True)
    assert cmg.win_w == 0


def test_windowed_matches_full_table():
    """15 sweeps (through relinearization) on the corridor: windowed ==
    full-table to summation-order rounding, and both track the generic
    engine."""
    graph, means = _corridor_graph()
    cm_full = sweep_cm.prepare(graph, window=False)
    cm_win = sweep_cm.prepare(graph, window=True)
    assert cm_win.win_w > 0
    a = jax.jit(sweep_cm.run, static_argnums=3)(
        cm_full, sweep_cm.init_state(cm_full, means), CFG, 15)
    b = jax.jit(sweep_cm.run, static_argnums=3)(
        cm_win, sweep_cm.init_state(cm_win, means), CFG, 15)
    # The sorted run's resident beliefs live in sorted order: user-order
    # views come from to_gbp_state (the state-conversion contract).
    bg = sweep_cm.to_gbp_state(cm_win, b)
    for vi in range(2):
        av, bv = np.asarray(a.v[vi].mean), np.asarray(bg.v[vi].mean)
        assert np.isfinite(bv).all()
        np.testing.assert_allclose(bv, av, atol=1e-4, rtol=0)
    are_a = float(ba.avg_reprojection_error(graph, a))
    are_b = float(ba.avg_reprojection_error(graph, bg))
    assert abs(are_a - are_b) < 1e-4, (are_a, are_b)


def test_windowed_presorted_no_perm():
    """With landmarks prenumbered in corridor order the window engages
    WITHOUT the locality sort (no row permutation).  Messages and belief
    etas are bitwise-equal; camera lams differ only by the windowed
    segsum's dot-orientation rounding (measured 3e-11 on O(1e3) lams at
    sweep 1), so pre-relinearization sweeps agree to ~1e-5."""
    sim = ba.simulate_corridor(n_cams=320, lmks_per_cam=20, window=3, seed=1)
    order = np.argsort(sim["lmk_truth"][:, 0], kind="stable")
    inv = np.argsort(order)
    sim = dict(sim,
               lmk_truth=sim["lmk_truth"][order],
               lmk_init=sim["lmk_init"][order],
               lmk_ids=inv[sim["lmk_ids"]])
    graph, means = ba.build(sim, layout="ell", dtype=jnp.float64,
                            cam_prior_prec=1000.0, lmk_prior_prec=1000.0)
    cm_full = sweep_cm.prepare(graph, window=False)
    cm_win = sweep_cm.prepare(graph, window=True)
    assert cm_win.win_w > 0
    assert cm_win.vperm is None  # natural order already local
    a = jax.jit(sweep_cm.run, static_argnums=3)(
        cm_full, sweep_cm.init_state(cm_full, means), CFG, 6)
    b = jax.jit(sweep_cm.run, static_argnums=3)(
        cm_win, sweep_cm.init_state(cm_win, means), CFG, 6)
    for vi in range(2):
        np.testing.assert_allclose(
            np.asarray(b.v[vi].mean), np.asarray(a.v[vi].mean),
            atol=1e-5, rtol=0)


def test_windowed_state_roundtrip_with_rowperm():
    """to_gbp_state must un-permute the locality-sorted factor rows;
    from_gbp_state must re-permute (checkpoint/resume into a windowed CM
    run)."""
    graph, means = _corridor_graph(n_cams=280, lmks_per_cam=12)
    cm_win = sweep_cm.prepare(graph, window=True)
    assert cm_win.rowperm is not None
    s = jax.jit(sweep_cm.run, static_argnums=3)(
        cm_win, sweep_cm.init_state(cm_win, means), CFG, 5)
    gbp = sweep_cm.to_gbp_state(cm_win, s)
    # Row-major order == the generic engine's order: compare linpoints
    # against a generic run of the same sweeps.
    gen = jax.jit(run, static_argnums=3)(graph, init_state(graph, means),
                                         CFG, 5)
    np.testing.assert_allclose(
        np.asarray(gbp.f[0].linpoint), np.asarray(gen.f[0].linpoint),
        atol=1e-9, rtol=0)
    # Round-trip back into CM and keep sweeping: identical to uninterrupted.
    s2 = sweep_cm.from_gbp_state(cm_win, gbp)
    a = jax.jit(sweep_cm.run, static_argnums=3)(cm_win, s, CFG, 3)
    b = jax.jit(sweep_cm.run, static_argnums=3)(cm_win, s2, CFG, 3)
    for vi in range(2):
        np.testing.assert_allclose(
            np.asarray(b.v[vi].mean), np.asarray(a.v[vi].mean),
            atol=1e-12, rtol=0)


def test_windowed_annealed_run():
    """The annealed runner (the corridor production recipe) composes with
    the windowed CM path: same trajectory as the full-table path while
    rounding has not yet compounded (20 sweeps through two weakenings),
    and the long run stays finite.  (Full convergence on a 320-camera
    chain needs O(n_cams) sweeps — GBP information moves ~1 hop/sweep —
    and mid-convergence states are rounding-chaotic, so end-state
    equality is not a meaningful assertion here; convergence itself is
    pinned by the 64-cam corridor tests.)"""
    from gbp_tpu.core import anneal

    graph, means = _corridor_graph()
    states = {}
    for window in (False, True):
        cmg = sweep_cm.prepare(graph, window=window)
        out = anneal.run_annealed_cm(
            cmg, sweep_cm.init_state(cmg, means), CFG, 20, every=10, times=3)
        states[window] = sweep_cm.to_gbp_state(cmg, out)
    for vi in range(2):
        np.testing.assert_allclose(
            np.asarray(states[True].v[vi].mean),
            np.asarray(states[False].v[vi].mean), atol=0.05, rtol=0)
    cmg = sweep_cm.prepare(graph, window=True)
    long = anneal.run_annealed_cm(
        cmg, sweep_cm.init_state(cmg, means), CFG, 60, every=10, times=3)
    for vi in range(2):
        assert np.isfinite(np.asarray(long.v[vi].mean)).all()


def test_scatter_windows_cm_exact():
    """The VMEM scatter combine (round 5: replaced the segment_sum tail of
    the windowed reductions) is EXACT against a direct dense accumulation —
    overlapping windows, duplicate starts, windows reaching into the
    padded tail, and both dtypes."""
    from gbp_tpu.ops.messages_pallas import scatter_windows_cm

    rng = np.random.default_rng(7)
    for dtype, f, n_tiles, w, n_seg, ncpad in (
        (np.float64, 42, 7, 128, 1280, 1536),
        (np.float32, 12, 5, 16, 40, 48),
    ):
        gpart = jnp.asarray(rng.normal(size=(n_tiles, f, w)), dtype)
        starts_np = np.sort(
            rng.integers(0, (ncpad - w) // 8 + 1, size=n_tiles)) * 8
        got = scatter_windows_cm(
            gpart, jnp.asarray(starts_np, jnp.int32), n_seg=n_seg, w=w,
            ncpad=ncpad, interpret=True)
        want = np.zeros((f, ncpad), dtype)
        for i, s in enumerate(starts_np):
            want[:, s:s + w] += np.asarray(gpart[i])
        np.testing.assert_allclose(np.asarray(got), want[:, :n_seg],
                                   rtol=0, atol=1e-5 if dtype is np.float32
                                   else 0)
