"""ELL (degree-padded, variable-grouped) factor layout must be an exact
re-ordering: same beliefs as the insertion-order layout, inert padding."""
import jax
import jax.numpy as jnp
import numpy as np

from gbp_tpu.core.sweep import GBPConfig, init_state, run, energy
from gbp_tpu.models import ba

CFG = GBPConfig(eta_damping=0.4, num_undamped_iters=6, min_linear_iters=8)


def test_ell_matches_plain_layout():
    sim = ba.simulate(n_cams=7, n_lmks=90, seed=0)
    g_plain, means = ba.build(sim, dtype=jnp.float64, layout="none")
    g_ell, means_e = ba.build(sim, dtype=jnp.float64, layout="ell")
    fb = g_ell.fblocks[0]
    assert fb.ell_slot in (0, 1) and fb.ell_deg > 0
    assert fb.count == g_ell.vblocks[fb.vblocks[fb.ell_slot]].count * fb.ell_deg
    assert int(fb.valid.sum()) == g_plain.fblocks[0].count

    a = jax.jit(run, static_argnums=3)(g_plain, init_state(g_plain, means), CFG, 30)
    b = jax.jit(run, static_argnums=3)(g_ell, init_state(g_ell, means_e), CFG, 30)
    for va, vb in zip(a.v, b.v):
        np.testing.assert_allclose(np.asarray(vb.mean), np.asarray(va.mean),
                                   rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(float(energy(g_ell, b)), float(energy(g_plain, a)),
                               rtol=1e-10)
    np.testing.assert_allclose(
        float(ba.avg_reprojection_error(g_ell, b, k=sim["k"])),
        float(ba.avg_reprojection_error(g_plain, a, k=sim["k"])),
        rtol=1e-8,
    )


def test_ell_pallas_matches_plain():
    sim = ba.simulate(n_cams=6, n_lmks=70, seed=1)
    g_plain, means = ba.build(sim, dtype=jnp.float32, layout="none")
    g_ell, means_e = ba.build(sim, dtype=jnp.float32, layout="ell")
    cfg = CFG.replace(message_form="pallas")
    a = jax.jit(run, static_argnums=3)(g_plain, init_state(g_plain, means), cfg, 20)
    b = jax.jit(run, static_argnums=3)(g_ell, init_state(g_ell, means_e), cfg, 20)
    for va, vb in zip(a.v, b.v):
        np.testing.assert_allclose(np.asarray(vb.mean), np.asarray(va.mean),
                                   atol=2e-4)
