import jax
import jax.numpy as jnp
import numpy as np

from gbp_tpu.factors import linear, odometry, reprojection


def _random_ba_state(rng, batch=32):
    """Camera [omega, t] looking roughly at points in front of it."""
    w = 0.3 * rng.standard_normal((batch, 3))
    t = rng.standard_normal((batch, 3)) * 0.2 + np.array([0, 0, 0.5])
    pt = rng.standard_normal((batch, 3)) * 0.5 + np.array([0, 0, 4.0])
    return np.concatenate([w, t, pt], axis=-1)


def test_reprojection_analytic_jac_matches_autodiff():
    rng = np.random.default_rng(0)
    x = jnp.asarray(_random_ba_state(rng))
    k = jnp.asarray(np.tile([500.0, 500.0, 320.0, 240.0], (x.shape[0], 1)))
    ft = reprojection.reprojection()
    j_analytic = jax.vmap(ft.jac)(x, k)
    j_auto = jax.vmap(jax.jacfwd(ft.meas_fn))(x, k)
    np.testing.assert_allclose(np.asarray(j_analytic), np.asarray(j_auto), rtol=1e-7, atol=1e-8)


def test_reprojection_meas_sane():
    # A point on the optical axis projects to the principal point.
    ft = reprojection.reprojection()
    x = jnp.asarray(np.concatenate([np.zeros(6), [0.0, 0.0, 5.0]]))
    k = jnp.asarray([500.0, 500.0, 320.0, 240.0])
    px = np.asarray(ft.meas(x, k))
    np.testing.assert_allclose(px, [320.0, 240.0], atol=1e-12)


def test_bal_reprojection_autodiff_finite():
    rng = np.random.default_rng(1)
    x = _random_ba_state(rng, 8)
    x[:, 8] *= -1.0  # BAL looks down -z
    x = jnp.asarray(x)
    cam = jnp.asarray(np.tile([500.0, -1e-7, 1e-13], (8, 1)))
    ft = reprojection.bal_reprojection()
    j = jax.vmap(ft.jac)(x, cam)
    assert np.isfinite(np.asarray(j)).all()


def test_se2_between_wraps_angle():
    ft = odometry.se2_between()
    z = jnp.asarray([0.0, 0.0, 3.0])
    z_hat = jnp.asarray([0.0, 0.0, -3.0])
    r = np.asarray(ft.residual(z, z_hat))
    # 6.0 wraps to 6.0 - 2*pi ~= -0.28.
    np.testing.assert_allclose(r[2], 6.0 - 2 * np.pi, atol=1e-12)


def test_linear_factor_meas():
    ft = linear.displacement(2)
    x = jnp.asarray([1.0, 2.0, 4.0, 7.0])
    np.testing.assert_allclose(np.asarray(ft.meas(x, None)), [3.0, 5.0])


def test_depth_guard_behind_camera_is_finite_and_identity_in_front():
    """The sign-preserving depth floor (reprojection._safe_z, round 5): a
    linpoint crossing the z = 0 plane — measured on real streams when an
    arrival init is degenerate — must give FINITE meas/jac (Huber then
    rejects the row) instead of a 1/z overflow whose NaN poisons the sweep;
    away from the plane the guard is exactly the identity (the analytic-vs-
    autodiff parity tests above run on unguarded points)."""
    for make, args in (
        (reprojection.reprojection, jnp.asarray([500.0, 500.0, 320.0, 240.0])),
        (reprojection.reprojection_normalized, None),
        (reprojection.bal_reprojection, jnp.asarray([500.0, -1e-7, 1e-13])),
        (reprojection.bal_reprojection_normalized, jnp.asarray([-1e-7, 1e-13])),
    ):
        ft = make()
        # Point exactly on / behind the z = 0 plane of the camera.
        for zc in (0.0, -0.5, 1e-6):
            x = jnp.asarray([0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.3, -0.2, zc])
            h = np.asarray(ft.meas(x, args))
            assert np.isfinite(h).all(), (ft.name, zc, h)
            if ft.jac_fn is not None:
                j = np.asarray(ft.jac(x, args))
                assert np.isfinite(j).all(), (ft.name, zc)
        # Healthy point: guarded == unguarded (identity outside |z| < eps).
        x = jnp.asarray([0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.3, -0.2, 2.5])
        _, xc, _ = reprojection._cam_point(x)
        assert float(reprojection._safe_z(xc[2])) == float(xc[2])
