"""Heightfield terrain contact — ops/terrain.py + the ``terrain=`` option
of the ground steppers.

Validation (float64, CPU):
1. bilinear surface: exact on any inclined plane (values, gradient,
   normal), AD-consistent (analytic hx/hy == jax.grad of the height),
   linear extrapolation outside the grid;
2. contact frames orthonormal, right-handed, identity for n = +z;
3. a flat heightfield reproduces the plane stepper bit-for-bit
   (terrain=flat(h) == ground_z=h);
4. slope statics obey the friction cone: a standing quadruped on grade g
   sticks when g < mu and slides downhill when g > mu;
5. batched == single-state on bumpy terrain (mixed contact states);
6. the step differentiates through the terrain: d(state')/d(heights)
   matches finite differences (terrain identification path).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gridcodegenerator_tpu as g
from gridcodegenerator_tpu.models import zoo
from gridcodegenerator_tpu.ops import contact as ct
from gridcodegenerator_tpu.ops import freeflyer as ff
from gridcodegenerator_tpu.ops import terrain as tr

_FEET = (2, 5, 8, 11)
_FOOT_OFF = np.tile(np.array([0.35, 0.0, 0.0]), (4, 1))


def test_bilinear_plane_exact_and_extrapolation():
    """An inclined plane is inside the bilinear family: height, gradient,
    and normal must be exact at arbitrary query points, including OUTSIDE
    the grid (linear extrapolation)."""
    gx, gy = 0.31, -0.17
    terr = tr.slope_terrain(gx, gy, extent=2.0, cell=0.37,
                            dtype=jnp.float64)
    rng = np.random.default_rng(0)
    # interior, edge, and far-outside queries
    x = jnp.asarray(np.concatenate([rng.uniform(-1.9, 1.9, 16),
                                    [-5.0, 7.3]]))
    y = jnp.asarray(np.concatenate([rng.uniform(-1.9, 1.9, 16),
                                    [6.1, -4.4]]))
    h, hx, hy = tr.terrain_height_grad(terr, x, y)
    np.testing.assert_allclose(np.asarray(h), gx * np.asarray(x)
                               + gy * np.asarray(y), atol=1e-12)
    np.testing.assert_allclose(np.asarray(hx), gx, atol=1e-12)
    np.testing.assert_allclose(np.asarray(hy), gy, atol=1e-12)
    _, nrm = tr.terrain_surface(terr, x, y)
    expect = np.array([-gx, -gy, 1.0]) / np.sqrt(1 + gx * gx + gy * gy)
    np.testing.assert_allclose(np.asarray(nrm),
                               np.tile(expect[:, None], (1, x.shape[0])),
                               atol=1e-12)


def test_bilinear_ad_consistency():
    """Analytic hx/hy == jax.grad of the height on a random bumpy grid,
    and gradients flow into the node heights."""
    terr = tr.bumpy_terrain(amp=0.08, wavelength=0.9, extent=1.5,
                            cell=0.21, rough=0.03, dtype=jnp.float64)
    pts = np.random.default_rng(1).uniform(-1.4, 1.4, (24, 2))
    hfun = lambda xy: tr.terrain_height_grad(terr, xy[0], xy[1])[0]
    for xy in pts:
        xy = jnp.asarray(xy)
        _, hx, hy = tr.terrain_height_grad(terr, xy[0], xy[1])
        ghx, ghy = jax.grad(hfun)(xy)
        np.testing.assert_allclose(float(hx), float(ghx), atol=1e-12)
        np.testing.assert_allclose(float(hy), float(ghy), atol=1e-12)
    # d h / d heights: 4 bilinear weights summing to 1
    xy = jnp.asarray(pts[0])
    dh = jax.grad(lambda H: tr.terrain_height_grad(
        terr._replace(heights=H), xy[0], xy[1])[0])(terr.heights)
    w = np.asarray(dh)
    assert (w > 0).sum() <= 4 and abs(w.sum() - 1.0) < 1e-12


def test_contact_frame_orthonormal():
    rng = np.random.default_rng(2)
    gxy = rng.uniform(-1.5, 1.5, (32, 2))
    inv = 1.0 / np.sqrt(1 + (gxy ** 2).sum(-1))
    nrm = jnp.asarray(np.stack([-gxy[:, 0] * inv, -gxy[:, 1] * inv, inv]))
    C = np.asarray(tr.contact_frame(nrm))                   # (3, 3, 32)
    for s in range(32):
        M = C[:, :, s]
        np.testing.assert_allclose(M @ M.T, np.eye(3), atol=1e-12)
        np.testing.assert_allclose(np.linalg.det(M), 1.0, atol=1e-12)
        np.testing.assert_allclose(M[2], np.asarray(nrm)[:, s], atol=1e-12)
    # n = +z → identity (the flat stepper's world rows)
    C0 = np.asarray(tr.contact_frame(jnp.asarray([0.0, 0.0, 1.0])))
    np.testing.assert_allclose(C0, np.eye(3), atol=1e-15)


def _standing_hyq(dtype=jnp.float64, grade=0.0):
    ffm = ff.free_flyer_model(g.parse_urdf(zoo.hyq(damping=0.2)),
                              dtype=dtype)
    n = ffm.n
    quat0 = jnp.array([1.0, 0.0, 0.0, 0.0], dtype)
    q0 = jnp.asarray(np.tile([-0.1, 0.7, -1.2], 4), dtype)
    foot_z = min(
        float(ct._fb_point_base(ffm, q0, l, jnp.asarray(_FOOT_OFF[i],
                                                        dtype))[0][2])
        for i, l in enumerate(_FEET))
    pos0 = jnp.array([0.0, 0.0, -foot_z + grade * 0.0], dtype)
    state = (quat0, pos0, q0, jnp.zeros(6, dtype), jnp.zeros(n, dtype))
    return ffm, state, q0


@pytest.mark.parametrize("h0", [0.0, 0.37])
def test_flat_terrain_equals_plane(h0):
    """terrain=flat(h0) must reproduce ground_z=h0 exactly: the frame is
    the identity and the gap identical, so every downstream number is."""
    ffm, state, q0 = _standing_hyq()
    quat0, pos0, q0_, vb0, qd0 = state
    state = (quat0, pos0 + jnp.array([0.0, 0.0, h0]), q0_, vb0, qd0)
    tau = jnp.asarray(np.random.default_rng(3).normal(size=ffm.n) * 3.0)
    terr = tr.flat_terrain(h0, extent=3.0, cell=0.4, dtype=jnp.float64)
    a, ia = ct.fb_step_ground(ffm, state, tau, 2e-3, _FEET, _FOOT_OFF,
                              mu=0.6, ground_z=h0, iters=60)
    b, ib = ct.fb_step_ground(ffm, state, tau, 2e-3, _FEET, _FOOT_OFF,
                              mu=0.6, terrain=terr, iters=60)
    for xa, xb in zip(a, b):
        np.testing.assert_allclose(np.asarray(xa), np.asarray(xb),
                                   atol=1e-13)
    np.testing.assert_allclose(np.asarray(ia), np.asarray(ib), atol=1e-13)

    # batched path too
    B = 3
    batch = tuple(jnp.stack([s] * B) for s in state)
    taus = jnp.stack([tau] * B)
    ab, _ = ct.fb_step_ground_batched(ffm, batch, taus, 2e-3, _FEET,
                                      _FOOT_OFF, mu=0.6, ground_z=h0,
                                      iters=60, impl="xla")
    bb, _ = ct.fb_step_ground_batched(ffm, batch, taus, 2e-3, _FEET,
                                      _FOOT_OFF, mu=0.6, terrain=terr,
                                      iters=60, impl="xla")
    for xa, xb in zip(ab, bb):
        np.testing.assert_allclose(np.asarray(xa), np.asarray(xb),
                                   atol=1e-13)


@pytest.mark.mid
@pytest.mark.parametrize("grade,mu,slides", [(0.15, 0.6, False),
                                             (0.35, 0.15, True)])
def test_slope_statics_friction_cone(grade, mu, slides):
    """A quadruped standing on an inclined heightfield under PD holding
    torque: the FEET stick when tan(slope) < mu (foot-point drift at
    integration-noise level) and slide downhill when tan(slope) > mu
    (mm-to-cm drift along −x within 0.2 s). Foot positions — not the
    base — are the cone-property observable: the compliant PD lets the
    body sag while stuck feet stay planted."""
    ffm, state, q0 = _standing_hyq()
    _, _, q0_, vb0, qd0 = state
    terr = tr.slope_terrain(grade, 0.0, extent=4.0, cell=0.5,
                            dtype=jnp.float64)
    # pitch the base to match the incline (all feet then share one
    # clearance) and place it so the closest foot starts 2 mm above the
    # surface — a flat-stance init would bury the uphill feet ~15 cm deep
    th = float(np.arctan(grade))
    quat0 = jnp.asarray([np.cos(th / 2), 0.0, -np.sin(th / 2), 0.0],
                        jnp.float64)
    R0 = ff.quat_to_rot(quat0)
    feet_w = [R0 @ ct._fb_point_base(
        ffm, q0_, l, jnp.asarray(_FOOT_OFF[i], jnp.float64))[0]
        for i, l in enumerate(_FEET)]
    clear = max(float(tr.terrain_surface(terr, f[0], f[1])[0] - f[2])
                for f in feet_w)
    pos0 = jnp.array([0.0, 0.0, clear + 0.002], jnp.float64)
    state = (quat0, pos0, q0_, vb0, qd0)

    def step(s, _):
        tau = 400.0 * (q0_ - s[2]) - 25.0 * s[4]
        nxt, _ = ct.fb_step_ground(ffm, s, tau, 2e-3, _FEET, _FOOT_OFF,
                                   mu=mu, terrain=terr, iters=60,
                                   relax=0.7)
        return nxt, None

    def feet_x(s):
        R = ff.quat_to_rot(s[0])
        return np.array([float((s[1] + R @ ct._fb_point_base(
            ffm, s[2], l, jnp.asarray(_FOOT_OFF[i], jnp.float64))[0])[0])
            for i, l in enumerate(_FEET)])

    fx0 = feet_x(state)
    sT, _ = jax.lax.scan(step, state, None, length=100)
    drift = feet_x(sT) - fx0
    if slides:
        assert drift.mean() < -5e-3, f"expected foot slide, drift={drift}"
    else:
        assert np.abs(drift).max() < 1e-4, f"expected stick, drift={drift}"
        # and the robot is actually supported, not in flight
        h, _ = tr.terrain_surface(terr, sT[1][0], sT[1][1])
        assert float(sT[1][2] - h) > 0.3   # base above its local surface


@pytest.mark.mid
def test_batched_terrain_matches_single():
    """Batched stepper on a bumpy heightfield == per-state single stepper
    (mixed contact: some feet loaded, some off bumps)."""
    ffm, state, q0 = _standing_hyq()
    terr = tr.bumpy_terrain(amp=0.04, wavelength=1.1, extent=3.0,
                            cell=0.15, dtype=jnp.float64)
    rng = np.random.default_rng(7)
    B = 4
    quat0, pos0, q0_, vb0, qd0 = state
    batch = (jnp.stack([quat0] * B),
             jnp.stack([pos0 + jnp.asarray([*rng.uniform(-0.5, 0.5, 2),
                                            0.03 * i], jnp.float64)
                        for i in range(B)]),
             jnp.stack([q0_] * B) + jnp.asarray(
                 rng.uniform(-0.05, 0.05, (B, ffm.n))),
             jnp.stack([vb0] * B) + jnp.asarray(
                 rng.uniform(-0.2, 0.2, (B, 6))),
             jnp.stack([qd0] * B))
    taus = jnp.asarray(rng.normal(size=(B, ffm.n)) * 3.0)
    nb, ib = ct.fb_step_ground_batched(ffm, batch, taus, 2e-3, _FEET,
                                       _FOOT_OFF, mu=0.7, terrain=terr,
                                       iters=80, impl="xla")
    for e in range(B):
        se = tuple(x[e] for x in batch)
        ns, is_ = ct.fb_step_ground(ffm, se, taus[e], 2e-3, _FEET,
                                    _FOOT_OFF, mu=0.7, terrain=terr,
                                    iters=80)
        for xa, xb in zip(ns, (x[e] for x in nb)):
            np.testing.assert_allclose(np.asarray(xa), np.asarray(xb),
                                       atol=1e-10)
        np.testing.assert_allclose(np.asarray(is_), np.asarray(ib[e]),
                                   atol=1e-10)


@pytest.mark.mid
def test_terrain_identification_gradient():
    """d(next state)/d(node heights) through an implicit-diff contact step
    matches finite differences — the terrain-identification /
    terrain-adaptation training path."""
    ffm, state, q0 = _standing_hyq()
    terr = tr.slope_terrain(0.1, 0.0, extent=3.0, cell=0.75,
                            dtype=jnp.float64)
    tau = 300.0 * (q0 - state[2])
    rng = np.random.default_rng(11)
    w = jnp.asarray(rng.normal(size=6))

    def loss(H):
        nxt, _ = ct.fb_step_ground(ffm, state, tau, 2e-3, _FEET,
                                   _FOOT_OFF, mu=0.6,
                                   terrain=terr._replace(heights=H),
                                   iters=100, diff_mode="implicit",
                                   relax=0.7)
        return w @ nxt[3] + 5.0 * nxt[1][2]

    dH = jax.grad(loss)(terr.heights)
    nz = np.argwhere(np.abs(np.asarray(dH)) > 1e-9)
    assert len(nz) >= 4        # at least the nodes under the loaded feet
    eps = 1e-6
    for ij in nz[:6]:
        i, j = int(ij[0]), int(ij[1])
        Hp = terr.heights.at[i, j].add(eps)
        Hm = terr.heights.at[i, j].add(-eps)
        fd = (loss(Hp) - loss(Hm)) / (2 * eps)
        np.testing.assert_allclose(float(dH[i, j]), float(fd),
                                   rtol=1e-5, atol=1e-8)
