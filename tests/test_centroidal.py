"""Centroidal dynamics (``ops/centroidal.py``): CoM via the
potential-energy/RNEA consistency, the CMM against an independent
point-mechanics formulation, momentum conservation on the free flyer.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gridcodegenerator_tpu as g
from gridcodegenerator_tpu.models import zoo
from gridcodegenerator_tpu.ops import centroidal as cd
from gridcodegenerator_tpu.ops import freeflyer as ff
from gridcodegenerator_tpu.ops.kinematics import fk, world_jacobian

from conftest import get_setup, random_state


@pytest.mark.parametrize("name", ["iiwa14", "barm", "chain5p"])
def test_com_gravity_consistency(name):
    """∂V/∂q with V = −Σ mᵢ g⃗·xᵢ = 9.81·M·com_z must equal the RNEA
    gravity torque c(q, 0, 0) — validates the mass/CoM extraction and FK
    against the dynamics path (damping is inert at q̇ = 0)."""
    desc, _, model = get_setup(name)
    q, _, _ = (jnp.asarray(a) for a in random_state(desc.n, seed=2))
    M = cd.total_mass(model)

    def V(q_):
        return 9.81 * M * cd.com(model, q_)[2]

    tau_g = g.bias_force(model, q, jnp.zeros(desc.n), impl="vmap")
    np.testing.assert_allclose(np.asarray(jax.grad(V)(q)),
                               np.asarray(tau_g), atol=1e-10)


@pytest.mark.parametrize("name", ["iiwa14", "barm", "chain5p"])
def test_cmm_vs_point_mechanics(name):
    """A_G·q̇ against a fully independent formulation: per-link world twists
    from the world Jacobians, point-mechanics momentum about the CoM
    (κ = Σ R Ī_c Rᵀ ω + (x_c − x_G) × m v_c, l = Σ m v_c)."""
    desc, _, model = get_setup(name)
    n = desc.n
    q, qd, _ = (jnp.asarray(a) for a in random_state(n, seed=7))
    h = np.asarray(cd.centroidal_momentum(model, q, qd))

    m, c = (np.asarray(a) for a in cd.link_mass_com(model))
    I6 = np.asarray(model.inertia)
    R, p = (np.asarray(a) for a in fk(model, q))
    x_c = p + np.einsum("nij,nj->ni", R, c)
    x_g = np.asarray(cd.com(model, q))
    kappa = np.zeros(3)
    lin = np.zeros(3)
    for i in range(n):
        tw = np.asarray(world_jacobian(model, q, i, jnp.zeros(3)) @ qd)
        w, v_o = tw[:3], tw[3:]
        v_c = v_o + np.cross(w, x_c[i] - p[i])
        C = np.array([[0, -c[i, 2], c[i, 1]], [c[i, 2], 0, -c[i, 0]],
                      [-c[i, 1], c[i, 0], 0]])
        Ibar_c = I6[i, :3, :3] - m[i] * (C @ C.T)   # about the link CoM
        kappa += R[i] @ Ibar_c @ R[i].T @ w \
            + np.cross(x_c[i] - x_g, m[i] * v_c)
        lin += m[i] * v_c
    np.testing.assert_allclose(h[:3], kappa, atol=1e-10)
    np.testing.assert_allclose(h[3:], lin, atol=1e-10)
    # linear block doubles as M·v_com
    vcom = jax.jvp(lambda q_: cd.com(model, q_), (q,), (qd,))[1]
    np.testing.assert_allclose(h[3:],
                               float(cd.total_mass(model)) * np.asarray(vcom),
                               atol=1e-10)


def test_cmm_bias_finite_difference():
    """Ȧ_G·q̇ against a central finite difference of h_G along the flow
    q(t) = q + t·q̇ (independent of the jvp that implements it)."""
    desc, _, model = get_setup("iiwa14")
    q, qd, _ = (jnp.asarray(a) for a in random_state(desc.n, seed=13))
    hdot = np.asarray(cd.centroidal_momentum_bias(model, q, qd))
    eps = 1e-6
    hp = np.asarray(cd.centroidal_momentum(model, q + eps * qd, qd))
    hm = np.asarray(cd.centroidal_momentum(model, q - eps * qd, qd))
    np.testing.assert_allclose(hdot, (hp - hm) / (2 * eps),
                               atol=1e-6, rtol=1e-6)


def _fb_setup(seed=3):
    desc = g.parse_urdf(zoo.iiwa14(damping=0.0))
    ffm = ff.free_flyer_model(desc, dtype=jnp.float64)
    rng = np.random.default_rng(seed)
    quat = jnp.asarray(rng.standard_normal(4))
    quat = quat / jnp.linalg.norm(quat)
    pos = jnp.asarray(rng.standard_normal(3))
    q = jnp.asarray(rng.uniform(-1, 1, desc.n))
    vb = jnp.asarray(rng.uniform(-1, 1, 6))
    qd = jnp.asarray(rng.uniform(-1, 1, desc.n))
    return desc, ffm, quat, pos, q, vb, qd


def test_fb_cmm_vs_mass_matrix():
    """Free-flyer CMM (composite sweep + world shift) against the
    independent mass-matrix identity: the top 6 rows of M_ff·[v_b; q̇] are
    the momentum about the base origin in base coords — rotate to world and
    shift to the CoM."""
    desc, ffm, quat, pos, q, vb, qd = _fb_setup()
    h = np.asarray(cd.fb_centroidal_momentum(ffm, quat, pos, q, vb, qd))
    X = ffm.arm.joint_transforms(q)
    M = ff.fb_mass_matrix(ffm, X)
    h_b = np.asarray(M[:6, :] @ jnp.concatenate([vb, qd]))
    R = np.asarray(ff.quat_to_rot(quat))
    x_g = np.asarray(cd.fb_com(ffm, quat, pos, q))
    lin = R @ h_b[3:]
    kappa = R @ h_b[:3] + np.cross(np.asarray(pos) - x_g, lin)
    np.testing.assert_allclose(h[:3], kappa, atol=1e-10)
    np.testing.assert_allclose(h[3:], lin, atol=1e-10)


def test_fb_momentum_about_com_under_gravity():
    """Uniform gravity exerts zero torque about the CoM: over a zero-torque
    tumble with gravity on, κ_G is conserved and l follows M·g⃗·t exactly
    (the centroidal statement of the free-flyer conservation tests)."""
    desc, ffm, quat, pos, q, vb, qd = _fb_setup(seed=5)
    n = desc.n
    T, dt = 400, 1e-3
    state0 = (quat, pos, q, vb, qd)
    _, traj = jax.jit(lambda s: ff.fb_simulate(
        ffm, s, jnp.zeros((T, n)), dt, gravity=-9.81, integrator="rk4"))(state0)
    h0 = np.asarray(cd.fb_centroidal_momentum(ffm, *state0))
    m_tot = float(cd.total_mass(ffm.arm)
                  + jnp.einsum("ii->", ffm.I_base[3:, 3:]) / 3.0)
    for k in (T // 2 - 1, T - 1):
        st = tuple(a[k] for a in traj)
        h = np.asarray(cd.fb_centroidal_momentum(ffm, *st))
        t = dt * (k + 1)
        np.testing.assert_allclose(h[:3], h0[:3], atol=5e-6)
        np.testing.assert_allclose(
            h[3:], h0[3:] + np.array([0, 0, -9.81]) * m_tot * t, atol=5e-6)


def test_centroidal_batched_matches_single(robot):
    """The batch-last production forms (``cmm_bl`` etc., via the
    ``*_batched`` wrappers) equal the single-state trace on every robot."""
    desc, _, model = robot
    n = desc.n
    rng = np.random.default_rng(13)
    B = 4
    q = jnp.asarray(rng.uniform(-1.5, 1.5, (B, n)))
    qd = jnp.asarray(rng.uniform(-1.0, 1.0, (B, n)))
    A_ref = jnp.stack([cd.centroidal_momentum_matrix(model, q[b])
                       for b in range(B)])
    np.testing.assert_allclose(
        np.asarray(cd.centroidal_momentum_matrix_batched(model, q)),
        np.asarray(A_ref), atol=1e-12)
    h_ref = jnp.stack([cd.centroidal_momentum(model, q[b], qd[b])
                       for b in range(B)])
    np.testing.assert_allclose(
        np.asarray(cd.centroidal_momentum_batched(model, q, qd)),
        np.asarray(h_ref), atol=1e-12)
    hd_ref = jnp.stack([cd.centroidal_momentum_bias(model, q[b], qd[b])
                        for b in range(B)])
    np.testing.assert_allclose(
        np.asarray(cd.centroidal_momentum_bias_batched(model, q, qd)),
        np.asarray(hd_ref), atol=1e-12)
    x_ref = jnp.stack([cd.com(model, q[b]) for b in range(B)])
    np.testing.assert_allclose(np.asarray(cd.com_batched(model, q)),
                               np.asarray(x_ref), atol=1e-12)
