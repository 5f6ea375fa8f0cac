"""Native C++ oracle vs the NumPy golden model — two fully independent
implementations of the same algorithms must agree to float64 precision."""

import shutil

import numpy as np
import pytest

from conftest import get_setup, random_state

pytestmark = pytest.mark.skipif(shutil.which("g++") is None,
                                reason="no C++ compiler")


@pytest.fixture(params=["iiwa14", "hyq", "chain5p", "rand12"])
def oracle_setup(request):
    from gridcodegenerator_tpu.utils.native import NativeOracle
    desc, gold, model = get_setup(request.param)
    return desc, gold, NativeOracle(desc)


def test_native_rnea(oracle_setup):
    desc, gold, orc = oracle_setup
    q, qd, qdd = random_state(desc.n, seed=91)
    np.testing.assert_allclose(orc.rnea(q, qd, qdd),
                               gold.rnea(q, qd, qdd)[0], atol=1e-11)
    np.testing.assert_allclose(orc.rnea(q, qd, None),
                               gold.rnea(q, qd, None)[0], atol=1e-11)


def test_native_minv(oracle_setup):
    desc, gold, orc = oracle_setup
    q, _, _ = random_state(desc.n, seed=92)
    np.testing.assert_allclose(orc.minv(q), gold.minv(q, True), atol=1e-11)


def test_native_fd(oracle_setup):
    desc, gold, orc = oracle_setup
    q, qd, u = random_state(desc.n, seed=93)
    np.testing.assert_allclose(orc.fd(q, qd, u), gold.fd(q, qd, u), atol=1e-10)


def test_native_fd_grad(oracle_setup):
    desc, gold, orc = oracle_setup
    q, qd, u = random_state(desc.n, seed=94)
    np.testing.assert_allclose(orc.fd_grad(q, qd, u), gold.fd_grad(q, qd, u),
                               atol=1e-9)


def test_native_gravity_variants(oracle_setup):
    desc, gold, orc = oracle_setup
    q, qd, u = random_state(desc.n, seed=95)
    for grav in (0.0, -3.72):
        np.testing.assert_allclose(orc.fd(q, qd, u, gravity=grav),
                                   gold.fd(q, qd, u, grav), atol=1e-10)


def test_native_freeflyer_oracle():
    """Free-flyer FD vs the independent C++ oracle (fourth opinion beside
    the Euler-chain cross-check, physics invariants, and autodiff)."""
    import jax.numpy as jnp

    import gridcodegenerator_tpu as g
    from gridcodegenerator_tpu.models import zoo
    from gridcodegenerator_tpu.utils.native import NativeOracle

    from gridcodegenerator_tpu.models.urdf import rpy_to_matrix
    from gridcodegenerator_tpu.ops import freeflyer as ff

    desc = g.parse_urdf(zoo.iiwa14(damping=0.1))
    ffm = ff.free_flyer_model(desc, dtype=jnp.float64)
    oracle = NativeOracle(desc)
    rng = np.random.default_rng(31)
    for k in range(4):
        quat = np.asarray(
            ff.rot_to_quat(jnp.asarray(rpy_to_matrix(rng.uniform(-2.5, 2.5, 3)))))
        q = rng.uniform(-1.5, 1.5, desc.n)
        vb = rng.uniform(-1, 1, 6)
        qd = rng.uniform(-1, 1, desc.n)
        tau = rng.uniform(-5, 5, desc.n)
        dvb_j, qdd_j = ff.fb_forward_dynamics(
            ffm, jnp.asarray(quat), jnp.asarray(q), jnp.asarray(vb),
            jnp.asarray(qd), jnp.asarray(tau))
        dvb_o, qdd_o = oracle.fb_fd(quat, q, vb, qd, tau)
        np.testing.assert_allclose(np.asarray(dvb_j), dvb_o, atol=1e-10)
        np.testing.assert_allclose(np.asarray(qdd_j), qdd_o, atol=1e-10)


@pytest.mark.parametrize("robot", ["ball", "free", "mixed", "free_atlas"])
def test_native_md_oracle(robot):
    """The generalized C++ oracle (grid_md_id / grid_md_fd — spherical +
    in-tree floating joints, quaternion coordinates) vs the JAX md
    implementation: two independent float64 implementations of the
    generalized RNEA/CRBA/FD must agree to roundoff."""
    import jax
    import jax.numpy as jnp

    import gridcodegenerator_tpu as g
    from gridcodegenerator_tpu.models import zoo
    from gridcodegenerator_tpu.ops import multidof as md
    from gridcodegenerator_tpu.utils.native import NativeMdOracle

    urdf = {
        "ball": lambda: zoo.ball_arm(damping=0.1),
        "free": lambda: zoo.with_free_joint(zoo.iiwa14(damping=0.1)),
        "mixed": lambda: zoo.serial_chain(5, damping=0.1, prismatic_every=2),
        "free_atlas": lambda: zoo.with_free_joint(zoo.atlas(damping=0.05)),
    }[robot]()
    mdl = md.multidof_model_from_description(g.parse_urdf(urdf),
                                             dtype=jnp.float64)
    orc = NativeMdOracle(mdl)
    nv = mdl.nv
    rng = np.random.default_rng(97)
    for k in range(3):
        q = md.md_tangent_apply(mdl, jnp.asarray(md.neutral_q(mdl)),
                                jnp.asarray(rng.uniform(-0.6, 0.6, nv)))
        qd = rng.uniform(-0.8, 0.8, nv)
        u = rng.uniform(-6, 6, nv)
        tau_py = np.asarray(md.md_inverse_dynamics(
            mdl, q, jnp.asarray(qd), jnp.asarray(u)))
        np.testing.assert_allclose(orc.md_id(np.asarray(q), qd, u), tau_py,
                                   atol=1e-11 * max(1, np.abs(tau_py).max()))
        np.testing.assert_allclose(
            orc.md_id(np.asarray(q), qd, None),
            np.asarray(md.md_inverse_dynamics(mdl, q, jnp.asarray(qd))),
            atol=1e-9)
        fd_py = np.asarray(md.md_forward_dynamics(
            mdl, q, jnp.asarray(qd), jnp.asarray(u)))
        np.testing.assert_allclose(orc.md_fd(np.asarray(q), qd, u), fd_py,
                                   atol=1e-11 * max(1, np.abs(fd_py).max()))


def test_native_ground_step_oracle():
    """One frictional ground step vs the independent C++ contact oracle
    (FK, Delassus, PGS cone projection, manifold integration — all
    re-derived in plain C++): the fourth opinion for the contact layer
    beside the physics invariants, the batched-equals-single check, and
    the fused-kernel equivalence. Covers active, separated, and sliding
    contact regimes."""
    import jax.numpy as jnp

    import gridcodegenerator_tpu as g
    from gridcodegenerator_tpu.models import zoo
    from gridcodegenerator_tpu.ops import contact as ctt
    from gridcodegenerator_tpu.ops import freeflyer as ff
    from gridcodegenerator_tpu.utils.native import NativeOracle

    desc = g.parse_urdf(zoo.hyq(damping=0.2))
    ffm = ff.free_flyer_model(desc, dtype=jnp.float64)
    oracle = NativeOracle(desc)
    feet = (2, 5, 8, 11)
    offs = np.tile(np.array([0.35, 0.0, 0.0]), (4, 1))
    rng = np.random.default_rng(77)
    # three heights: deep contact, grazing (margin-sensitive), airborne
    for base_z, vxy in ((0.48, 0.8), (0.55, 0.0), (0.9, 0.0)):
        quat = np.array([1.0, 0.0, 0.0, 0.0])
        quat += 0.05 * rng.standard_normal(4)
        quat /= np.linalg.norm(quat)
        pos = np.array([0.0, 0.0, base_z])
        q = 0.2 * rng.standard_normal(desc.n)
        vb = np.concatenate([0.2 * rng.standard_normal(3),
                             [vxy, -vxy, -0.5]])
        qd = 0.3 * rng.standard_normal(desc.n)
        tau = 2.0 * rng.standard_normal(desc.n)
        state = (quat, pos, q, vb, qd)
        nxt_j, imp_j = ctt.fb_step_ground(
            ffm, tuple(jnp.asarray(s) for s in state), jnp.asarray(tau),
            1e-3, feet, offs, mu=0.7, iters=50)
        nxt_o, imp_o = oracle.fb_step_ground(
            state, tau, 1e-3, feet, offs, mu=0.7, iters=50)
        for a, b, name in zip(nxt_j, nxt_o,
                              ("quat", "pos", "q", "vb", "qd")):
            np.testing.assert_allclose(np.asarray(a), b, atol=1e-9,
                                       err_msg=name)
        np.testing.assert_allclose(np.asarray(imp_j), imp_o, atol=1e-9)


def test_native_stance_oracle():
    """Stance-phase free-flyer FD vs the independent C++ oracle. The
    oracle computes the contact bias J̇·v analytically (moving-base
    spatial sweep + classical-acceleration conversion) where the engine
    uses an exact jvp along the state flow — agreement validates both
    formulations. Baumgarte position/velocity terms and world anchors
    included."""
    import jax.numpy as jnp

    import gridcodegenerator_tpu as g
    from gridcodegenerator_tpu.models import zoo
    from gridcodegenerator_tpu.ops import contact as ctt
    from gridcodegenerator_tpu.ops import freeflyer as ff
    from gridcodegenerator_tpu.utils.native import NativeOracle

    desc = g.parse_urdf(zoo.hyq(damping=0.2))
    ffm = ff.free_flyer_model(desc, dtype=jnp.float64)
    oracle = NativeOracle(desc)
    feet = (2, 5, 8, 11)
    offs = np.tile(np.array([0.35, 0.0, 0.0]), (4, 1))
    rng = np.random.default_rng(55)
    for trial in range(3):
        quat = np.array([1.0, 0.0, 0.0, 0.0]) + 0.1 * rng.standard_normal(4)
        quat /= np.linalg.norm(quat)
        pos = np.array([0.0, 0.0, 0.55]) + 0.05 * rng.standard_normal(3)
        q = 0.3 * rng.standard_normal(desc.n)
        vb = 0.4 * rng.standard_normal(6)
        qd = 0.5 * rng.standard_normal(desc.n)
        tau = 3.0 * rng.standard_normal(desc.n)
        # anchors slightly off the current foot positions → nonzero β term
        R = np.asarray(ff.quat_to_rot(jnp.asarray(quat)))
        anchors = np.stack([
            pos + R @ np.asarray(ctt._fb_point_base(
                ffm, jnp.asarray(q), l, jnp.asarray(offs[i]))[0])
            + 0.01 * rng.standard_normal(3)
            for i, l in enumerate(feet)])
        bg = (1.5, 8.0)
        dvb_j, qdd_j, lam_j = ctt.fb_constrained_forward_dynamics(
            ffm, jnp.asarray(quat), jnp.asarray(pos), jnp.asarray(q),
            jnp.asarray(vb), jnp.asarray(qd), jnp.asarray(tau), feet, offs,
            anchors=anchors, baumgarte=bg, reg=1e-10)
        dvb_o, qdd_o, lam_o = oracle.fb_stance(
            quat, pos, q, vb, qd, tau, feet, offs, anchors=anchors,
            baumgarte=bg, reg=1e-10)
        np.testing.assert_allclose(np.asarray(dvb_j), dvb_o, atol=1e-8)
        np.testing.assert_allclose(np.asarray(qdd_j), qdd_o, atol=1e-8)
        np.testing.assert_allclose(np.asarray(lam_j), lam_o, atol=1e-7)
