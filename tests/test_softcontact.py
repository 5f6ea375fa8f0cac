"""Compliant (soft) contact: the per-row Delassus compliance
(``softness=`` on the ground steppers; ``soft_contact_params`` spring-
damper mapping).

Validation: zero-softness plumbing is exactly the rigid solver; the
softened complementarity law holds row-by-row at the solution
(v⁺ₙ = v*ₙ − softness·λₙ for loaded contacts — the defining property of
MuJoCo/ODE-style regularized contact); impulses shrink monotonically with
compliance; fused kernels (interpret mode) match the XLA body with
softness baked per-row; gradients flow through a traced softness
(compliance identification, XLA fallback)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gridcodegenerator_tpu as g
from gridcodegenerator_tpu.models import zoo
from gridcodegenerator_tpu.ops import contact as ct
from gridcodegenerator_tpu.ops import freeflyer as ff
from gridcodegenerator_tpu.ops import md_contact as mc
from gridcodegenerator_tpu.ops.kernels import contact_fused as cf
from gridcodegenerator_tpu.ops.kernels import md_contact_fused as mcf

_FEET = (2, 5, 8, 11)
_FOFF = np.tile([0.35, 0.0, 0.0], (4, 1))
DT = 1e-3


def _stand(drop=-0.004):
    """hyq standing with gravity-comp torque, feet penetrated by |drop|."""
    from tests.test_contact import _stand_setup
    ctt, ffm, state, tau_g = _stand_setup(drop=drop)
    return ffm, state, tau_g


def test_soft_params_mapping():
    """The Catto/ODE relations: kd=0 → erp=1, softness=1/(dt²·kp);
    stiffening kp → softness → 0 (rigid limit); pure damper → erp=0."""
    dt = 2e-3
    erp, soft = g.soft_contact_params(kp=1e4, kd=0.0, dt=dt)
    assert erp == pytest.approx(1.0)
    assert soft == pytest.approx(1.0 / (dt * dt * 1e4))
    erp2, soft2 = g.soft_contact_params(kp=1e8, kd=0.0, dt=dt)
    assert soft2 < soft * 1e-3
    erp3, _ = g.soft_contact_params(kp=0.0, kd=50.0, dt=dt)
    assert erp3 == pytest.approx(0.0)


def test_zero_softness_matches_rigid():
    """softness=0.0 reproduces the rigid stepper to round-off (plumbing
    is a no-op at zero compliance)."""
    ffm, state, tau = _stand()
    nxt_r, imp_r = ct.fb_step_ground(ffm, state, tau, DT, _FEET, _FOFF)
    nxt_s, imp_s = ct.fb_step_ground(ffm, state, tau, DT, _FEET, _FOFF,
                                     softness=0.0)
    for a, b in zip(nxt_r, nxt_s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-14)
    np.testing.assert_allclose(np.asarray(imp_r), np.asarray(imp_s),
                               atol=1e-14)


def _foot_normal_vel(ffm, jac_state, vel_state, i):
    """Normal velocity of foot i: Jacobian at ``jac_state``'s
    configuration applied to ``vel_state``'s velocity. The solver's
    row law v⁺ₙ = v*ₙ − softness·λₙ holds in the PRE-step
    configuration's contact frame (the impulse solve happens before the
    integrator moves q), so post-step velocities must be measured with
    the pre-step Jacobian — using the post-step configuration picks up
    O(dt·v) drift, far above solver tolerance."""
    quat, _, q = jac_state[0], jac_state[1], jac_state[2]
    vb, qd = vel_state[3], vel_state[4]
    J = ct.fb_contact_jacobian(ffm, quat, q, _FEET, _FOFF)
    v = J @ jnp.concatenate([vb, qd])
    return float(v[3 * i + 2])


def test_soft_row_law():
    """For every loaded contact (λₙ > 0, strictly inside the cone where
    possible) the softened step satisfies v⁺ₙ = v*ₙ − softness·λₙ — and
    the rigid step v⁺ₙ = v*ₙ. The defining velocity-level law of
    regularized contact, checked end-to-end through the stepper."""
    soft = 0.05
    drop = -0.004
    ffm, state, tau = _stand(drop=drop)
    erp, rest = 0.2, 0.0
    for s_val in (None, soft):
        nxt, imp = ct.fb_step_ground(ffm, state, tau, DT, _FEET, _FOFF,
                                     erp=erp, iters=200, softness=s_val)
        gamma = 0.0 if s_val is None else s_val
        v_star = -erp * drop / DT          # all feet equally penetrated
        for i in range(4):
            lam_n = float(imp[i, 2])
            if lam_n <= 1e-10:
                continue
            vn_post = _foot_normal_vel(ffm, state, nxt, i)
            assert vn_post == pytest.approx(v_star - gamma * lam_n,
                                            abs=1e-8), (s_val, i)


def test_soft_reduces_impulse_monotonically():
    ffm, state, tau = _stand(drop=-0.006)
    total = []
    for s_val in (0.0, 0.02, 0.1, 0.5):
        _, imp = ct.fb_step_ground(ffm, state, tau, DT, _FEET, _FOFF,
                                   iters=200, softness=s_val)
        total.append(float(jnp.sum(imp[:, 2])))
    assert total[0] > total[1] > total[2] > total[3] > 0.0


def test_fused_interpret_matches_xla_soft():
    """step_ground_fused with per-row compliance literals (interpret) ==
    the XLA batch-last body with the same softness."""
    from tests.test_contact_fused import _states
    ffm = ff.free_flyer_model(g.parse_urdf(zoo.hyq(damping=0.2)),
                              dtype=jnp.float64)
    n = ffm.n
    B = 4
    quat, pos, q, vb, qd, tau = _states(n, B, seed=7)
    mus = jnp.asarray(np.random.default_rng(2).uniform(0.3, 1.0, (B, 4)))
    soft = np.array([0.03, 0.0, 0.2, 0.05])
    bl = lambda a: a.T

    nxt_r, imp_r = ct.fb_step_ground_batched(
        ffm, (quat, pos, q, vb, qd), tau, DT, _FEET, _FOFF, mu=mus,
        impl="vmap", softness=jnp.asarray(soft))
    outs = cf.step_ground_fused(
        ffm, bl(quat), bl(pos), bl(q), bl(vb), bl(qd), bl(tau), bl(mus),
        DT, _FEET, _FOFF, softness=soft, interpret=True)
    for nm, a, b in zip(("quat2", "pos2", "q2", "vb2", "qd2"), outs[:5],
                        nxt_r):
        np.testing.assert_allclose(np.asarray(a.T), np.asarray(b),
                                   atol=1e-11, err_msg=nm)
    imp_f = jnp.moveaxis(outs[5], 0, -1).reshape(B, 4, 3)
    np.testing.assert_allclose(np.asarray(imp_f), np.asarray(imp_r),
                               atol=1e-11)
    assert bool((np.asarray(imp_r)[..., 2] > 0).any())


def test_soft_grad_flows():
    """d(step)/d(softness) exists (traced softness → XLA fallback in the
    batched entry) and is nonzero when contacts are loaded."""
    ffm, state, tau = _stand(drop=-0.005)
    stB = tuple(x[None] for x in state)
    tauB = tau[None]

    def loss(s_val):
        nxt, imp = ct.fb_step_ground_batched(
            ffm, stB, tauB, DT, _FEET, _FOFF, softness=s_val,
            impl="auto")
        return jnp.sum(imp[..., 2])

    grad = jax.grad(loss)(jnp.array(0.05))
    assert bool(jnp.isfinite(grad)) and float(jnp.abs(grad)) > 0.0
    # FD cross-check
    eps = 1e-5
    fd = (loss(jnp.array(0.05 + eps)) - loss(jnp.array(0.05 - eps))) / (
        2 * eps)
    assert float(grad) == pytest.approx(float(fd), rel=1e-4)


# -------------------------------------------------------------------- md
@pytest.fixture(scope="module")
def ball_env():
    env = g.make_ground_env(zoo.ball_ant_mjcf(), dt=2e-3, iters=30,
                            dtype=jnp.float64, init_height=0.25)
    return env


def test_md_soft_zero_and_monotone(ball_env):
    env = ball_env
    mdm = env.model
    st = env.reset(1, seed=0, pos_noise=0.0, vel_noise=0.0,
                   height_noise=0.0)
    q1, qd1 = st[0][0], st[1][0]
    # drop until feet penetrate
    tau = jnp.zeros(mdm.nv)
    for _ in range(120):
        (q1, qd1), imp = mc.md_step_ground(mdm, q1, qd1, tau, 2e-3,
                                           env.feet, env.offsets)
    assert float(jnp.sum(imp[:, 2])) > 0.0
    (qa, va), imp_r = mc.md_step_ground(mdm, q1, qd1, tau, 2e-3,
                                        env.feet, env.offsets)
    (qb, vb_), imp_0 = mc.md_step_ground(mdm, q1, qd1, tau, 2e-3,
                                         env.feet, env.offsets,
                                         softness=0.0)
    np.testing.assert_allclose(np.asarray(qa), np.asarray(qb), atol=1e-14)
    np.testing.assert_allclose(np.asarray(imp_r), np.asarray(imp_0),
                               atol=1e-14)
    tot = []
    for s_val in (0.0, 0.05, 0.3):
        _, imp = mc.md_step_ground(mdm, q1, qd1, tau, 2e-3, env.feet,
                                   env.offsets, iters=120,
                                   softness=s_val)
        tot.append(float(jnp.sum(imp[:, 2])))
    assert tot[0] > tot[1] > tot[2] > 0.0


def test_md_fused_interpret_matches_xla_soft(ball_env):
    env = ball_env
    mdm = env.model
    B = 3
    st = env.reset(B, seed=3, pos_noise=0.05, vel_noise=0.2,
                   height_noise=0.0)
    q, qd = st
    tau = jnp.zeros((B, mdm.nv))
    # settle under gravity until feet actually penetrate — a fixed base
    # drop can leave every foot airborne, and a contact-free comparison
    # would not exercise the soft path at all
    for _ in range(150):
        (q, qd), imp_s = mc.md_step_ground_batched(
            mdm, q, qd, tau, 2e-3, env.feet, env.offsets, impl="vmap")
    assert bool((np.asarray(imp_s)[..., 2] > 0).any())
    soft = 0.04
    (q_r, v_r), imp_r = mc.md_step_ground_batched(
        mdm, q, qd, tau, 2e-3, env.feet, env.offsets, impl="vmap",
        softness=soft)
    q_f, v_f, imp_f = mcf.md_step_ground_fused(
        mdm, q.T, qd.T, tau.T,
        jnp.broadcast_to(jnp.asarray(0.8, q.dtype), (len(env.feet), B)),
        2e-3, env.feet, np.asarray(env.offsets, np.float64),
        softness=soft, interpret=True)
    np.testing.assert_allclose(np.asarray(q_f.T), np.asarray(q_r),
                               atol=1e-11)
    np.testing.assert_allclose(np.asarray(v_f.T), np.asarray(v_r),
                               atol=1e-10)
    kt = imp_f.shape[0] // 3
    np.testing.assert_allclose(
        np.asarray(jnp.moveaxis(imp_f, 0, -1).reshape(B, kt, 3)),
        np.asarray(imp_r), atol=1e-11)
    assert bool((np.asarray(imp_r)[..., 2] > 0).any())
