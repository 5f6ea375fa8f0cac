"""Domain randomization (utils/randomize.py): per-environment model
parameters through the vmap lift — exact vs per-env single models,
differentiable in the factors, composable with the free-flyer stack and the
ground stepper."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gridcodegenerator_tpu as g
from gridcodegenerator_tpu.models import zoo
from gridcodegenerator_tpu.ops import fd as fd_ops
from gridcodegenerator_tpu.ops import rnea as rnea_ops
from gridcodegenerator_tpu.utils import randomize as rz

jax.config.update("jax_enable_x64", True)


@pytest.fixture(scope="module")
def iiwa():
    return g.load_robot(zoo.iiwa14(damping=0.1), dtype=jnp.float64)


def test_randomized_fd_matches_per_env_models(iiwa):
    model = iiwa
    n = model.n
    B = 6
    key = jax.random.PRNGKey(0)
    mb = rz.randomize_model(model, key, B, inertia_scale=0.3,
                            damping_scale=0.5, armature_scale=0.0)
    # armature_scale=0 leaves that leaf unbatched
    assert mb.inertia.shape == (B, n, 6, 6)
    assert mb.damping.shape == (B, n)
    assert mb.armature.shape == (n,)

    rng = np.random.default_rng(1)
    q, qd, u = (jnp.asarray(rng.uniform(-1, 1, (B, n))) for _ in range(3))
    fd_b = rz.vmap_model(fd_ops.forward_dynamics, mb, model)
    qdd = fd_b(q, qd, u)
    assert qdd.shape == (B, n)
    for k in range(B):
        mk = dataclasses.replace(model, inertia=mb.inertia[k],
                                 damping=mb.damping[k])
        ref = fd_ops.forward_dynamics(mk, q[k], qd[k], u[k])
        np.testing.assert_allclose(np.asarray(qdd[k]), np.asarray(ref),
                                   atol=1e-12)


def test_factor_gradients_flow(iiwa):
    """System-identification shape: d(loss)/d(per-link mass factors) through
    the vmap lift is finite and matches finite differences."""
    model = iiwa
    n = model.n
    B = 3
    rng = np.random.default_rng(2)
    q, qd, u = (jnp.asarray(rng.uniform(-1, 1, (B, n))) for _ in range(3))

    def loss(factors):
        mb = rz.scale_links(model, inertia_factors=factors)
        qdd = rz.vmap_model(fd_ops.forward_dynamics, mb, model)(q, qd, u)
        return jnp.sum(qdd ** 2)

    f0 = jnp.ones((B, n)) + 0.05
    grad = jax.grad(loss)(f0)
    assert bool(jnp.isfinite(grad).all())
    e = 1e-6
    d = jnp.zeros((B, n)).at[1, 3].set(1.0)
    fd_est = (loss(f0 + e * d) - loss(f0 - e * d)) / (2 * e)
    np.testing.assert_allclose(float(jnp.vdot(grad, d)), float(fd_est),
                               rtol=1e-5)


def test_energy_consistency_under_scaling(iiwa):
    """Uniform density scaling by f multiplies gravity torques by exactly f
    (RNEA at zero velocity is linear in the inertia)."""
    model = iiwa
    n = model.n
    q = jnp.asarray(np.random.default_rng(3).uniform(-1, 1, n))
    z = jnp.zeros(n)
    c1 = rnea_ops.inverse_dynamics(model, q, z, z)
    m2 = rz.scale_links(model, inertia_factors=jnp.full(n, 1.7))
    c2 = rnea_ops.inverse_dynamics(m2, q, z, z)
    np.testing.assert_allclose(np.asarray(c2), 1.7 * np.asarray(c1),
                               rtol=1e-12, atol=1e-13)


def test_freeflyer_randomization():
    """Per-env arm inertia + base inertia on the free-flyer through the same
    generic lift (any registered model pytree)."""
    from gridcodegenerator_tpu.ops import freeflyer as ff

    desc = g.parse_urdf(zoo.hyq(damping=0.2))
    ffm = ff.free_flyer_model(desc, dtype=jnp.float64)
    n = ffm.n
    B = 4
    key = jax.random.PRNGKey(5)
    f_arm = 1.0 + 0.2 * jax.random.uniform(key, (B, n), jnp.float64,
                                           -1.0, 1.0)
    f_base = 1.0 + 0.2 * jax.random.uniform(
        jax.random.split(key)[0], (B,), jnp.float64, -1.0, 1.0)
    ffm_b = dataclasses.replace(
        ffm, arm=rz.scale_links(ffm.arm, inertia_factors=f_arm),
        I_base=ffm.I_base * f_base[:, None, None])

    rng = np.random.default_rng(6)
    quat = rng.normal(size=(B, 4))
    quat = jnp.asarray(quat / np.linalg.norm(quat, axis=1, keepdims=True))
    q = jnp.asarray(rng.uniform(-0.5, 0.5, (B, n)))
    vb = jnp.asarray(rng.uniform(-1, 1, (B, 6)))
    qd = jnp.asarray(rng.uniform(-1, 1, (B, n)))
    tau = jnp.asarray(rng.uniform(-5, 5, (B, n)))

    fd_b = rz.vmap_model(ff.fb_forward_dynamics, ffm_b, ffm)
    dvb, qdd = fd_b(quat, q, vb, qd, tau)
    assert dvb.shape == (B, 6) and qdd.shape == (B, n)
    for k in (0, B - 1):
        fk = dataclasses.replace(
            ffm, arm=rz.scale_links(ffm.arm, inertia_factors=f_arm[k]),
            I_base=ffm.I_base * f_base[k])
        r0, r1 = ff.fb_forward_dynamics(fk, quat[k], q[k], vb[k], qd[k],
                                        tau[k])
        np.testing.assert_allclose(np.asarray(dvb[k]), np.asarray(r0),
                                   atol=1e-12)
        np.testing.assert_allclose(np.asarray(qdd[k]), np.asarray(r1),
                                   atol=1e-12)


def test_randomized_ground_stepper():
    """The RL shape end-to-end: per-env masses AND per-env friction in one
    vmapped frictional ground step; matches per-env single steps."""
    from gridcodegenerator_tpu.ops import contact as ct
    from gridcodegenerator_tpu.ops import freeflyer as ff

    desc = g.parse_urdf(zoo.serial_chain(3, damping=0.1))
    ffm = ff.free_flyer_model(desc, dtype=jnp.float64)
    n = ffm.n
    links, offs = (n - 1,), np.asarray([[0.1, 0.0, 0.0]])
    B = 4
    key = jax.random.PRNGKey(9)
    f_arm = 1.0 + 0.3 * jax.random.uniform(key, (B, n), jnp.float64,
                                           -1.0, 1.0)
    ffm_b = dataclasses.replace(
        ffm, arm=rz.scale_links(ffm.arm, inertia_factors=f_arm))
    rng = np.random.default_rng(10)
    quat = rng.normal(size=(B, 4))
    quat = jnp.asarray(quat / np.linalg.norm(quat, axis=1, keepdims=True))
    state = (quat,
             jnp.asarray(rng.uniform(-0.1, 0.1, (B, 3)) + [0, 0, 0.05]),
             jnp.asarray(rng.uniform(-0.5, 0.5, (B, n))),
             jnp.asarray(rng.uniform(-0.5, 0.5, (B, 6))),
             jnp.asarray(rng.uniform(-0.5, 0.5, (B, n))))
    tau = jnp.asarray(rng.uniform(-3, 3, (B, n)))
    mus = jnp.asarray(rng.uniform(0.3, 1.0, B))

    def step1(fm, st, ta, mu):
        return ct.fb_step_ground(fm, st, ta, 1e-3, links, offs, mu=mu)

    step_b = rz.vmap_model(step1, ffm_b, ffm)
    nxt, imp = step_b(state, tau, mus)
    assert imp.shape == (B, 1, 3)
    touched = 0
    for k in range(B):
        fk = dataclasses.replace(
            ffm, arm=rz.scale_links(ffm.arm, inertia_factors=f_arm[k]))
        s_r, i_r = step1(fk, tuple(x[k] for x in state), tau[k], mus[k])
        for a, b in zip(nxt, s_r):
            np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b),
                                       atol=1e-11)
        touched += int(np.abs(np.asarray(i_r)).max() > 1e-9)
    assert touched, "no environment touched the ground — vacuous"
