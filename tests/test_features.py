"""Feature-parity subsystems: AOT compile/export (the gen_all_code analog),
step-matched debug traces (DEBUG_MODE analog), floating-base robots,
trajectory rollout and linearization."""

import io
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gridcodegenerator_tpu as g
from conftest import get_setup, random_state
from gridcodegenerator_tpu.models import zoo
from gridcodegenerator_tpu.utils import debug as dbg
from gridcodegenerator_tpu.utils import rollout


# ------------------------------------------------------------ codegen / AOT
def test_compile_robot(iiwa):
    desc, gold, model = iiwa
    model32 = model.astype(jnp.float32)
    cr = g.compile_robot(model32, batch_sizes=(8,),
                         algorithms=("forward_dynamics", "bias_force"),
                         impl="vmap")
    q, qd, u = (jnp.asarray(x, jnp.float32)
                for x in random_state(desc.n, seed=81, batch=(8,)))
    qdd = np.asarray(cr.forward_dynamics(q, qd, u))
    ref = np.asarray(g.forward_dynamics(model32, q, qd, u, impl="vmap"))
    np.testing.assert_allclose(qdd, ref, atol=1e-6)
    with pytest.raises(KeyError):
        cr.forward_dynamics(q[:4], qd[:4], u[:4])  # batch not compiled


def test_export_roundtrip(tmp_path, iiwa):
    desc, gold, model = iiwa
    model32 = model.astype(jnp.float32)
    path = os.fspath(tmp_path / "iiwa14.grid")
    g.export_robot(model32, path, batch_sizes=(4,),
                   algorithms=("forward_dynamics_gradient",), impl="vmap")
    loaded = g.load_exported(path)
    assert loaded.meta["n"] == 7
    q, qd, u = (jnp.asarray(x, jnp.float32)
                for x in random_state(desc.n, seed=82, batch=(4,)))
    got = np.asarray(loaded.forward_dynamics_gradient(q, qd, u))
    ref = np.asarray(g.forward_dynamics_gradient(model32, q, qd, u, impl="vmap"))
    np.testing.assert_allclose(got, ref, atol=1e-6)
    with pytest.raises(AttributeError):
        loaded.direct_minv(q)  # not exported


# ------------------------------------------------------- debug instrumentation
def test_debug_traces_match(iiwa):
    """Golden and traced-JAX stage prints are line-for-line diffable
    (the reference's DEBUG_MODE contract, SURVEY.md §4.3)."""
    desc, gold, model = iiwa
    q, qd, qdd = random_state(desc.n, seed=83)
    lines = []
    dbg.golden_rnea_trace(desc, q, qd, qdd, printer=lambda s: lines.append(s))
    assert len(lines) == 2 * desc.n + desc.n + (desc.n - 1) + 1
    assert lines[0].startswith("v[0] = ")
    assert lines[-1].startswith("c = ")
    # golden stage values agree with the golden model's final outputs
    c_ref, *_ = gold.rnea(q, qd, qdd)
    c_line = np.array([float(x) for x in lines[-1].split("=")[1].split()])
    np.testing.assert_allclose(c_line, c_ref, rtol=1e-5, atol=1e-8)
    # the traced version runs under jit and prints the same labels
    import contextlib, io as _io
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        out = jax.jit(lambda a, b, c: dbg.jax_rnea_trace(model, a, b, c))(
            jnp.asarray(q), jnp.asarray(qd), jnp.asarray(qdd))
        jax.block_until_ready(out)
        jax.effects_barrier()
    jlines = [l for l in buf.getvalue().splitlines() if l.strip()]
    assert len(jlines) == len(lines)
    assert [l.split("=")[0] for l in jlines] == [l.split("=")[0] for l in lines]


def test_rnea_grad_debug_traces_match(iiwa):
    """∂ID stage-level instrumentation (VERDICT r3 missing #1): the
    golden trace prints EVERY intermediate gradient tensor
    (rnea_grad_inner's stages, the reference ``test_rnea_grad_inner``
    contract, ``_test.py:229-488``), the traced-JAX version prints the
    identical labels from inside jit, and the two streams agree line by
    line — numerically, not just structurally."""
    desc, gold, model = iiwa
    n = desc.n
    q, qd, qdd = random_state(n, seed=87)
    lines = []
    dq_t, dqd_t = dbg.golden_rnea_grad_trace(
        desc, q, qd, qdd, printer=lambda s: lines.append(s))
    # 15 per-joint stage rows + the two extracted matrices
    assert len(lines) == 15 * n + 2
    assert lines[0].startswith("Iv[0] = ")
    assert lines[-1].startswith("dc_dqd = ")
    # the trace's outputs ARE the public golden gradient
    dq_ref, dqd_ref = gold.rnea_grad(q, qd, qdd)
    np.testing.assert_allclose(dq_t, dq_ref, atol=0)
    np.testing.assert_allclose(dqd_t, dqd_ref, atol=0)

    import contextlib
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out = jax.jit(lambda a, b, c: dbg.jax_rnea_grad_trace(
            model, a, b, c))(jnp.asarray(q), jnp.asarray(qd),
                             jnp.asarray(qdd))
        jax.block_until_ready(out)
        jax.effects_barrier()
    jlines = [ln for ln in buf.getvalue().splitlines() if ln.strip()]
    assert len(jlines) == len(lines)
    assert ([ln.split("=")[0] for ln in jlines]
            == [ln.split("=")[0] for ln in lines])
    for gl, jl in zip(lines, jlines):
        gv = np.array([float(x) for x in gl.split("= ")[1].split()])
        jv = np.array([float(x) for x in jl.split("= ")[1].split()])
        scale = max(1.0, np.abs(gv).max())
        np.testing.assert_allclose(jv, gv, atol=1e-5 * scale,
                                   err_msg=gl.split("=")[0])
    # and the jitted trace returns the gradient itself
    np.testing.assert_allclose(np.asarray(out[0]), dq_ref, atol=1e-9)
    np.testing.assert_allclose(np.asarray(out[1]), dqd_ref, atol=1e-9)


def test_minv_pass_split(iiwa):
    """minv_bpass/minv_fpass are separately callable stages whose
    composition is exactly minv (reference ``test_minv_bpass``/
    ``test_minv_fpass``, ``_test.py:117,186``); the bpass state carries
    the diagonal D⁻¹ (``Minv[i,i] = Dinv[i]`` before the forward
    sweep)."""
    desc, gold, model = iiwa
    n = desc.n
    q, _, _ = random_state(n, seed=88)
    Minv_b, F, U, Dinv = gold.minv_bpass(q)
    assert F.shape == (n, 6, n) and U.shape == (n, 6)
    np.testing.assert_allclose(np.diag(Minv_b), Dinv, atol=0)
    Minv_u = gold.minv_fpass(q, Minv_b, F, U, Dinv)
    iu = np.triu_indices(n, 1)
    Minv_u[(iu[1], iu[0])] = Minv_u[iu]
    np.testing.assert_allclose(Minv_u, gold.minv(q, dense=True), atol=0)
    # and against the jitted engine
    np.testing.assert_allclose(Minv_u, np.asarray(g.direct_minv(model, q)),
                               atol=1e-9)


def test_parity_report(iiwa):
    desc, gold, model = iiwa
    q, qd, u = random_state(desc.n, seed=84)
    out = dbg.parity_report(desc, model, jnp.asarray(q), jnp.asarray(qd),
                            jnp.asarray(u), printer=lambda s: None)
    assert all(v < 1e-9 for v in out.values())


# --------------------------------------------------------------- floating base
def test_floating_base_parity():
    urdf = zoo.with_floating_base(zoo.hyq(damping=0.1))
    desc = g.parse_urdf(urdf)
    assert desc.n == 18  # 6 floating + 12 leg joints
    assert desc.joint_types[:3] == ("prismatic",) * 3
    gold = g.GoldenDynamics(desc)
    model = g.robot_model_from_description(desc, dtype=jnp.float64)
    q, qd, u = random_state(desc.n, seed=85)
    got = np.asarray(g.forward_dynamics(model, jnp.asarray(q), jnp.asarray(qd),
                                        jnp.asarray(u)))
    np.testing.assert_allclose(got, gold.fd(q, qd, u), atol=1e-9)
    J = np.asarray(g.forward_dynamics_gradient(
        model, jnp.asarray(q), jnp.asarray(qd), jnp.asarray(u)))
    np.testing.assert_allclose(J, gold.fd_grad(q, qd, u), atol=1e-8)


def test_floating_base_momentum_conservation():
    """Zero gravity, zero torque → spatial momentum of the free-floating
    robot is conserved (physics check independent of the reference)."""
    # note: a robot with full rotary inertias — a free-floating chain of
    # POINT masses has a singular mass matrix whenever the masses align
    urdf = zoo.with_floating_base(zoo.serial_chain(2))
    desc = g.parse_urdf(urdf)
    gold = g.GoldenDynamics(desc)
    model = g.robot_model_from_description(desc, dtype=jnp.float64)
    n = desc.n
    rng = np.random.default_rng(86)
    q = jnp.asarray(rng.uniform(-0.5, 0.5, n))
    qd = jnp.asarray(rng.uniform(-0.5, 0.5, n))
    u = jnp.zeros(n)

    def momentum(q_, qd_):
        v, _, _ = gold.rnea_fpass(np.asarray(q_), np.asarray(qd_), None, 0.0)
        X = gold.xmats(np.asarray(q_))
        # accumulate I_i v_i transformed to the world frame
        h = np.zeros(6)
        # world←link force transform: X_i maps world→…→link motion; force
        # transforms with X_iᵀ back up the chain
        Xw = [None] * n
        for i in range(n):
            p = desc.topology.parents[i]
            Xw[i] = X[i] @ (Xw[p] if p >= 0 else np.eye(6))
        for i in range(n):
            h += Xw[i].T @ (gold.inertias[i] @ v[i])
        return h

    h0 = momentum(q, qd)
    qt, qdt = rollout.simulate(model, q, qd, u, dt=1e-3, steps=300,
                               gravity=0.0)
    h1 = momentum(qt[-1], qdt[-1])
    np.testing.assert_allclose(h1, h0, atol=1e-7)


# -------------------------------------------------------------------- rollout
def test_simulate_energy(iiwa):
    """Damped arm under zero torque loses energy monotonically-ish; the
    rollout matches a hand-stepped loop."""
    desc, gold, model = get_setup("dpend")
    q0 = jnp.asarray([1.0, -0.5])
    qd0 = jnp.zeros(2)
    u = jnp.zeros(2)
    qt, qdt = rollout.simulate(model, q0, qd0, u, dt=1e-3, steps=50)
    assert qt.shape == (50, 2)
    # hand-stepped comparison (same integrator)
    from gridcodegenerator_tpu.utils.rollout import _step_rk4
    q, qd = q0, qd0
    for _ in range(50):
        q, qd = _step_rk4(model, q, qd, u, 1e-3, -9.81)
    np.testing.assert_allclose(np.asarray(qt[-1]), np.asarray(q), atol=1e-12)


def test_simulate_batched(iiwa):
    desc, gold, model = iiwa
    n = desc.n
    B = 3
    q0, qd0, _ = map(jnp.asarray, random_state(n, seed=87, batch=(B,)))
    u = jnp.zeros((5, B, n))
    qt, qdt = rollout.simulate(model, q0, qd0, u, dt=1e-3)
    assert qt.shape == (5, B, n)
    # batched rollout equals per-trajectory rollouts
    q1, _ = rollout.simulate(model, q0[1], qd0[1], u[:, 1], dt=1e-3)
    np.testing.assert_allclose(np.asarray(qt[:, 1]), np.asarray(q1), atol=1e-12)


def test_linearize_trajectory(iiwa):
    desc, gold, model = iiwa
    n = desc.n
    q, qd, u = map(jnp.asarray, random_state(n, seed=88, batch=(2,)))
    A, B = rollout.linearize_trajectory(model, q, qd, u, dt=1e-2)
    assert A.shape == (2, 2 * n, 2 * n) and B.shape == (2, 2 * n, n)
    # ∂x⁺/∂u lower block = dt·M⁻¹
    Minv = np.asarray(g.direct_minv(model, q[0]))
    np.testing.assert_allclose(np.asarray(B[0][n:]), 1e-2 * Minv, atol=1e-10)


def test_grad_through_simulate_analytic(iiwa):
    """jax.grad through `simulate` (whose steps carry the analytic custom
    VJP) must match grad through a rollout built on the plain AD path."""
    desc, gold, model = iiwa
    n = desc.n
    q0 = jnp.linspace(-0.5, 0.5, n)
    qd0 = jnp.zeros(n)
    u = jnp.linspace(-1.0, 1.0, n)
    T, dt = 5, 0.01

    def loss_analytic(u):
        qt, qdt = g.simulate(model, q0, qd0, u, dt=dt, steps=T,
                             method="semi_implicit")
        return jnp.sum(qt[-1] ** 2) + jnp.sum(qdt[-1] ** 2)

    from gridcodegenerator_tpu.ops import fd as fd_ops

    def loss_ad(u):
        def body(carry, _):
            q, qd = carry
            qdd = fd_ops.forward_dynamics(model, q, qd, u)
            qd2 = qd + dt * qdd
            return (q + dt * qd2, qd2), None

        (q, qd), _ = jax.lax.scan(body, (q0, qd0), None, length=T)
        return jnp.sum(q ** 2) + jnp.sum(qd ** 2)

    ga = jax.grad(loss_analytic)(u)
    gr = jax.grad(loss_ad)(u)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gr), rtol=1e-8)


def test_compile_freeflyer():
    """AOT contact artifact: compiled stance + ground-step executables match
    the direct batched entries (zero tracing at call time)."""
    import jax.numpy as jnp
    import numpy as np
    from gridcodegenerator_tpu.models import zoo
    from gridcodegenerator_tpu.ops import contact as ct
    from gridcodegenerator_tpu.ops import freeflyer as ff

    ffm = ff.free_flyer_model(g.parse_urdf(zoo.serial_chain(3, damping=0.1)),
                              dtype=jnp.float64)
    n = ffm.n
    links, offs = (n - 1,), np.asarray([[0.1, 0.0, 0.0]])
    B = 4
    cf = g.compile_freeflyer(ffm, links, offs, batch_sizes=(B,), mu=0.6,
                             impl="vmap", dtype=jnp.float64)
    rng = np.random.default_rng(3)
    quat = rng.normal(size=(B, 4))
    quat /= np.linalg.norm(quat, axis=1, keepdims=True)
    mk = lambda d: jnp.asarray(rng.uniform(-0.4, 0.4, (B, d)))
    quat = jnp.asarray(quat)
    pos = mk(3) + jnp.asarray([0, 0, 0.3])
    q, vb, qd, tau = mk(n), mk(6), mk(n), mk(n)

    dvb, qdd, lam = cf.stance_fd(quat, pos, q, vb, qd, tau)
    r_dvb, r_qdd, r_lam = ct.fb_constrained_fd_batched(
        ffm, quat, pos, q, vb, qd, tau, links, offs, impl="vmap")
    np.testing.assert_allclose(np.asarray(qdd), np.asarray(r_qdd), atol=1e-9)
    np.testing.assert_allclose(np.asarray(lam), np.asarray(r_lam), atol=1e-9)

    outs = cf.ground_step(quat, pos, q, vb, qd, tau)
    nxt_r, imp_r = ct.fb_step_ground_batched(
        ffm, (quat, pos, q, vb, qd), tau, 1e-3, links, offs, mu=0.6,
        impl="vmap")
    for a, b in zip(outs[:5], nxt_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-9)
    np.testing.assert_allclose(np.asarray(outs[5]), np.asarray(imp_r),
                               atol=1e-9)


def test_compile_multidof():
    """AOT multi-dof artifact: compiled generalized ID/FD/gradient
    executables match the direct batched entries (f64 → exact)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from gridcodegenerator_tpu.models import zoo
    from gridcodegenerator_tpu.ops import multidof as md

    mdl = md.multidof_model_from_description(
        g.parse_urdf(zoo.ball_arm(damping=0.1)), dtype=jnp.float64)
    B = 4
    c = g.compile_multidof(mdl, batch_sizes=(B,), dtype=jnp.float64)
    rng = np.random.default_rng(5)
    q0 = jnp.tile(jnp.asarray(md.neutral_q(mdl))[None], (B, 1))
    dq = jnp.asarray(rng.uniform(-0.3, 0.3, (B, mdl.nv)))
    q = jax.vmap(lambda a, b: md.md_tangent_apply(mdl, a, b))(q0, dq)
    qd = jnp.asarray(rng.uniform(-0.5, 0.5, (B, mdl.nv)))
    u = jnp.asarray(rng.uniform(-3, 3, (B, mdl.nv)))

    qdd = c.forward_dynamics(q, qd, u)
    np.testing.assert_allclose(
        np.asarray(c.inverse_dynamics(q, qd, qdd)), np.asarray(u),
        atol=1e-9)
    for got, ref in zip(c.forward_dynamics_gradient(q, qd, u),
                        md.md_forward_dynamics_gradient_batched(
                            mdl, q, qd, u)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-9 * max(
                                       1.0, float(jnp.abs(ref).max())))
    for got, ref in zip(c.id_grad(q, qd, u),
                        md.md_id_grad_batched(mdl, q, qd, u)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-9 * max(
                                       1.0, float(jnp.abs(ref).max())))
