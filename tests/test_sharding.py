"""Mesh sharding (8 virtual CPU devices): dp batch sharding and the 2-D
dp × cp (batch × Jacobian-column) layout must reproduce single-device
results exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gridcodegenerator_tpu as g
from conftest import get_setup, random_state
from gridcodegenerator_tpu.parallel import mesh as pmesh


@pytest.fixture(scope="module")
def eight_devices():
    try:
        devs = jax.devices("cpu")
    except RuntimeError:
        devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 (virtual) devices")
    return devs[:8]


def test_dp_sharded_matches_local(eight_devices, iiwa):
    desc, gold, model = iiwa
    m = pmesh.make_mesh(dp=8, cp=1, devices=eight_devices)
    api = pmesh.sharded_api(model, m)
    B = 32
    q, qd, u = map(jnp.asarray, random_state(desc.n, seed=51, batch=(B,)))
    got = np.asarray(api["forward_dynamics"](model, q, qd, u))
    ref = np.asarray(g.forward_dynamics(model, q, qd, u))
    np.testing.assert_allclose(got, ref, atol=1e-11)
    got_g = np.asarray(api["forward_dynamics_gradient"](model, q, qd, u))
    ref_g = np.asarray(g.forward_dynamics_gradient(model, q, qd, u))
    np.testing.assert_allclose(got_g, ref_g, atol=1e-11)


def test_2d_mesh_fd_grad(eight_devices, iiwa):
    """dp=4 × cp=2: batch sharded over dp, Jacobian columns over cp."""
    desc, gold, model = iiwa
    m = pmesh.make_mesh(dp=4, cp=2, devices=eight_devices)
    fn = pmesh.sharded_fd_grad(model, m)
    B = 8
    q, qd, u = map(jnp.asarray, random_state(desc.n, seed=52, batch=(B,)))
    got = np.asarray(fn(q, qd, u))
    ref = np.asarray(g.forward_dynamics_gradient(model, q, qd, u))
    np.testing.assert_allclose(got, ref, atol=1e-10)


def test_2d_mesh_branched(eight_devices):
    desc, gold, model = get_setup("hyq")
    m = pmesh.make_mesh(dp=2, cp=4, devices=eight_devices)
    fn = pmesh.sharded_fd_grad(model, m)
    B = 4
    q, qd, u = map(jnp.asarray, random_state(desc.n, seed=53, batch=(B,)))
    got = np.asarray(fn(q, qd, u))
    ref = np.asarray(g.forward_dynamics_gradient(model, q, qd, u))
    np.testing.assert_allclose(got, ref, atol=1e-10)


def test_replicate_model(eight_devices, iiwa):
    desc, gold, model = iiwa
    m = pmesh.make_mesh(dp=8, cp=1, devices=eight_devices)
    rep = pmesh.replicate_model(model, m)
    assert rep.n == model.n
    np.testing.assert_allclose(np.asarray(rep.Xb), np.asarray(model.Xb))


@pytest.mark.mid
def test_sharded_fused_equals_sharded_vmap(eight_devices, iiwa):
    """VERDICT #7 unification check: shard_map over the fused Pallas kernel
    (interpret mode on the CPU mesh — same kernel bodies as the TPU path)
    must equal shard_map over the vmap path AND the unsharded call."""
    desc, gold, model = iiwa
    model32 = model.astype(jnp.float32)
    m = pmesh.make_mesh(dp=4, cp=2, devices=eight_devices)
    B = 16
    q, qd, u = (jnp.asarray(x, jnp.float32)
                for x in random_state(desc.n, seed=54, batch=(B,)))

    fused_fn = pmesh.sharded_fd_grad_fused(model32, m, block_b=2,
                                           interpret=True)
    got = np.asarray(fused_fn(q, qd, u))
    assert got.shape == (B, desc.n, 2 * desc.n)

    vmap_sharded = pmesh.shard_batch(
        lambda mdl, a, b, c: g.forward_dynamics_gradient(
            mdl, a, b, c, impl="vmap"), m, n_state_args=3)
    ref_sharded = np.asarray(vmap_sharded(model32, q, qd, u))
    ref_local = np.asarray(
        g.forward_dynamics_gradient(model32, q, qd, u, impl="vmap"))

    scale = max(1.0, np.abs(ref_local).max())
    assert np.abs(got - ref_sharded).max() / scale < 2e-6
    assert np.abs(ref_sharded - ref_local).max() / scale < 1e-7


def test_sharded_api_full_coverage(eight_devices, iiwa):
    """Every entry in the sharded_api bundle reproduces its unsharded
    counterpart (the full distributed host-API surface, reference
    ``GRiDCodeGenerator.py:243-279``)."""
    desc, gold, model = iiwa
    m = pmesh.make_mesh(dp=4, cp=2, devices=eight_devices)
    api = pmesh.sharded_api(model, m)
    B = 16
    q, qd, u = map(jnp.asarray, random_state(desc.n, seed=55, batch=(B,)))
    qdd = jnp.asarray(random_state(desc.n, seed=56, batch=(B,))[0])

    cases = {
        "inverse_dynamics": ((q, qd, qdd),
                             g.inverse_dynamics(model, q, qd, qdd)),
        "bias_force": ((q, qd), g.bias_force(model, q, qd)),
        "direct_minv": ((q,), g.direct_minv(model, q, dense=True)),
        "forward_dynamics": ((q, qd, u), g.forward_dynamics(model, q, qd, u)),
        "inverse_dynamics_gradient": (
            (q, qd, qdd), g.inverse_dynamics_gradient(model, q, qd, qdd)),
        "forward_dynamics_gradient": (
            (q, qd, u), g.forward_dynamics_gradient(model, q, qd, u)),
    }
    for name, (args, ref) in cases.items():
        got = np.asarray(api[name](model, *args))
        np.testing.assert_allclose(got, np.asarray(ref), atol=1e-10,
                                   err_msg=name)


def test_sharded_ground_step(eight_devices):
    """dp-sharded frictional environment stepper == the unsharded batched
    stepper == per-environment single steps (the multi-chip parallel-RL
    shape; environments shard, physics replicates, no collectives)."""
    from gridcodegenerator_tpu.ops import contact as ct
    from gridcodegenerator_tpu.ops import freeflyer as ff
    from gridcodegenerator_tpu.models import zoo

    desc = g.parse_urdf(zoo.serial_chain(3, damping=0.1))
    ffm = ff.free_flyer_model(desc, dtype=jnp.float64)
    n = ffm.n
    links, offs = (n - 1,), np.asarray([[0.1, 0.0, 0.0]])
    m = pmesh.make_mesh(dp=4, cp=2, devices=eight_devices)
    B = 8
    rng = np.random.default_rng(77)
    quat = rng.normal(size=(B, 4))
    quat /= np.linalg.norm(quat, axis=1, keepdims=True)
    state = (jnp.asarray(quat),
             jnp.asarray(rng.uniform(-0.1, 0.1, (B, 3)) + [0, 0, 0.3]),
             jnp.asarray(rng.uniform(-0.5, 0.5, (B, n))),
             jnp.asarray(rng.uniform(-0.5, 0.5, (B, 6))),
             jnp.asarray(rng.uniform(-0.5, 0.5, (B, n))))
    tau = jnp.asarray(rng.uniform(-3, 3, (B, n)))

    step = pmesh.sharded_ground_step(ffm, m, links, offs, dt=1e-3, mu=0.6)
    nxt_s, imp_s = step(state, tau)
    nxt_r, imp_r = ct.fb_step_ground_batched(
        ffm, state, tau, 1e-3, links, offs, mu=0.6, impl="vmap")
    for a, b in zip(nxt_s, nxt_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-11)
    np.testing.assert_allclose(np.asarray(imp_s), np.asarray(imp_r),
                               atol=1e-11)
    for k in (0, B - 1):
        s_ref, i_ref = ct.fb_step_ground(
            ffm, tuple(x[k] for x in state), tau[k], 1e-3, links, offs,
            mu=0.6)
        for a, b in zip(nxt_s, s_ref):
            np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b),
                                       atol=1e-9)

    # heightfield variant: the terrain table replicates to every shard
    from gridcodegenerator_tpu.ops import terrain as tr
    terr = tr.bumpy_terrain(amp=0.03, wavelength=0.7, extent=1.5,
                            cell=0.25, dtype=jnp.float64)
    step_t = pmesh.sharded_ground_step(ffm, m, links, offs, dt=1e-3,
                                       mu=0.6, terrain=terr)
    nxt_ts, imp_ts = step_t(state, tau)
    nxt_tr, imp_tr = ct.fb_step_ground_batched(
        ffm, state, tau, 1e-3, links, offs, mu=0.6, impl="vmap",
        terrain=terr)
    for a, b in zip(nxt_ts, nxt_tr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-11)
    np.testing.assert_allclose(np.asarray(imp_ts), np.asarray(imp_tr),
                               atol=1e-11)

    # collision variant: the candidate-pair set replicates to every shard
    from gridcodegenerator_tpu.ops import collision as col
    geoms = col.make_geoms((1, n - 1), a=np.zeros((2, 3)), r=0.12,
                           dtype=jnp.float64)
    ball = col.make_obstacles(a=[[0.1, 0.0, 0.2]], r=0.2, dtype=jnp.float64)
    cmod = col.make_collision_model(geoms, topology=ffm.arm.topology,
                                    obstacles=ball)
    step_c = pmesh.sharded_ground_step(ffm, m, links, offs, dt=1e-3,
                                       mu=0.6, collision=cmod,
                                       mu_collision=0.4)
    nxt_cs, imp_cs = step_c(state, tau)
    nxt_cr, imp_cr = ct.fb_step_ground_batched(
        ffm, state, tau, 1e-3, links, offs, mu=0.6, impl="vmap",
        collision=cmod, mu_collision=0.4)
    assert imp_cs.shape == (B, 1 + cmod.n_contacts, 3)
    for a, b in zip(nxt_cs, nxt_cr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-11)
    np.testing.assert_allclose(np.asarray(imp_cs), np.asarray(imp_cr),
                               atol=1e-11)

    # loop-closure variant: bilateral cut rows replicate to every shard
    lpairs = ((n - 1, -1),)
    loa = np.asarray([[0.1, 0.0, 0.0]])
    lob = np.asarray([[0.2, 0.0, 0.1]])
    step_l = pmesh.sharded_ground_step(ffm, m, links, offs, dt=1e-3,
                                       mu=0.6, loops=(lpairs, loa, lob))
    nxt_ls, imp_ls = step_l(state, tau)
    nxt_lr, imp_lr = ct.fb_step_ground_batched(
        ffm, state, tau, 1e-3, links, offs, mu=0.6, impl="vmap",
        loops=(lpairs, loa, lob))
    for a, b in zip(nxt_ls, nxt_lr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-11)
    np.testing.assert_allclose(np.asarray(imp_ls), np.asarray(imp_lr),
                               atol=1e-11)


def test_sharded_constrained_fd(eight_devices, iiwa):
    """dp-sharded stance/pinned FD == the unsharded batched api entry, and
    both == per-state loops: contact geometry replicates, batch shards."""
    desc, gold, model = iiwa
    n = desc.n
    m = pmesh.make_mesh(dp=4, cp=2, devices=eight_devices)
    links = (n - 1,)
    offs = jnp.asarray([[0.04, -0.03, 0.1]])
    B = 16
    q, qd, u = map(jnp.asarray, random_state(n, seed=61, batch=(B,)))

    f = pmesh.sharded_constrained_fd(model, m, links, offs)
    qdd_s, lam_s = f(q, qd, u)
    qdd_b, lam_b = g.constrained_forward_dynamics(model, q, qd, u, links, offs)
    np.testing.assert_allclose(np.asarray(qdd_s), np.asarray(qdd_b),
                               atol=1e-11)
    np.testing.assert_allclose(np.asarray(lam_s), np.asarray(lam_b),
                               atol=1e-11)
    from gridcodegenerator_tpu.ops import contact as ct
    for k in (0, B - 1):
        ref_qdd, ref_lam = ct.constrained_forward_dynamics(
            model, q[k], qd[k], u[k], links, offs)
        np.testing.assert_allclose(np.asarray(qdd_s[k]), np.asarray(ref_qdd),
                                   atol=1e-9)
        np.testing.assert_allclose(np.asarray(lam_s[k]), np.asarray(ref_lam),
                                   atol=1e-9)


@pytest.mark.mid
def test_sharded_md_fd_grad(eight_devices):
    """dp-sharded multi-dof tangent-space ∇FD == the unsharded batched
    entry == per-state analytic gradients — the free-flyer/humanoid
    counterpart of test_dp_sharded_matches_local (pure data parallelism
    through `parallel.sharded_md_fd_grad`)."""
    from gridcodegenerator_tpu.models import zoo
    from gridcodegenerator_tpu.ops import multidof as md

    model = md.multidof_model_from_description(
        g.parse_urdf(zoo.with_free_joint(zoo.iiwa14(damping=0.1))),
        dtype=jnp.float64)
    nv, nq = model.nv, model.nq
    m = pmesh.make_mesh(dp=4, cp=2, devices=eight_devices)
    B = 16
    rng = np.random.default_rng(71)
    q0 = jnp.tile(jnp.asarray(md.neutral_q(model))[None, :], (B, 1))
    dq = jnp.asarray(rng.uniform(-0.4, 0.4, (B, nv)))
    q = jax.vmap(lambda a, b: md.md_tangent_apply(model, a, b))(q0, dq)
    qd = jnp.asarray(rng.uniform(-0.6, 0.6, (B, nv)))
    u = jnp.asarray(rng.uniform(-5, 5, (B, nv)))

    f = pmesh.sharded_md_fd_grad(model, m)
    Fq_s, Fqd_s, Fu_s = f(q, qd, u)
    assert Fq_s.shape == (B, nv, nv)
    Fq_b, Fqd_b, Fu_b = md.md_forward_dynamics_gradient_batched(
        model, q, qd, u)
    for a, b in zip((Fq_s, Fqd_s, Fu_s), (Fq_b, Fqd_b, Fu_b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-11)
    for k in (0, B - 1):
        gq, gqd, gu = md.md_forward_dynamics_gradient(
            model, q[k], qd[k], u[k])
        for got, ref in ((Fq_s[k], gq), (Fqd_s[k], gqd), (Fu_s[k], gu)):
            scale = max(1.0, float(jnp.abs(ref).max()))
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       atol=1e-9 * scale)


def test_multihost_plumbing_single_process(eight_devices, iiwa):
    """The DCN scale-out helpers degrade exactly to the single-host path in
    a one-process run: a host_local_batch-assembled global batch through a
    sharded entry point matches the unsharded result. (True multi-process
    DCN runs exercise the same `shard_map` program — it addresses devices,
    not processes.)"""
    from gridcodegenerator_tpu.parallel import multihost

    desc, gold, model = iiwa
    m = pmesh.make_mesh(dp=8, cp=1, devices=eight_devices)
    B = 32
    q, qd, u = random_state(desc.n, seed=52, batch=(B,))
    qg, qdg, ug = multihost.host_local_batch(m, q, qd, u)
    # the assembled arrays are dp-sharded and numerically identical
    assert qg.sharding.spec[0] == "dp"
    np.testing.assert_array_equal(np.asarray(qg), np.asarray(q))
    run = pmesh.sharded_fd_grad(model, m)
    got = np.asarray(run(qg, qdg, ug))
    ref = np.asarray(g.forward_dynamics_gradient(model, jnp.asarray(q),
                                                 jnp.asarray(qd),
                                                 jnp.asarray(u)))
    np.testing.assert_allclose(got, ref, atol=1e-11)


@pytest.mark.mid
def test_sharded_fb_fd_matches_local(eight_devices):
    """dp-sharded free-flyer FD (the fused floating-base ABA per shard,
    XLA body on CPU) == the unsharded batched call."""
    from gridcodegenerator_tpu.ops import freeflyer as ff
    from gridcodegenerator_tpu.models import zoo

    desc = g.parse_urdf(zoo.hyq(damping=0.1))
    ffm = ff.free_flyer_model(desc)
    n = desc.n
    m = pmesh.make_mesh(dp=8, devices=eight_devices)
    rng = np.random.default_rng(61)
    B = 16
    quat = rng.standard_normal((B, 4))
    quat = jnp.asarray(quat / np.linalg.norm(quat, axis=1, keepdims=True))
    q, qd, tau = (jnp.asarray(rng.uniform(-1.5, 1.5, (B, n)))
                  for _ in range(3))
    vb = jnp.asarray(rng.uniform(-1, 1, (B, 6)))
    ref = ff.fb_forward_dynamics_batched(ffm, quat, q, vb, qd, tau,
                                         impl="vmap")
    fd = pmesh.sharded_fb_fd(ffm, m)
    got = fd(quat, q, vb, qd, tau)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]),
                               atol=1e-11)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(ref[1]),
                               atol=1e-11)
