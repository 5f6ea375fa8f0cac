"""Fused floating-base contact kernels (ops/kernels/contact_fused.py) vs the
plain-XLA batch-last contact pipeline — the interpret-mode equivalence leg for
the stance FD and frictional ground-step kernels (VERDICT r2 #1: the contact
stack previously had no fused kernels). Interpret mode runs the identical
kernel bodies the TPU lowers, so these tests pin the *math*; the Mosaic
compilation is validated on hardware by ``-m tpu``
(tests/test_tpu_kernels.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gridcodegenerator_tpu as g
from gridcodegenerator_tpu.models import zoo
from gridcodegenerator_tpu.ops import contact as ct
from gridcodegenerator_tpu.ops import freeflyer as ff
from gridcodegenerator_tpu.ops.kernels import contact_fused as cf

_FEET = (2, 5, 8, 11)
_FOFF = np.tile([0.35, 0.0, 0.0], (4, 1))


@pytest.fixture(scope="module")
def hyq_ff():
    return ff.free_flyer_model(g.parse_urdf(zoo.hyq(damping=0.2)),
                               dtype=jnp.float64)


def _states(n, B, seed):
    rng = np.random.default_rng(seed)
    quat = rng.normal(size=(B, 4))
    quat /= np.linalg.norm(quat, axis=1, keepdims=True)
    pos = rng.uniform(-0.1, 0.1, (B, 3)) + [0, 0, 0.5]
    q = np.tile([-0.1, 0.7, -1.2], (B, 4)) + rng.uniform(-0.1, 0.1, (B, n))
    vb = rng.uniform(-0.6, 0.6, (B, 6))
    qd = rng.uniform(-0.5, 0.5, (B, n))
    tau = rng.uniform(-10, 10, (B, n))
    return tuple(jnp.asarray(x) for x in (quat, pos, q, vb, qd, tau))


def test_stance_fused_interpret_matches_xla(hyq_ff):
    """stance_fd_fused (interpret) == fb_constrained_fd_batched (XLA path)
    to f64 round-off, including Baumgarte drift control with explicit
    anchors and Delassus regularization."""
    ffm = hyq_ff
    n = ffm.n
    B = 3
    quat, pos, q, vb, qd, tau = _states(n, B, seed=5)
    anchors = np.random.default_rng(1).uniform(-0.1, 0.1, (4, 3))
    bl = lambda a: a.T

    kw = dict(baumgarte=(3.0, 2.0), anchors=anchors, reg=1e-10)
    dvb_r, qdd_r, lam_r = ct.fb_constrained_fd_batched(
        ffm, quat, pos, q, vb, qd, tau, _FEET, _FOFF, impl="vmap", **kw)
    dvb_f, qdd_f, lam_f = cf.stance_fd_fused(
        ffm, bl(quat), bl(pos), bl(q), bl(vb), bl(qd), bl(tau), _FEET,
        _FOFF, interpret=True, **kw)
    np.testing.assert_allclose(np.asarray(dvb_f.T), np.asarray(dvb_r),
                               atol=1e-11)
    np.testing.assert_allclose(np.asarray(qdd_f.T), np.asarray(qdd_r),
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(lam_f.T), np.asarray(lam_r),
                               atol=1e-11)


def test_step_ground_fused_interpret_matches_xla(hyq_ff):
    """step_ground_fused (interpret) == fb_step_ground_batched (XLA path):
    full step — free velocity, gap gating, PGS cone solve with
    per-environment mu, manifold integration — with contacts active."""
    ffm = hyq_ff
    n = ffm.n
    B = 4
    quat, pos, q, vb, qd, tau = _states(n, B, seed=7)
    mus = jnp.asarray(np.random.default_rng(2).uniform(0.3, 1.0, (B, 4)))
    bl = lambda a: a.T

    nxt_r, imp_r = ct.fb_step_ground_batched(
        ffm, (quat, pos, q, vb, qd), tau, 1e-3, _FEET, _FOFF, mu=mus,
        impl="vmap")
    outs = cf.step_ground_fused(
        ffm, bl(quat), bl(pos), bl(q), bl(vb), bl(qd), bl(tau), bl(mus),
        1e-3, _FEET, _FOFF, interpret=True)
    for nm, a, b in zip(("quat2", "pos2", "q2", "vb2", "qd2"), outs[:5],
                        nxt_r):
        np.testing.assert_allclose(np.asarray(a.T), np.asarray(b),
                                   atol=1e-11, err_msg=nm)
    imp_f = jnp.moveaxis(outs[5], 0, -1).reshape(B, 4, 3)
    np.testing.assert_allclose(np.asarray(imp_f), np.asarray(imp_r),
                               atol=1e-11)
    assert bool((np.asarray(imp_r)[..., 2] > 0).any()), \
        "test states produced no active contacts — equivalence is vacuous"


def test_fb_simulate_ground_batched_matches_loop():
    """One-dispatch scan rollout == a python loop of batched steps."""
    ffm = ff.free_flyer_model(g.parse_urdf(zoo.serial_chain(3, damping=0.1)),
                              dtype=jnp.float64)
    n = ffm.n
    links, offs = (n - 1,), np.asarray([[0.1, 0.0, 0.0]])
    B, T = 3, 4
    rng = np.random.default_rng(33)
    quat = rng.normal(size=(B, 4))
    quat /= np.linalg.norm(quat, axis=1, keepdims=True)
    state = (jnp.asarray(quat),
             jnp.asarray(rng.uniform(-0.1, 0.1, (B, 3)) + [0, 0, 0.2]),
             jnp.asarray(rng.uniform(-0.3, 0.3, (B, n))),
             jnp.asarray(rng.uniform(-0.3, 0.3, (B, 6))),
             jnp.asarray(rng.uniform(-0.3, 0.3, (B, n))))
    taus = jnp.asarray(rng.uniform(-2, 2, (T, B, n)))

    final, imps = jax.jit(lambda s, t: ct.fb_simulate_ground_batched(
        ffm, s, t, 1e-3, links, offs, mu=0.7, impl="vmap"))(state, taus)
    assert imps.shape == (T, B, 1, 3)
    s = state
    for t in range(T):
        s, imp = ct.fb_step_ground_batched(
            ffm, s, taus[t], 1e-3, links, offs, mu=0.7, impl="vmap")
        np.testing.assert_allclose(np.asarray(imps[t]), np.asarray(imp),
                                   atol=1e-11)
    for a, b in zip(final, s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-11)

    # collision pass-through: the scan threads collision=/mu_collision=
    # to every step (impulse stack widens to 1 + n_contacts triplets)
    from gridcodegenerator_tpu.ops import collision as col
    geoms = col.make_geoms((n - 1,), a=np.zeros((1, 3)), r=0.08,
                           dtype=jnp.float64)
    ball = col.make_obstacles(a=[[0.05, 0.0, 0.15]], r=0.15,
                              dtype=jnp.float64)
    cm = col.make_collision_model(geoms, topology=ffm.arm.topology,
                                  obstacles=ball)
    final_c, imps_c = jax.jit(lambda st, t: ct.fb_simulate_ground_batched(
        ffm, st, t, 1e-3, links, offs, mu=0.7, impl="vmap",
        collision=cm, mu_collision=0.5))(state, taus)
    assert imps_c.shape == (T, B, 1 + cm.n_contacts, 3)
    s = state
    for t in range(T):
        s, imp = ct.fb_step_ground_batched(
            ffm, s, taus[t], 1e-3, links, offs, mu=0.7, impl="vmap",
            collision=cm, mu_collision=0.5)
        np.testing.assert_allclose(np.asarray(imps_c[t]), np.asarray(imp),
                                   atol=1e-11)
    for a, b in zip(final_c, s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-11)


def test_ff_workset_gate():
    """The lane-tile VMEM gate admits the quadruped/humanoid shapes the
    kernel exists for and rejects absurd ones (falling back to XLA)."""
    assert cf.ff_workset_ok(12, 4)      # HyQ, 4 feet
    assert cf.ff_workset_ok(28, 2)      # Atlas-scale, 2 stance feet
    assert not cf.ff_workset_ok(120, 16)


def test_fb_fd_batched_matches_vmap(hyq_ff):
    """fb_forward_dynamics_batched (fused body, XLA path on CPU; interpret
    kernel) == vmap of the single-state free-flyer FD."""
    ffm = hyq_ff
    n = ffm.n
    B = 4
    quat, pos, q, vb, qd, tau = _states(n, B, seed=13)
    dvb_r, qdd_r = jax.vmap(
        lambda *s: ff.fb_forward_dynamics(ffm, *s))(quat, q, vb, qd, tau)

    dvb, qdd = ff.fb_forward_dynamics_batched(ffm, quat, q, vb, qd, tau,
                                              impl="vmap")
    np.testing.assert_allclose(np.asarray(dvb), np.asarray(dvb_r), atol=1e-10)
    np.testing.assert_allclose(np.asarray(qdd), np.asarray(qdd_r), atol=1e-9)

    bl = lambda a: a.T
    dvb_f, qdd_f = cf.fb_fd_fused(ffm, bl(quat), bl(q), bl(vb), bl(qd),
                                  bl(tau), interpret=True)
    np.testing.assert_allclose(np.asarray(dvb_f.T), np.asarray(dvb_r),
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(qdd_f.T), np.asarray(qdd_r),
                               atol=1e-9)


def test_traced_offsets_still_work_on_xla_path():
    """Contact offsets must stay traceable through the XLA path (e.g.
    jax.grad w.r.t. foot geometry) — the fused-kernel routing bakes them
    as literals only inside its own branch (code-review r3 finding #2).
    Small robot: the check is about tracing, not scale."""
    ffm = ff.free_flyer_model(g.parse_urdf(zoo.serial_chain(3, damping=0.1)),
                              dtype=jnp.float64)
    n = ffm.n
    links = (n - 1,)
    B = 2
    rng = np.random.default_rng(21)
    quat = rng.normal(size=(B, 4))
    quat /= np.linalg.norm(quat, axis=1, keepdims=True)
    quat = jnp.asarray(quat)
    pos = jnp.asarray(rng.uniform(-0.1, 0.1, (B, 3)) + [0, 0, 0.3])
    q, vb, qd, tau = (jnp.asarray(rng.uniform(-0.5, 0.5, (B, d)))
                      for d in (n, 6, n, n))
    offs0 = jnp.asarray([[0.1, 0.0, 0.0]])

    @jax.jit
    def qdd_of(off):
        return ct.fb_constrained_fd_batched(
            ffm, quat, pos, q, vb, qd, tau, links, off, impl="vmap")[1]

    out = qdd_of(offs0)
    assert out.shape == (2, n)
    gfn = jax.grad(lambda off: jnp.sum(qdd_of(off)))
    assert bool(jnp.isfinite(gfn(offs0)).all())


def test_mu_ambiguity_raises():
    """(B,) mu with B == k is ambiguous and must fail fast, never silently
    reinterpret per-environment as per-foot (code-review r3 finding #4)."""
    with pytest.raises(ValueError, match="ambiguous"):
        ct._mu_to_bl(jnp.asarray([0.2, 0.5, 0.8, 1.1]), k=4, B=4,
                     dtype=jnp.float64)
    # unambiguous forms still work
    assert ct._mu_to_bl(0.5, 4, 4, jnp.float64).shape == (4, 4)
    assert ct._mu_to_bl(jnp.full((4, 4), 0.5), 4, 4,
                        jnp.float64).shape == (4, 4)
    assert ct._mu_to_bl(jnp.asarray([0.1, 0.2, 0.3]), 3, 8,
                        jnp.float64).shape == (3, 8)


def test_stance_fused_xla_fallback_path(hyq_ff):
    """Oversized robots run the identical body as plain XLA (_xla_fallback);
    force it by monkeypatching the gate and check it still matches."""
    ffm = hyq_ff
    n = ffm.n
    B = 2
    quat, pos, q, vb, qd, tau = _states(n, B, seed=11)
    bl = lambda a: a.T
    ref = ct.fb_constrained_fd_batched(
        ffm, quat, pos, q, vb, qd, tau, _FEET, _FOFF, impl="vmap")
    orig = cf.ff_workset_ok
    try:
        cf.ff_workset_ok = lambda n_, k_, extra_ws=0.0: False
        got = cf.stance_fd_fused(
            ffm, bl(quat), bl(pos), bl(q), bl(vb), bl(qd), bl(tau), _FEET,
            _FOFF)
    finally:
        cf.ff_workset_ok = orig
    for a, b in zip(got, ref):
        np.testing.assert_allclose(np.asarray(a.T), np.asarray(b),
                                   atol=1e-10)


def test_step_ground_terrain_fused_interpret_matches_xla(hyq_ff):
    """step_ground_terrain_fused (interpret) == fb_step_ground_batched
    (XLA terrain body): heightfield gaps, per-foot local contact frames,
    and the MXU one-hot bilinear gather all agree with the jnp terrain
    path to f64 round-off, with contacts active on uneven ground."""
    from gridcodegenerator_tpu.ops import terrain as tr

    ffm = hyq_ff
    n = ffm.n
    B = 4
    terr = tr.bumpy_terrain(amp=0.05, wavelength=0.9, extent=2.0,
                            cell=0.25, rough=0.02, dtype=jnp.float64)
    assert cf.terrain_fused_ok(ffm, terr, 4)     # gate must take the kernel
    quat, pos, q, vb, qd, tau = _states(n, B, seed=11)
    mus = jnp.asarray(np.random.default_rng(5).uniform(0.3, 1.0, (B, 4)))
    bl = lambda a: a.T

    nxt_r, imp_r = ct.fb_step_ground_batched(
        ffm, (quat, pos, q, vb, qd), tau, 1e-3, _FEET, _FOFF, mu=mus,
        impl="vmap", terrain=terr)
    outs = cf.step_ground_terrain_fused(
        ffm, bl(quat), bl(pos), bl(q), bl(vb), bl(qd), bl(tau), bl(mus),
        1e-3, _FEET, _FOFF, terr, interpret=True)
    for nm, a, b in zip(("quat2", "pos2", "q2", "vb2", "qd2"), outs[:5],
                        nxt_r):
        np.testing.assert_allclose(np.asarray(a.T), np.asarray(b),
                                   atol=1e-11, err_msg=nm)
    imp_f = jnp.moveaxis(outs[5], 0, -1).reshape(B, 4, 3)
    np.testing.assert_allclose(np.asarray(imp_f), np.asarray(imp_r),
                               atol=1e-11)
    assert bool((np.asarray(imp_r)[..., 2] > 0).any()), \
        "test states produced no active contacts — equivalence is vacuous"
    # tangential impulses must exist too (the frame rotation is exercised)
    assert bool((np.abs(np.asarray(imp_r)[..., :2]) > 1e-9).any())


def test_step_ground_terrain_large_grid_falls_back(hyq_ff):
    """A grid past the VMEM gate routes to the XLA fallback of the SAME
    kernel body (consts threaded through) and still matches the batched
    terrain path."""
    from gridcodegenerator_tpu.ops import terrain as tr

    ffm = hyq_ff
    n = ffm.n
    B = 3
    terr = tr.bumpy_terrain(amp=0.04, wavelength=1.2, extent=6.0,
                            cell=0.08, dtype=jnp.float64)     # 151² nodes
    assert not cf.terrain_fused_ok(ffm, terr, 4)
    quat, pos, q, vb, qd, tau = _states(n, B, seed=13)
    bl = lambda a: a.T
    nxt_r, imp_r = ct.fb_step_ground_batched(
        ffm, (quat, pos, q, vb, qd), tau, 1e-3, _FEET, _FOFF, mu=0.7,
        impl="vmap", terrain=terr)
    outs = cf.step_ground_terrain_fused(
        ffm, bl(quat), bl(pos), bl(q), bl(vb), bl(qd), bl(tau),
        jnp.full((4, B), 0.7, jnp.float64), 1e-3, _FEET, _FOFF, terr)
    for a, b in zip(outs[:5], nxt_r):
        np.testing.assert_allclose(np.asarray(a.T), np.asarray(b),
                                   atol=1e-11)


def test_step_ground_fused_collision_matches_xla(hyq_ff):
    """step_ground_fused with a collision set (interpret) ==
    fb_step_ground_batched's XLA body: self-collision + obstacle cone
    triplets appended to the foot rows inside the kernel, geometry baked
    as literals. Fat leg capsules + a sphere obstacle make both self and
    obstacle pairs ACTIVE (non-vacuous equivalence).

    Geometry note: the obstacle must NOT be a vertical capsule here —
    its contact normals are then exactly horizontal (n_z == 0), the sign
    boundary of the branchless tangent basis, where a 1-ulp rounding
    difference between the two evaluation orders flips t1/t2 (physically
    equivalent — the cone is isotropic — but component-wise different).
    Likewise near-parallel capsule pairs slide the witness points at
    fixed gap. Both are the measure-zero kinks documented in
    ops/collision.py; a sphere keeps the normals generic."""
    from gridcodegenerator_tpu.ops import collision as col

    ffm = hyq_ff
    n = ffm.n
    B = 4
    quat, pos, q, vb, qd, tau = _states(n, B, seed=17)
    legs = (2, 5, 8, 11)
    geoms = col.make_geoms(legs, a=np.zeros((4, 3)),
                           b=np.tile([0.3, 0, 0], (4, 1)), r=0.24,
                           dtype=jnp.float64)
    ball = col.make_obstacles(a=[[0.25, 0.05, 0.1]], r=0.35,
                              dtype=jnp.float64)
    cm = col.make_collision_model(geoms, topology=ffm.arm.topology,
                                  obstacles=ball, min_separation=2)
    assert cm.n_contacts == 10
    kt = 4 + cm.n_contacts
    bl = lambda a: a.T

    nxt_r, imp_r = ct.fb_step_ground_batched(
        ffm, (quat, pos, q, vb, qd), tau, 1e-3, _FEET, _FOFF, mu=0.8,
        collision=cm, mu_collision=0.45, impl="vmap")
    outs = cf.step_ground_fused(
        ffm, bl(quat), bl(pos), bl(q), bl(vb), bl(qd), bl(tau),
        jnp.full((4, B), 0.8, jnp.float64), 1e-3, _FEET, _FOFF,
        collision=cm, mu_collision=0.45, interpret=True)
    for nm, a, b in zip(("quat2", "pos2", "q2", "vb2", "qd2"), outs[:5],
                        nxt_r):
        np.testing.assert_allclose(np.asarray(a.T), np.asarray(b),
                                   atol=1e-11, err_msg=nm)
    imp_f = jnp.moveaxis(outs[5], 0, -1).reshape(B, kt, 3)
    assert imp_f.shape == imp_r.shape
    # impulses reach O(7e3) here; 1e-10 is ~1e-14 relative
    np.testing.assert_allclose(np.asarray(imp_f), np.asarray(imp_r),
                               atol=1e-10)
    # non-vacuous: self AND obstacle triplets carry impulse
    imp_c = np.asarray(imp_r)[:, 4:, 2]
    assert bool((imp_c[:, :len(cm.pairs)] > 1e-9).any())
    assert bool((imp_c[:, len(cm.pairs):] > 1e-9).any())


def test_step_ground_fused_loops_matches_xla():
    """step_ground_fused with loop-closure cuts (interpret) ==
    fb_step_ground_batched's XLA body: bilateral rows — one link↔link cut
    (the four-bar closure) AND one world pin — inside the kernel's PGS
    solve, with ACTIVE ground contact (non-vacuous: cone rows and eq rows
    exchange impulse through the same Delassus operator)."""
    desc = g.parse_urdf(zoo.four_bar())
    ffm = ff.free_flyer_model(desc, dtype=jnp.float64)
    n = ffm.n
    names = desc.topology.link_names
    coupler, rocker = names.index("coupler"), names.index("rocker")
    crank = names.index("crank")
    # link↔link closure + a world pin on the crank tip
    pairs = ((coupler, rocker), (crank, -1))
    oa = np.array([[0.8, 0.0, 0.0], [0.0, 0.0, -0.25]])
    ob = np.array([[0.0, 0.0, -0.5], [0.1, 0.0, 0.15]])
    links = (rocker, crank)
    offs = np.array([[0.0, 0.0, -0.25], [0.0, 0.0, -0.25]])

    rng = np.random.default_rng(23)
    B = 4
    quat = rng.normal(size=(B, 4))
    quat = jnp.asarray(quat / np.linalg.norm(quat, axis=1, keepdims=True))
    pos = jnp.asarray(np.concatenate(
        [rng.uniform(-0.2, 0.2, (B, 2)), rng.uniform(0.2, 0.3, (B, 1))],
        axis=1))                                 # near the ground
    q = jnp.asarray(rng.uniform(-0.2, 0.2, (B, n)))
    vb = jnp.asarray(rng.uniform(-1, 1, (B, 6)))
    qd = jnp.asarray(rng.uniform(-1, 1, (B, n)))
    tau = jnp.asarray(rng.uniform(-1, 1, (B, n)))
    bl = lambda a: a.T

    nxt_r, imp_r = ct.fb_step_ground_batched(
        ffm, (quat, pos, q, vb, qd), tau, 1e-3, links, offs, mu=0.7,
        iters=60, loops=(pairs, oa, ob), impl="vmap")
    outs = cf.step_ground_fused(
        ffm, bl(quat), bl(pos), bl(q), bl(vb), bl(qd), bl(tau),
        jnp.full((2, B), 0.7, jnp.float64), 1e-3, links, offs,
        iters=60, loops=(pairs, oa, ob), interpret=True)
    for nm, a, b in zip(("quat2", "pos2", "q2", "vb2", "qd2"), outs[:5],
                        nxt_r):
        np.testing.assert_allclose(np.asarray(a.T), np.asarray(b),
                                   atol=1e-10, err_msg=nm)
    imp_f = jnp.moveaxis(outs[5], 0, -1).reshape(B, 2, 3)
    np.testing.assert_allclose(np.asarray(imp_f), np.asarray(imp_r),
                               atol=1e-10)
    assert bool((np.asarray(imp_r)[..., 2] > 1e-9).any()), \
        "no active ground contact — cone/eq coupling untested"


def test_step_ground_batched_auto_routes_loops(monkeypatch):
    """fb_step_ground_batched(impl='auto'-as-pallas) with concrete loop
    geometry calls the fused kernel (interpret-mode spy), and the result
    matches the XLA body."""
    desc = g.parse_urdf(zoo.four_bar())
    ffm = ff.free_flyer_model(desc, dtype=jnp.float64)
    names = desc.topology.link_names
    pairs = ((names.index("coupler"), names.index("rocker")),)
    oa = np.array([[0.8, 0.0, 0.0]])
    ob = np.array([[0.0, 0.0, -0.5]])
    links = (names.index("rocker"),)
    offs = np.array([[0.0, 0.0, -0.25]])
    rng = np.random.default_rng(3)
    B = 3
    quat = rng.normal(size=(B, 4))
    quat = jnp.asarray(quat / np.linalg.norm(quat, axis=1, keepdims=True))
    state = (quat,
             jnp.asarray(rng.uniform(-0.1, 0.1, (B, 3)) + [0, 0, 0.25]),
             jnp.asarray(rng.uniform(-0.2, 0.2, (B, ffm.n))),
             jnp.asarray(rng.uniform(-1, 1, (B, 6))),
             jnp.asarray(rng.uniform(-1, 1, (B, ffm.n))))
    tau = jnp.asarray(rng.uniform(-1, 1, (B, ffm.n)))

    called = {}
    orig = cf.step_ground_fused

    def spy(*a, **kw):
        called["loops"] = kw.get("loops")
        kw["interpret"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(cf, "step_ground_fused", spy)
    monkeypatch.setattr(ct, "_impl_auto", lambda impl, x=None: "pallas")
    nxt_p, imp_p = ct.fb_step_ground_batched(
        ffm, state, tau, 1e-3, links, offs, loops=(pairs, oa, ob))
    assert called.get("loops") is not None, "fused path not taken"
    monkeypatch.setattr(ct, "_impl_auto", lambda impl, x=None: "vmap")
    nxt_r, imp_r = ct.fb_step_ground_batched(
        ffm, state, tau, 1e-3, links, offs, loops=(pairs, oa, ob))
    for a, b in zip(nxt_p, nxt_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-10)
    np.testing.assert_allclose(np.asarray(imp_p), np.asarray(imp_r),
                               atol=1e-10)


def test_step_ground_fused_base_geom_matches_xla(hyq_ff):
    """Fused step with a BASE geom (link -1, the MuJoCo-torso idiom) in the
    collision set: base-self pairs (zero arm columns, cancelled base
    columns) and base-obstacle pairs (full base block, no arm columns)
    bake correctly into the kernel; interpret == the XLA batch-last body.
    A fat torso capsule over fat upper-leg capsules plus a sphere obstacle
    under the torso keep both pair kinds ACTIVE."""
    from gridcodegenerator_tpu.ops import collision as col

    ffm = hyq_ff
    n = ffm.n
    B = 4
    quat, pos, q, vb, qd, tau = _states(n, B, seed=23)
    geoms = col.make_geoms((-1, 2, 8),
                           a=[[-0.4, 0.0, -0.02], [0, 0, 0], [0, 0, 0]],
                           b=[[0.4, 0.0, -0.02], [0.3, 0, 0], [0.3, 0, 0]],
                           r=[0.30, 0.22, 0.22], dtype=jnp.float64)
    ball = col.make_obstacles(a=[[0.0, 0.1, 0.25]], r=0.30,
                              dtype=jnp.float64)
    cm = col.make_collision_model(geoms, topology=ffm.arm.topology,
                                  obstacles=ball, min_separation=2)
    assert any(-1 in (cm.geoms.links[i], cm.geoms.links[j])
               for i, j in cm.pairs)
    kt = 4 + cm.n_contacts
    bl = lambda a: a.T

    nxt_r, imp_r = ct.fb_step_ground_batched(
        ffm, (quat, pos, q, vb, qd), tau, 1e-3, _FEET, _FOFF, mu=0.8,
        collision=cm, mu_collision=0.5, impl="vmap")
    outs = cf.step_ground_fused(
        ffm, bl(quat), bl(pos), bl(q), bl(vb), bl(qd), bl(tau),
        jnp.full((4, B), 0.8, jnp.float64), 1e-3, _FEET, _FOFF,
        collision=cm, mu_collision=0.5, interpret=True)
    for nm, a, b in zip(("quat2", "pos2", "q2", "vb2", "qd2"), outs[:5],
                        nxt_r):
        np.testing.assert_allclose(np.asarray(a.T), np.asarray(b),
                                   atol=1e-11, err_msg=nm)
    imp_f = jnp.moveaxis(outs[5], 0, -1).reshape(B, kt, 3)
    np.testing.assert_allclose(np.asarray(imp_f), np.asarray(imp_r),
                               atol=1e-10)
    # non-vacuous: some base-geom pair carries normal impulse somewhere
    base_pairs = [ci for ci, (i, j) in enumerate(cm.pairs)
                  if -1 in (cm.geoms.links[i], cm.geoms.links[j])]
    base_obs = [len(cm.pairs) + oi for oi, (i, w) in enumerate(cm.obs_pairs)
                if cm.geoms.links[i] == -1]
    imp_c = np.asarray(imp_r)[:, 4:, 2]
    assert bool((imp_c[:, base_pairs] > 1e-9).any())
    assert bool((imp_c[:, base_obs] > 1e-9).any())


def test_step_ground_fused_ground_geoms_matches_xla(hyq_ff):
    """Fused step with ground_geoms (geom-vs-ground cone rows — capsule
    feet / fallen-torso contact): interpret == the XLA batch-last body,
    on the plane AND on a heightfield. A base torso capsule, a leg
    capsule, and a leg sphere cover base/link owners and 2/1-contact
    geoms; low drop heights keep the rows ACTIVE."""
    from gridcodegenerator_tpu.ops import collision as col
    from gridcodegenerator_tpu.ops import terrain as terr

    ffm = hyq_ff
    n = ffm.n
    B = 4
    quat, pos, q, vb, qd, tau = _states(n, B, seed=31)
    # upright-ish, low: geom-ground contacts activate
    quat = jnp.tile(jnp.asarray([1.0, 0, 0, 0], jnp.float64), (B, 1))
    pos = pos.at[:, 2].set(jnp.asarray([0.30, 0.26, 0.33, 0.28]))
    gg = col.make_geoms((-1, 2, 7),
                        a=[[-0.3, 0, -0.02], [0, 0, 0], [0.1, 0, 0.05]],
                        b=[[0.3, 0, -0.02], [0.3, 0, 0], [0.1, 0, 0.05]],
                        r=[0.25, 0.08, 0.06], dtype=jnp.float64)
    kg = col.n_ground_contacts(gg)
    kt = 4 + kg
    bl = lambda a: a.T
    rng = np.random.default_rng(8)
    hills = terr.make_terrain(0.05 * rng.standard_normal((6, 6)),
                              cell=1.0, origin=(-3.0, -3.0),
                              dtype=jnp.float64)
    for terrain in (None, hills):
        nxt_r, imp_r = ct.fb_step_ground_batched(
            ffm, (quat, pos, q, vb, qd), tau, 1e-3, _FEET, _FOFF, mu=0.8,
            ground_geoms=gg, mu_ground=0.55, terrain=terrain, impl="vmap")
        if terrain is None:
            outs = cf.step_ground_fused(
                ffm, bl(quat), bl(pos), bl(q), bl(vb), bl(qd), bl(tau),
                jnp.full((4, B), 0.8, jnp.float64), 1e-3, _FEET, _FOFF,
                ground_geoms=gg, mu_ground=0.55, interpret=True)
        else:
            outs = cf.step_ground_terrain_fused(
                ffm, bl(quat), bl(pos), bl(q), bl(vb), bl(qd), bl(tau),
                jnp.full((4, B), 0.8, jnp.float64), 1e-3, _FEET, _FOFF,
                terrain, ground_geoms=gg, mu_ground=0.55, interpret=True)
        for nm, a, b in zip(("quat2", "pos2", "q2", "vb2", "qd2"),
                            outs[:5], nxt_r):
            np.testing.assert_allclose(np.asarray(a.T), np.asarray(b),
                                       atol=1e-11, err_msg=nm)
        imp_f = jnp.moveaxis(outs[5], 0, -1).reshape(B, kt, 3)
        np.testing.assert_allclose(np.asarray(imp_f), np.asarray(imp_r),
                                   atol=1e-10)
        # non-vacuous: geom-ground triplets carry impulse
        assert bool((np.asarray(imp_r)[:, 4:, 2] > 1e-9).any())
