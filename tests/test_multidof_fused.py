"""Fused multi-dof kernels (ops/kernels/multidof_fused.py) vs vmap of the
per-state generalized recursions — ball joints, in-tree floating joints, and
mixed 1-dof trees (ROADMAP r2 item 3: the multi-dof stack was vmap-only)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gridcodegenerator_tpu as g
from gridcodegenerator_tpu.models import zoo
from gridcodegenerator_tpu.ops import multidof as md
from gridcodegenerator_tpu.ops.kernels import multidof_fused as mf


def _model(urdf):
    return md.multidof_model_from_description(g.parse_urdf(urdf),
                                              dtype=jnp.float64)


@pytest.fixture(scope="module", params=["ball", "free", "mixed"])
def md_setup(request):
    if request.param == "ball":
        model = _model(zoo.ball_arm(damping=0.1))
    elif request.param == "free":
        model = _model(zoo.with_free_joint(zoo.iiwa14(damping=0.1)))
    else:
        model = _model(zoo.serial_chain(5, damping=0.1, prismatic_every=2))
    B = 4
    rng = np.random.default_rng(29)
    q = np.tile(np.asarray(md.neutral_q(model)), (B, 1))
    # random manifold perturbation keeps quaternions unit
    dq = rng.uniform(-0.6, 0.6, (B, model.nv))
    q = np.stack([np.asarray(md.md_tangent_apply(
        model, jnp.asarray(q[k]), jnp.asarray(dq[k]))) for k in range(B)])
    qd = rng.uniform(-0.8, 0.8, (B, model.nv))
    u = rng.uniform(-5, 5, (B, model.nv))
    return model, (jnp.asarray(q), jnp.asarray(qd), jnp.asarray(u))


def test_md_batched_id_fd_match_vmap(md_setup):
    """Batched entries (XLA body) == vmap of the single-state recursions."""
    model, (q, qd, u) = md_setup
    c_ref = jax.vmap(lambda a, b, cc: md.md_inverse_dynamics(
        model, a, b, cc))(q, qd, u)
    qdd_ref = jax.vmap(lambda a, b, cc: md.md_forward_dynamics(
        model, a, b, cc))(q, qd, u)

    c = md.md_inverse_dynamics_batched(model, q, qd, u, impl="vmap")
    qdd = md.md_forward_dynamics_batched(model, q, qd, u, impl="vmap")
    np.testing.assert_allclose(np.asarray(c), np.asarray(c_ref), atol=1e-10)
    np.testing.assert_allclose(np.asarray(qdd), np.asarray(qdd_ref),
                               atol=1e-9)


def test_md_fused_interpret_matches_vmap(md_setup):
    """The Pallas kernels in interpret mode (same bodies as the TPU
    lowering) == vmap of the single-state recursions."""
    model, (q, qd, u) = md_setup
    bl = lambda a: a.T
    c_ref = jax.vmap(lambda a, b, cc: md.md_inverse_dynamics(
        model, a, b, cc))(q, qd, u)
    qdd_ref = jax.vmap(lambda a, b, cc: md.md_forward_dynamics(
        model, a, b, cc))(q, qd, u)

    c = mf.md_id_fused(model, bl(q), bl(qd), bl(u), interpret=True)
    qdd = mf.md_fd_fused(model, bl(q), bl(qd), bl(u), interpret=True)
    np.testing.assert_allclose(np.asarray(c.T), np.asarray(c_ref),
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(qdd.T), np.asarray(qdd_ref),
                               atol=1e-9)


def test_md_grad_batched_matches_single(md_setup):
    """Batched tangent-space gradients (XLA body) == the per-state analytic
    md_id_grad / md_forward_dynamics_gradient."""
    model, (q, qd, u) = md_setup
    B = q.shape[0]
    Dq, Dqd = md.md_id_grad_batched(model, q, qd, u, impl="vmap")
    Fq, Fqd, Fu = md.md_forward_dynamics_gradient_batched(
        model, q, qd, u, impl="vmap")
    for k in (0, B - 1):
        rq, rqd = md.md_id_grad(model, q[k], qd[k], u[k])
        np.testing.assert_allclose(np.asarray(Dq[k]), np.asarray(rq),
                                   atol=1e-9)
        np.testing.assert_allclose(np.asarray(Dqd[k]), np.asarray(rqd),
                                   atol=1e-9)
        gq, gqd, gu = md.md_forward_dynamics_gradient(model, q[k], qd[k],
                                                      u[k])
        np.testing.assert_allclose(np.asarray(Fq[k]), np.asarray(gq),
                                   atol=1e-8)
        np.testing.assert_allclose(np.asarray(Fqd[k]), np.asarray(gqd),
                                   atol=1e-8)
        np.testing.assert_allclose(np.asarray(Fu[k]), np.asarray(gu),
                                   atol=1e-8)


def test_md_grad_fused_interpret(md_setup):
    """The gradient kernels in interpret mode == the per-state analytic
    gradients (the TPU lowering path of the same bodies)."""
    model, (q, qd, u) = md_setup
    bl = lambda a: a.T
    Dq, Dqd = mf.md_id_grad_fused(model, bl(q), bl(qd), bl(u),
                                  interpret=True)
    rq, rqd = md.md_id_grad(model, q[0], qd[0], u[0])
    np.testing.assert_allclose(np.asarray(Dq[..., 0]), np.asarray(rq),
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(Dqd[..., 0]), np.asarray(rqd),
                               atol=1e-9)


def test_md_grad_forest_topology():
    """Forest topologies (several chains mounted directly on the base) make
    M block-diagonal with no Cholesky fill-in between branches — the
    M⁻¹ unit-column solves then carry structural zeros that must assemble
    as zeros, not crash (code-review r3 finding #1)."""
    # dual-arm: two 2-joint chains on the base, one with a ball joint
    b = zoo.UrdfBuilder("dualarm")
    b.link("base")
    for arm, x in (("a", 0.2), ("b", -0.2)):
        parent = "base"
        for i in range(2):
            nm = f"{arm}{i}"
            b.link(nm, mass=0.5, ixx=0.01, iyy=0.01, izz=0.01)
            b.joint(f"j{arm}{i}", parent, nm, xyz=(x, 0.1, 0.1),
                    axis=(0, 1, 0) if i else (0, 0, 1))
            parent = nm
    model = _model(b.build())
    assert sum(1 for pr in model.topology.parents if pr < 0) == 2
    B = 3
    rng = np.random.default_rng(5)
    q = jnp.tile(md.neutral_q(model)[None], (B, 1))
    qd = jnp.asarray(rng.uniform(-1, 1, (B, model.nv)))
    u = jnp.asarray(rng.uniform(-3, 3, (B, model.nv)))

    Fq, Fqd, Fu = md.md_forward_dynamics_gradient_batched(
        model, q, qd, u, impl="vmap")
    gq, gqd, gu = md.md_forward_dynamics_gradient(model, q[0], qd[0], u[0])
    np.testing.assert_allclose(np.asarray(Fq[0]), np.asarray(gq), atol=1e-9)
    np.testing.assert_allclose(np.asarray(Fu[0]), np.asarray(gu), atol=1e-9)


def test_md_workset_gate():
    assert mf.md_workset_ok(5, 15)       # ball_arm scale
    assert mf.md_workset_ok(8, 13)       # free-joint iiwa
    assert not mf.md_workset_ok(200, 80)


def test_md_staged_matches_fused(md_setup):
    """The column-blocked staged pipeline (ops/kernels/multidof_staged.py,
    the large-nv path) == the fused single-tile bodies, forced on small
    robots with cb=3 so every launch kind (vaf, M⁻¹, ragged-width K5md
    blocks, fused −M⁻¹·∂c finish) runs."""
    from gridcodegenerator_tpu.ops.kernels import multidof_staged as ms

    model, (q, qd, u) = md_setup
    bl = lambda a: a.T
    qb, qdb, ub = bl(q), bl(qd), bl(u)
    Dq_f, Dqd_f = mf.md_id_grad_fused(model, qb, qdb, ub, force_xla=True)
    Fq_f, Fqd_f, Fu_f = mf.md_fd_grad_fused(model, qb, qdb, ub,
                                            force_xla=True)
    Dq_s, Dqd_s = ms.md_id_grad_staged(model, qb, qdb, ub, cb=3,
                                       force_xla=True)
    Fq_s, Fqd_s, Fu_s = ms.md_fd_grad_staged(model, qb, qdb, ub, cb=3,
                                             force_xla=True)
    for ref, got in [(Dq_f, Dq_s), (Dqd_f, Dqd_s), (Fq_f, Fq_s),
                     (Fqd_f, Fqd_s), (Fu_f, Fu_s)]:
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-9)
    # the per-column-list K5md body (wide=False) stays equivalent to the
    # default (6,cb,B) column-tensor body
    Dq_n, Dqd_n = ms.md_id_grad_staged(model, qb, qdb, ub, cb=3,
                                       force_xla=True, wide=False)
    np.testing.assert_allclose(np.asarray(Dq_n), np.asarray(Dq_s),
                               atol=1e-11)
    np.testing.assert_allclose(np.asarray(Dqd_n), np.asarray(Dqd_s),
                               atol=1e-11)


@pytest.mark.mid
def test_md_staged_interpret(md_setup):
    """Staged pipeline through the actual Pallas kernels (interpret mode =
    the TPU lowering bodies) == the fused XLA reference."""
    from gridcodegenerator_tpu.ops.kernels import multidof_staged as ms

    model, (q, qd, u) = md_setup
    if model.joint_types[0] != "floating":
        pytest.skip("one interpret-mode robot suffices (slow on CPU); the "
                    "free-joint robot covers quaternion+1-dof mixed trees")
    bl = lambda a: a.T
    qb, qdb, ub = bl(q), bl(qd), bl(u)
    Fq_f, Fqd_f, Fu_f = mf.md_fd_grad_fused(model, qb, qdb, ub,
                                            force_xla=True)
    Fq_s, Fqd_s, Fu_s = ms.md_fd_grad_staged(model, qb, qdb, ub, cb=3,
                                             interpret=True)
    for ref, got in [(Fq_f, Fq_s), (Fqd_f, Fqd_s), (Fu_f, Fu_s)]:
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-8)


def test_md_staged_merge_sides(md_setup):
    """The merged both-sides K5md launch (one kernel emits ∂/∂q AND
    ∂/∂q̇ for its column block) == the per-side launches, and the
    merged-launch block width is sized at Atlas-free-flyer scale."""
    from gridcodegenerator_tpu.ops.kernels import multidof_staged as ms

    model, (q, qd, u) = md_setup
    bl = lambda a: a.T
    qb, qdb, ub = bl(q), bl(qd), bl(u)
    a_m = ms.md_fd_grad_staged(model, qb, qdb, ub, cb=3, force_xla=True,
                               merge_sides=True)
    a_s = ms.md_fd_grad_staged(model, qb, qdb, ub, cb=3, force_xla=True,
                               merge_sides=False)
    for got, ref in zip(a_m, a_s):
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-11)
    # At humanoid free-flyer scale the hardware-calibrated merged-body
    # model (staged._MERGE_BASE: Mosaic neither reuses the first side's
    # stack nor shares its input copies — two gate models OOM'd on the
    # v5e before this calibration) must reject the merge: the auto plan
    # falls back to per-side launches even with merge_sides=True.
    cb1, plan = ms._side_plan(29, 34, True, None, True)
    assert plan == (("q",), ("qd",))
    assert cb1 == ms.md_col_block(29, 34, fused=True) >= 4
    # ... while small robots (where the merged body fits) still merge
    cb_s, plan_s = ms._side_plan(model.n_joints, model.nv, True, None, True)
    assert plan_s == (("q", "qd"),) and cb_s >= 1


def test_md_staged_gate_and_routing():
    """Humanoid free-flyer scale (Atlas + floating base: n=29, nv=34) is
    past the single-tile gradient gate but inside the staged one — the
    batched entries must route there instead of the giant-XLA fallback."""
    from gridcodegenerator_tpu.ops.kernels import multidof_staged as ms

    n, nv = 29, 34
    assert not mf.md_grad_workset_ok(n, nv)
    assert ms.md_staged_ok(n, nv)
    cb = ms.md_col_block(n, nv, fused=True)
    assert cb >= 4
    splits = ms._split_cols(nv, cb)
    assert sum(w for _, w in splits) == nv
    assert max(w for _, w in splits) - min(w for _, w in splits) <= 1
    assert all(c0 == sum(w for _, w in splits[:k])
               for k, (c0, _) in enumerate(splits))
    # the non-fused (raw ∂c) block width is at least as wide
    assert ms.md_col_block(n, nv, fused=False) >= cb


def test_md_aba_fused_interpret(md_setup):
    """Fused generalized ABA (interpret + force_xla) == the CRBA+Cholesky
    kernel body — different recursions, same q̈."""
    model, (q, qd, u) = md_setup
    bl = lambda a: a.T
    ref = mf.md_fd_fused(model, bl(q), bl(qd), bl(u), interpret=True)
    got = mf.md_aba_fused(model, bl(q), bl(qd), bl(u), interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-9)
    got_xla = mf.md_aba_fused(model, bl(q), bl(qd), bl(u), force_xla=True)
    np.testing.assert_allclose(np.asarray(got_xla), np.asarray(ref),
                               atol=1e-9)
