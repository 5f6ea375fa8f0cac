"""Collision layer (``ops/collision.py``): closed-form distances vs hand
values, Jacobian rows vs AD of the gap (the envelope-theorem identity), the
free-flyer variants, and the stepper integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gridcodegenerator_tpu as g
from gridcodegenerator_tpu.models import zoo
from gridcodegenerator_tpu.ops import collision as col
from gridcodegenerator_tpu.ops import contact as ct
from gridcodegenerator_tpu.ops.freeflyer import free_flyer_model

from conftest import get_setup

pytestmark = pytest.mark.mid


def test_seg_seg_closest_hand_values():
    f = lambda *a: col._seg_seg_closest(*(jnp.asarray(x, jnp.float64)
                                          for x in a))
    # two parallel unit segments one apart: distance 1
    w1, w2 = f([0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0])
    assert abs(float(jnp.linalg.norm(w1 - w2)) - 1.0) < 1e-12
    # crossing perpendicular segments: closest at the midpoints
    w1, w2 = f([-1, 0, 0], [1, 0, 0], [0, -1, 1], [0, 1, 1])
    np.testing.assert_allclose(np.asarray(w1), [0, 0, 0], atol=1e-12)
    np.testing.assert_allclose(np.asarray(w2), [0, 0, 1], atol=1e-12)
    # degenerate: two points (spheres)
    w1, w2 = f([1, 2, 3], [1, 2, 3], [4, 2, 3], [4, 2, 3])
    np.testing.assert_allclose(np.asarray(w2 - w1), [3, 0, 0], atol=1e-12)
    # clamped: point beyond a segment end
    w1, w2 = f([0, 0, 0], [1, 0, 0], [3, 1, 0], [3, 2, 0])
    np.testing.assert_allclose(np.asarray(w1), [1, 0, 0], atol=1e-12)
    np.testing.assert_allclose(np.asarray(w2), [3, 1, 0], atol=1e-12)


def test_contact_frame_orthonormal():
    rng = np.random.default_rng(0)
    for _ in range(5):
        n = rng.standard_normal(3)
        n /= np.linalg.norm(n)
        C = np.asarray(col._contact_frame_cols(jnp.asarray(n)))
        np.testing.assert_allclose(C @ C.T, np.eye(3), atol=1e-6)
        np.testing.assert_allclose(C[2], n, atol=1e-6)


def _arm_setup():
    _, _, model = get_setup("iiwa14")
    geoms = col.make_geoms([1, 3, 6],
                           a=[[0, 0, 0.05], [0, 0, 0.0], [0, 0, 0.02]],
                           b=[[0, 0, 0.15], [0, 0, 0.12], [0, 0, 0.02]],
                           r=[0.08, 0.07, 0.06], dtype=jnp.float64)
    obstacles = col.make_obstacles(a=[[0.4, 0.1, 0.6]], r=0.15,
                                   dtype=jnp.float64)
    cm = col.make_collision_model(geoms, topology=model.topology,
                                  obstacles=obstacles)
    return model, cm


def test_auto_pairs_exclude_adjacent():
    model, cm = _arm_setup()
    # links 1 and 3 are 2 apart on the serial chain → candidate; geoms on
    # the same link never pair
    assert (0, 1) in cm.pairs
    for gi, gj in cm.pairs:
        assert cm.geoms.links[gi] != cm.geoms.links[gj]


def test_gap_gradient_is_normal_row():
    """Envelope identity: d(gap)/dq equals the normal row of the contact
    Jacobian (witness-point motion along the surfaces contributes nothing
    at the closest points) — validates signs, frames, and the Jacobian."""
    model, cm = _arm_setup()
    q = jnp.asarray(np.linspace(0.3, 1.2, model.n))
    gaps, J = col.collision_rows(model, q, cm)
    Gq = jax.jacfwd(lambda qq: col.collision_distances(model, qq, cm))(q)
    np.testing.assert_allclose(np.asarray(Gq), np.asarray(J[2::3]),
                               atol=1e-9)


def test_fb_rows_self_pair_base_invariant():
    """Self-collision gaps don't depend on base pose; obstacle gaps do."""
    desc, _, _ = get_setup("hyq")
    ffm = free_flyer_model(desc)
    geoms = col.make_geoms([0, 4], a=[[0, 0, 0.1], [0, 0, 0.1]], r=0.05,
                           dtype=jnp.float64)
    obstacles = col.make_obstacles(a=[[1.0, 0.0, 0.4]], r=0.2,
                                   dtype=jnp.float64)
    cm = col.make_collision_model(geoms, topology=ffm.arm.topology,
                                  obstacles=obstacles)
    q = jnp.asarray(np.linspace(-0.4, 0.4, ffm.n))
    quat1 = jnp.asarray([1.0, 0, 0, 0])
    quat2 = jnp.asarray([0.9, 0.1, -0.2, 0.3])
    quat2 = quat2 / jnp.linalg.norm(quat2)
    g1, _ = col.fb_collision_rows(ffm, quat1, jnp.zeros(3), q, cm)
    g2, _ = col.fb_collision_rows(ffm, quat2, jnp.ones(3), q, cm)
    n_self = len(cm.pairs)
    np.testing.assert_allclose(np.asarray(g1[:n_self]),
                               np.asarray(g2[:n_self]), atol=1e-10)
    assert np.max(np.abs(np.asarray(g1[n_self:] - g2[n_self:]))) > 1e-3


def test_fb_gap_gradient_is_normal_row():
    """Same envelope identity through the free-flyer tangent space: the
    time-derivative of each gap along (vb, q̇) equals the normal row of J
    times the tangent — checked with jvp through (quat, pos, q) motion."""
    desc, _, _ = get_setup("hyq")
    from gridcodegenerator_tpu.ops.freeflyer import (quat_exp_body,
                                                     quat_mul, quat_to_rot)
    ffm = free_flyer_model(desc)
    geoms = col.make_geoms([2, 7], a=[[0, 0, 0.15], [0, 0, 0.15]],
                           b=[[0, 0, 0.3], [0, 0, 0.3]], r=0.06,
                           dtype=jnp.float64)
    obstacles = col.make_obstacles(a=[[0.5, 0.2, 0.0]],
                                   b=[[0.5, 0.2, 0.8]], r=0.1,
                                   dtype=jnp.float64)
    cm = col.make_collision_model(geoms, topology=ffm.arm.topology,
                                  obstacles=obstacles)
    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.uniform(-0.5, 0.5, ffm.n))
    quat = jnp.asarray([0.8, 0.2, -0.1, 0.4])
    quat = quat / jnp.linalg.norm(quat)
    pos = jnp.asarray([0.1, -0.2, 0.55])
    vb = jnp.asarray(rng.standard_normal(6))
    qd = jnp.asarray(rng.standard_normal(ffm.n))

    def gaps_at(t):
        # integrate the twist for time t (exact to first order at t=0)
        quat_t = quat_mul(quat, quat_exp_body(vb[:3] * t))
        pos_t = pos + t * (quat_to_rot(quat) @ vb[3:])
        return col.fb_collision_distances(ffm, quat_t, pos_t, q + t * qd,
                                          cm)

    _, dgap = jax.jvp(gaps_at, (0.0,), (1.0,))
    _, J = col.fb_collision_rows(ffm, quat, pos, q, cm)
    v = jnp.concatenate([vb, qd])
    np.testing.assert_allclose(np.asarray(dgap), np.asarray(J[2::3] @ v),
                               atol=1e-9)


def test_step_ground_with_obstacle():
    """Stepper integration: a quadruped walking into a sphere obstacle gets
    a pushing impulse and separates; far from it, the step is bitwise the
    collision-free step."""
    desc, _, _ = get_setup("hyq")
    ffm = free_flyer_model(desc)
    links = tuple(range(min(4, ffm.n)))
    offsets = np.zeros((len(links), 3))
    geoms = col.make_geoms([ffm.n - 1], a=[[0, 0, 0.0]], r=0.1,
                           dtype=jnp.float64)

    state = (jnp.asarray([1.0, 0, 0, 0]), jnp.asarray([0.0, 0.0, 0.8]),
             jnp.zeros(ffm.n), jnp.zeros(6), jnp.zeros(ffm.n))
    tau = jnp.zeros(ffm.n)

    # obstacle far away: identical to the collision-free step
    far = col.make_collision_model(
        geoms, obstacles=col.make_obstacles(a=[[50.0, 0, 0.5]], r=0.2,
                                            dtype=jnp.float64))
    s0, p0 = ct.fb_step_ground(ffm, state, tau, 1e-2, links, offsets)
    s1, p1 = ct.fb_step_ground(ffm, state, tau, 1e-2, links, offsets,
                               collision=far)
    for a, b in zip(s0, s1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-12)
    assert p1.shape == (len(links) + 1, 3)
    np.testing.assert_allclose(np.asarray(p1[-1]), 0.0, atol=1e-12)

    # overlapping obstacle just under the geom: normal impulse pushes
    from gridcodegenerator_tpu.ops.kinematics import fk
    R, p = fk(ffm.arm, state[2])
    geom_w = np.asarray(state[1] + p[ffm.n - 1])  # identity base rotation
    near = col.make_collision_model(
        geoms, obstacles=col.make_obstacles(
            a=[[geom_w[0], geom_w[1], geom_w[2] - 0.12]], r=0.05,
            dtype=jnp.float64))
    s2, p2 = ct.fb_step_ground(ffm, state, tau, 1e-2, links, offsets,
                               collision=near, mu_collision=0.6)
    assert float(p2[-1, 2]) > 0.0  # pushing, never pulling
    gaps_after = col.fb_collision_distances(ffm, s2[0], s2[1], s2[2], near)
    gaps_before = col.fb_collision_distances(ffm, *state[:3], near)
    assert float(gaps_after[0]) > float(gaps_before[0]) - 1e-6


def test_fb_collision_rows_bl_matches_single():
    """Batch-last collision rows == stacked single-state rows."""
    desc, _, _ = get_setup("hyq")
    ffm = free_flyer_model(desc)
    geoms = col.make_geoms([1, 5], a=[[0, 0, 0.1], [0, 0, 0.05]],
                           b=[[0, 0, 0.25], [0, 0, 0.2]], r=0.07,
                           dtype=jnp.float64)
    obstacles = col.make_obstacles(a=[[0.6, -0.1, 0.3]], r=0.25,
                                   dtype=jnp.float64)
    cm = col.make_collision_model(geoms, topology=ffm.arm.topology,
                                  obstacles=obstacles)
    rng = np.random.default_rng(11)
    B = 3
    quats = rng.standard_normal((B, 4))
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    poss = rng.standard_normal((B, 3))
    qs = rng.uniform(-0.5, 0.5, (B, ffm.n))
    g_bl, J_bl = col.fb_collision_rows_bl(
        ffm, jnp.asarray(quats.T), jnp.asarray(poss.T), jnp.asarray(qs.T),
        cm)
    for e in range(B):
        g1, J1 = col.fb_collision_rows(ffm, jnp.asarray(quats[e]),
                                       jnp.asarray(poss[e]),
                                       jnp.asarray(qs[e]), cm)
        np.testing.assert_allclose(np.asarray(g_bl[:, e]), np.asarray(g1),
                                   atol=1e-11)
        np.testing.assert_allclose(np.asarray(J_bl[..., e]), np.asarray(J1),
                                   atol=1e-11)


def test_step_ground_batched_collision_matches_single():
    """Batched stepper with collision == per-environment single steps."""
    desc, _, _ = get_setup("hyq")
    ffm = free_flyer_model(desc)
    links = (0, 1, 2, 3)
    offsets = np.zeros((4, 3))
    geoms = col.make_geoms([ffm.n - 1, ffm.n - 3],
                           a=[[0, 0, 0], [0, 0, 0]], r=0.12,
                           dtype=jnp.float64)
    obstacles = col.make_obstacles(a=[[0.2, 0.1, 0.45]], r=0.2,
                                   dtype=jnp.float64)
    cm = col.make_collision_model(geoms, topology=ffm.arm.topology,
                                  obstacles=obstacles)
    rng = np.random.default_rng(2)
    B = 3
    quats = np.tile([1.0, 0, 0, 0], (B, 1))
    poss = np.column_stack([rng.uniform(-0.1, 0.1, B),
                            rng.uniform(-0.1, 0.1, B),
                            rng.uniform(0.45, 0.6, B)])
    qs = rng.uniform(-0.2, 0.2, (B, ffm.n))
    vbs = 0.3 * rng.standard_normal((B, 6))
    qds = 0.3 * rng.standard_normal((B, ffm.n))
    taus = rng.standard_normal((B, ffm.n))
    state_b = tuple(jnp.asarray(a) for a in (quats, poss, qs, vbs, qds))
    nxt, imp = ct.fb_step_ground_batched(ffm, state_b, jnp.asarray(taus),
                                         5e-3, links, offsets, impl="vmap",
                                         collision=cm, mu_collision=0.6)
    assert imp.shape == (B, len(links) + cm.n_contacts, 3)
    for e in range(B):
        s1 = tuple(jnp.asarray(a[e]) for a in (quats, poss, qs, vbs, qds))
        n1, i1 = ct.fb_step_ground(ffm, s1, jnp.asarray(taus[e]), 5e-3,
                                   links, offsets, collision=cm,
                                   mu_collision=0.6)
        for a, b in zip(nxt, n1):
            np.testing.assert_allclose(np.asarray(a[e]), np.asarray(b),
                                       atol=1e-9)
        np.testing.assert_allclose(np.asarray(imp[e]), np.asarray(i1),
                                   atol=1e-9)


def _base_geom_setup():
    """HyQ free-flyer with a torso capsule on the BASE (link -1), a leg
    geom, and a world obstacle — base-geom self pair + base-geom obstacle
    pair both in the candidate list."""
    desc, _, _ = get_setup("hyq")
    ffm = free_flyer_model(desc)
    geoms = col.make_geoms([-1, 5],
                           a=[[-0.3, 0, 0.05], [0, 0, 0.1]],
                           b=[[0.3, 0, 0.05], [0, 0, 0.3]],
                           r=[0.12, 0.06], dtype=jnp.float64)
    obstacles = col.make_obstacles(a=[[0.4, 0.1, 0.2]], r=0.15,
                                   dtype=jnp.float64)
    cm = col.make_collision_model(geoms, topology=ffm.arm.topology,
                                  obstacles=obstacles)
    return ffm, cm


def test_base_geom_auto_pairs_and_fixed_base_reject():
    ffm, cm = _base_geom_setup()
    # base-vs-link-5 pair is a candidate (tree distance = depth+1 >= 2)
    assert (0, 1) in cm.pairs
    # base geoms are adjacent to root links: never paired with them
    root = [i for i, p in enumerate(ffm.arm.topology.parents) if p < 0]
    g2 = col.make_geoms([-1, root[0]], a=[[0, 0, 0], [0, 0, 0]], r=0.05,
                        dtype=jnp.float64)
    assert col.auto_pairs(ffm.arm.topology, g2) == ()
    # fixed-base queries reject base geoms with a clear message
    with pytest.raises(ValueError, match="free-flyer-only"):
        col.collision_rows(ffm.arm, jnp.zeros(ffm.n), cm)


def test_base_geom_gap_gradient_is_normal_row():
    """The envelope identity through (quat, pos, q) motion with a BASE
    capsule: validates the zero arm columns + base-column cancellation of
    the self pair and the full base block of the obstacle pair."""
    from gridcodegenerator_tpu.ops.freeflyer import (quat_exp_body,
                                                     quat_mul, quat_to_rot)
    ffm, cm = _base_geom_setup()
    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.uniform(-0.5, 0.5, ffm.n))
    quat = jnp.asarray([0.7, -0.3, 0.2, 0.5])
    quat = quat / jnp.linalg.norm(quat)
    pos = jnp.asarray([0.05, -0.1, 0.5])
    vb = jnp.asarray(rng.standard_normal(6))
    qd = jnp.asarray(rng.standard_normal(ffm.n))

    def gaps_at(t):
        quat_t = quat_mul(quat, quat_exp_body(vb[:3] * t))
        pos_t = pos + t * (quat_to_rot(quat) @ vb[3:])
        return col.fb_collision_distances(ffm, quat_t, pos_t, q + t * qd,
                                          cm)

    _, dgap = jax.jvp(gaps_at, (0.0,), (1.0,))
    gaps, J = col.fb_collision_rows(ffm, quat, pos, q, cm)
    v = jnp.concatenate([vb, qd])
    np.testing.assert_allclose(np.asarray(dgap), np.asarray(J[2::3] @ v),
                               atol=1e-9)
    # the self pair's gap is base-pose invariant; the obstacle pair's isn't
    g2, _ = col.fb_collision_rows(ffm, jnp.asarray([1.0, 0, 0, 0]),
                                  jnp.zeros(3), q, cm)
    np.testing.assert_allclose(float(gaps[0]), float(g2[0]), atol=1e-10)
    assert abs(float(gaps[1]) - float(g2[1])) > 1e-3


def test_base_geom_bl_and_stepper_match_single():
    """Batch-last rows and the batched stepper agree with the single-state
    path when the collision set contains a base geom."""
    ffm, cm = _base_geom_setup()
    rng = np.random.default_rng(3)
    B = 3
    quats = rng.standard_normal((B, 4))
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    poss = np.column_stack([rng.uniform(-0.1, 0.1, (B, 2)),
                            rng.uniform(0.5, 0.7, B)[:, None]]
                           ).reshape(B, 3)
    qs = rng.uniform(-0.3, 0.3, (B, ffm.n))
    g_bl, J_bl = col.fb_collision_rows_bl(
        ffm, jnp.asarray(quats.T), jnp.asarray(poss.T), jnp.asarray(qs.T),
        cm)
    for e in range(B):
        g1, J1 = col.fb_collision_rows(ffm, jnp.asarray(quats[e]),
                                       jnp.asarray(poss[e]),
                                       jnp.asarray(qs[e]), cm)
        np.testing.assert_allclose(np.asarray(g_bl[:, e]), np.asarray(g1),
                                   atol=1e-11)
        np.testing.assert_allclose(np.asarray(J_bl[..., e]),
                                   np.asarray(J1), atol=1e-11)
    # stepper end-to-end (XLA bl path) == per-env single steps
    links = (0, 1, 2, 3)
    offsets = np.zeros((4, 3))
    quats0 = np.tile([1.0, 0, 0, 0], (B, 1))
    vbs = 0.2 * rng.standard_normal((B, 6))
    qds = 0.2 * rng.standard_normal((B, ffm.n))
    taus = rng.standard_normal((B, ffm.n))
    state_b = tuple(jnp.asarray(a) for a in (quats0, poss, qs, vbs, qds))
    nxt, imp = ct.fb_step_ground_batched(ffm, state_b, jnp.asarray(taus),
                                         5e-3, links, offsets, impl="bl",
                                         collision=cm, mu_collision=0.5)
    for e in range(B):
        s1 = tuple(jnp.asarray(a[e]) for a in (quats0, poss, qs, vbs, qds))
        n1, i1 = ct.fb_step_ground(ffm, s1, jnp.asarray(taus[e]), 5e-3,
                                   links, offsets, collision=cm,
                                   mu_collision=0.5)
        for a, b in zip(nxt, n1):
            np.testing.assert_allclose(np.asarray(a[e]), np.asarray(b),
                                       atol=1e-9)
        np.testing.assert_allclose(np.asarray(imp[e]), np.asarray(i1),
                                   atol=1e-9)


# ---------------------------------------------------------------- ground geoms
def _ground_geom_setup():
    """HyQ free-flyer with a base torso capsule, a leg capsule, and a leg
    sphere as ground_geoms — covers base/link owners and 2/1-contact
    geoms."""
    desc, _, _ = get_setup("hyq")
    ffm = free_flyer_model(desc)
    gg = col.make_geoms([-1, 2, 7],
                        a=[[-0.3, 0, -0.02], [0, 0, 0], [0.1, 0, 0.05]],
                        b=[[0.3, 0, -0.02], [0.3, 0, 0], [0.1, 0, 0.05]],
                        r=[0.25, 0.08, 0.06], dtype=jnp.float64)
    return ffm, gg


def test_ground_geom_contact_counts():
    _, gg = _ground_geom_setup()
    assert col.n_ground_contacts(gg) == 5  # 2 + 2 + 1 (sphere)


def test_ground_geom_gap_gradient_is_normal_row():
    """Plane envelope identity (EXACT — the r·n offset is normal to n):
    d(gap)/dt along (vb, q̇) equals the normal row times the tangent."""
    from gridcodegenerator_tpu.ops.freeflyer import (quat_exp_body,
                                                     quat_mul, quat_to_rot)
    ffm, gg = _ground_geom_setup()
    rng = np.random.default_rng(9)
    q = jnp.asarray(rng.uniform(-0.5, 0.5, ffm.n))
    quat = jnp.asarray([0.9, 0.1, -0.3, 0.2])
    quat = quat / jnp.linalg.norm(quat)
    pos = jnp.asarray([0.1, 0.2, 0.5])
    vb = jnp.asarray(rng.standard_normal(6))
    qd = jnp.asarray(rng.standard_normal(ffm.n))

    def gaps_at(t):
        quat_t = quat_mul(quat, quat_exp_body(vb[:3] * t))
        pos_t = pos + t * (quat_to_rot(quat) @ vb[3:])
        return col.fb_ground_geom_rows(ffm, quat_t, pos_t, q + t * qd,
                                       gg)[0]

    _, dgap = jax.jvp(gaps_at, (0.0,), (1.0,))
    _, J = col.fb_ground_geom_rows(ffm, quat, pos, q, gg)
    v = jnp.concatenate([vb, qd])
    np.testing.assert_allclose(np.asarray(dgap), np.asarray(J[2::3] @ v),
                               atol=1e-10)


def test_ground_geom_flat_terrain_matches_plane():
    """Ground-geom rows on a flat heightfield at h == ground_z equal the
    plane rows."""
    from gridcodegenerator_tpu.ops import terrain as terr
    ffm, gg = _ground_geom_setup()
    rng = np.random.default_rng(4)
    q = jnp.asarray(rng.uniform(-0.4, 0.4, ffm.n))
    quat = jnp.asarray([0.8, -0.2, 0.1, 0.3])
    quat = quat / jnp.linalg.norm(quat)
    pos = jnp.asarray([0.0, -0.1, 0.45])
    flat = terr.make_terrain(np.full((6, 6), 0.1), cell=1.0,
                             origin=(-3.0, -3.0), dtype=jnp.float64)
    g_p, J_p = col.fb_ground_geom_rows(ffm, quat, pos, q, gg, ground_z=0.1)
    g_t, J_t = col.fb_ground_geom_rows(ffm, quat, pos, q, gg, terrain=flat)
    np.testing.assert_allclose(np.asarray(g_t), np.asarray(g_p), atol=1e-12)
    np.testing.assert_allclose(np.asarray(J_t), np.asarray(J_p), atol=1e-12)


def test_ground_geom_capsule_rests_at_radius():
    """Statics: a base capsule dropped on the plane settles with its axis
    at z = r − z_offset; both endpoint contacts carry impulse (flat
    resting, not a single-point wobble)."""
    ffm, _ = _ground_geom_setup()
    n = ffm.n
    gg = col.make_geoms([-1], a=[[-0.3, 0, -0.02]], b=[[0.3, 0, -0.02]],
                        r=0.25, dtype=jnp.float64)
    feet = (2, 5, 8, 11)
    offs = np.tile([0.0, 0.0, 2.0], (4, 1))   # feet never touch
    step = jax.jit(lambda s: ct.fb_step_ground(
        ffm, s, jnp.zeros(n), 2e-3, feet, offs, mu=0.7,
        ground_geoms=gg, mu_ground=0.7))
    s = (jnp.asarray([1.0, 0, 0, 0]), jnp.asarray([0.0, 0.0, 0.6]),
         jnp.zeros(n), jnp.zeros(6), jnp.zeros(n))
    for _ in range(900):
        s, imp = step(s)
    assert abs(float(s[1][2]) - 0.27) < 5e-3
    assert imp.shape == (4 + 2, 3)
    assert float(imp[4, 2]) > 0 and float(imp[5, 2]) > 0


def test_ground_geom_bl_and_stepper_match_single():
    """Batch-last rows == single-state rows (plane AND terrain), and the
    batched stepper (XLA bl body) == per-env single steps with
    ground_geoms active."""
    from gridcodegenerator_tpu.ops import terrain as terr
    ffm, gg = _ground_geom_setup()
    rng = np.random.default_rng(12)
    B = 3
    quats = rng.standard_normal((B, 4))
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    poss = np.column_stack([rng.uniform(-0.2, 0.2, (B, 2)),
                            rng.uniform(0.3, 0.5, B)[:, None]]
                           ).reshape(B, 3)
    qs = rng.uniform(-0.3, 0.3, (B, ffm.n))
    hills = terr.make_terrain(0.08 * rng.standard_normal((7, 7)),
                              cell=0.8, origin=(-2.8, -2.8),
                              dtype=jnp.float64)
    for terrain in (None, hills):
        g_bl, J_bl = col.fb_ground_geom_rows_bl(
            ffm, jnp.asarray(quats.T), jnp.asarray(poss.T),
            jnp.asarray(qs.T), gg, terrain=terrain)
        for e in range(B):
            g1, J1 = col.fb_ground_geom_rows(
                ffm, jnp.asarray(quats[e]), jnp.asarray(poss[e]),
                jnp.asarray(qs[e]), gg, terrain=terrain)
            np.testing.assert_allclose(np.asarray(g_bl[:, e]),
                                       np.asarray(g1), atol=1e-11)
            np.testing.assert_allclose(np.asarray(J_bl[..., e]),
                                       np.asarray(J1), atol=1e-11)
    # stepper end-to-end (upright quats so contacts actually activate)
    links = (0, 1, 2, 3)
    offsets = np.zeros((4, 3))
    quats0 = np.tile([1.0, 0, 0, 0], (B, 1))
    vbs = 0.2 * rng.standard_normal((B, 6))
    qds = 0.2 * rng.standard_normal((B, ffm.n))
    taus = rng.standard_normal((B, ffm.n))
    poss0 = np.column_stack([rng.uniform(-0.1, 0.1, (B, 2)),
                             rng.uniform(0.35, 0.45, B)[:, None]]
                            ).reshape(B, 3)
    state_b = tuple(jnp.asarray(a) for a in (quats0, poss0, qs, vbs, qds))
    nxt, imp = ct.fb_step_ground_batched(
        ffm, state_b, jnp.asarray(taus), 5e-3, links, offsets, impl="bl",
        ground_geoms=gg, mu_ground=0.5)
    assert imp.shape == (B, 4 + col.n_ground_contacts(gg), 3)
    touched = 0
    for e in range(B):
        s1 = tuple(jnp.asarray(a[e]) for a in (quats0, poss0, qs, vbs, qds))
        n1, i1 = ct.fb_step_ground(ffm, s1, jnp.asarray(taus[e]), 5e-3,
                                   links, offsets, ground_geoms=gg,
                                   mu_ground=0.5)
        for a, b in zip(nxt, n1):
            np.testing.assert_allclose(np.asarray(a[e]), np.asarray(b),
                                       atol=1e-9)
        np.testing.assert_allclose(np.asarray(imp[e]), np.asarray(i1),
                                   atol=1e-9)
        touched += int(np.abs(np.asarray(i1)[4:]).max() > 1e-9)
    assert touched, "no geom-ground contact active — vacuous"
