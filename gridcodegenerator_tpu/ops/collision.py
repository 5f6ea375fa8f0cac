"""Collision primitives: capsule/sphere geoms, distance queries, and
contact-row generation for the frictional steppers.

Beyond the reference (GRiDCodeGenerator has no geometry at all — its contact
obligations end at the dynamics algorithms); this layer exists because the
frameworks users actually migrate from (MuJoCo-style simulators) pair the
dynamics engine with primitive collision. Design constraints are the
engine's usual ones: **static shapes** (a fixed candidate-pair list resolved
at trace time, activation masks instead of variable contact counts — the
same specialize-at-compile-time stance as the reference's topology
unrolling, ``GRiDCodeGenerator.py:241-310``) and **differentiability**
(closed-form clamped segment-segment distance; gradients flow through
positions, radii, and obstacle placement — usable for contact-aware
trajectory optimization).

One primitive: the **capsule** — a segment [a, b] in link (or world) frame
with radius r; a sphere is the degenerate a == b case. Every pair type
(sphere-sphere, sphere-capsule, capsule-capsule) is then ONE code path:
segment-segment closest points minus the radii.

Contact rows follow the stepper conventions (``ops/contact.py``): per
contact a [t1, t2, n] triplet in world frame, n pointing from the second
body (or obstacle) toward the first, so the normal velocity of separation
is ``n · v_rel`` and the rows drop into the PGS cone solve exactly like
foot-ground rows. For self-collision pairs the two point Jacobians are
differenced at the shared contact point — the free-flyer base blocks cancel
analytically (relative velocity of coincident points is base-invariant), so
only arm columns remain.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp

_EPS = 1e-12


class Geoms(NamedTuple):
    """Capsule geoms attached to robot links (spheres: ``a == b``).

    ``links[i] == -1`` attaches geom i to the FLOATING BASE (the MuJoCo
    quadruped-torso pattern): its endpoints are base-frame constants, its
    arm Jacobian columns are zero, and in self pairs the base columns
    cancel like any other pair. Base geoms are free-flyer-only — the
    fixed-base queries reject them (a geom welded to a fixed base is
    static world geometry: express it as an :class:`Obstacles` entry)."""
    links: Tuple[int, ...]     # static: owning link per geom (-1 = base)
    a: jnp.ndarray             # (g, 3) segment start, link frame
    b: jnp.ndarray             # (g, 3) segment end, link frame
    r: jnp.ndarray             # (g,)  radii


class Obstacles(NamedTuple):
    """Static world-frame capsule/sphere obstacles."""
    a: jnp.ndarray             # (w, 3)
    b: jnp.ndarray             # (w, 3)
    r: jnp.ndarray             # (w,)


class CollisionModel(NamedTuple):
    """Candidate-pair collision set (all pair lists are trace-time static).

    ``pairs``: geom-geom self-collision candidates (indices into ``geoms``);
    ``obs_pairs``: (geom, obstacle) candidates. Build with
    :func:`make_collision_model`, which defaults ``obs_pairs`` to the full
    cross product and ``pairs`` to non-adjacent link pairs."""
    geoms: Geoms
    pairs: Tuple[Tuple[int, int], ...]
    obstacles: Optional[Obstacles]
    obs_pairs: Tuple[Tuple[int, int], ...]

    @property
    def n_contacts(self) -> int:
        return len(self.pairs) + len(self.obs_pairs)


def make_geoms(links, a, b=None, r=0.05, dtype=jnp.float32) -> Geoms:
    """``b=None`` makes every geom a sphere at ``a``."""
    a = jnp.asarray(a, dtype).reshape(len(links), 3)
    b = a if b is None else jnp.asarray(b, dtype).reshape(len(links), 3)
    r = jnp.broadcast_to(jnp.asarray(r, dtype), (len(links),))
    return Geoms(tuple(int(l) for l in links), a, b, r)


def make_obstacles(a, b=None, r=0.05, dtype=jnp.float32) -> Obstacles:
    a = jnp.atleast_2d(jnp.asarray(a, dtype))
    b = a if b is None else jnp.atleast_2d(jnp.asarray(b, dtype))
    r = jnp.broadcast_to(jnp.asarray(r, dtype), (a.shape[0],))
    return Obstacles(a, b, r)


def auto_pairs(topology, geoms: Geoms, min_separation: int = 2):
    """Self-collision candidates: geom pairs whose links are at least
    ``min_separation`` apart along the kinematic tree (adjacent links
    mechanically overlap at the joint — excluding them is the standard
    MuJoCo-style default). The base (link -1) sits one joint above every
    root link: dist(base, j) = depth(j) + 1."""
    n = topology.n
    anc = [set(topology.ancestors[i]) | {i} for i in range(n)]

    def tree_dist(i, j):
        if i == -1 or j == -1:
            k = j if i == -1 else i
            return len(anc[k])          # = depth(k) + 1
        common = anc[i] & anc[j]
        depth = lambda s: max(len(anc[k]) for k in s) if s else 0
        return (len(anc[i]) - depth(common)) + (len(anc[j]) - depth(common))

    out = []
    for gi in range(len(geoms.links)):
        for gj in range(gi + 1, len(geoms.links)):
            li, lj = geoms.links[gi], geoms.links[gj]
            if li == lj:
                continue
            if tree_dist(li, lj) >= min_separation:
                out.append((gi, gj))
    return tuple(out)


def make_collision_model(geoms: Geoms, topology=None, pairs=None,
                         obstacles: Optional[Obstacles] = None,
                         obs_pairs=None,
                         min_separation: int = 2) -> CollisionModel:
    if pairs is None:
        pairs = (auto_pairs(topology, geoms, min_separation)
                 if topology is not None else ())
    if obstacles is None:
        obs_pairs = ()
    elif obs_pairs is None:
        obs_pairs = tuple((g, w) for g in range(len(geoms.links))
                          for w in range(obstacles.a.shape[0]))
    return CollisionModel(geoms, tuple(pairs), obstacles, tuple(obs_pairs))


def _check_geoms(n_links: int, cm: CollisionModel, allow_base: bool = True):
    """Fail fast on malformed collision sets (the ``_check_contacts``
    analog): geom links in range, pair indices valid. ``allow_base``:
    accept link -1 (floating-base geoms) — the free-flyer entry points do,
    the fixed-base ones don't (a base geom is static there: use an
    obstacle)."""
    g = len(cm.geoms.links)
    lo = -1 if allow_base else 0
    bad = [l for l in cm.geoms.links if not lo <= l < n_links]
    if bad:
        hint = ("" if allow_base else
                " (link -1 = base geoms are free-flyer-only; for a fixed "
                "base express them as obstacles)")
        raise ValueError(f"collision geom links {bad} out of range "
                         f"[{lo}, {n_links}){hint}")
    for gi, gj in cm.pairs:
        if not (0 <= gi < g and 0 <= gj < g):
            raise ValueError(f"self-collision pair ({gi}, {gj}) out of "
                             f"range for {g} geoms")
    w = 0 if cm.obstacles is None else cm.obstacles.a.shape[0]
    for gi, wi in cm.obs_pairs:
        if not (0 <= gi < g and 0 <= wi < w):
            raise ValueError(f"obstacle pair ({gi}, {wi}) out of range "
                             f"({g} geoms, {w} obstacles)")


# ------------------------------------------------------------- geometry
def _seg_seg_closest(p1, q1, p2, q2):
    """Closest points between segments [p1,q1] and [p2,q2] (3,)-vectors.

    Ericson's clamped closed form (Real-Time Collision Detection §5.1.9)
    written branch-free for jit: degenerate (zero-length) segments fall out
    of the same algebra via the regularized denominators, so spheres need
    no special case. Differentiable a.e. (kinks only at exactly-parallel
    segments and clamp boundaries — measure-zero in q)."""
    d1 = q1 - p1
    d2 = q2 - p2
    rv = p1 - p2
    a = jnp.dot(d1, d1)
    e = jnp.dot(d2, d2)
    b = jnp.dot(d1, d2)
    c = jnp.dot(d1, rv)
    f = jnp.dot(d2, rv)
    denom = a * e - b * b
    # s on segment 1 (general position), guarded for parallel/degenerate
    s = jnp.clip(jnp.where(denom > _EPS, (b * f - c * e)
                           / jnp.maximum(denom, _EPS), 0.0), 0.0, 1.0)
    # t from s, then re-clamp s from the clamped t (one Ericson iteration)
    t = jnp.clip((b * s + f) / jnp.maximum(e, _EPS), 0.0, 1.0)
    s = jnp.clip((b * t - c) / jnp.maximum(a, _EPS), 0.0, 1.0)
    w1 = p1 + s * d1
    w2 = p2 + t * d2
    return w1, w2


def _contact_frame_cols(n):
    """[t1, t2, n] rows (3, 3) for a unit normal (3,) — Duff et al. style
    branchless orthonormal basis, matching ``terrain.contact_frame``'s row
    order convention (rows are the frame axes)."""
    sign = jnp.where(n[2] >= 0.0, 1.0, -1.0)
    aa = -1.0 / (sign + n[2] + jnp.where(n[2] >= 0.0, _EPS, -_EPS))
    bb = n[0] * n[1] * aa
    t1 = jnp.stack([1.0 + sign * n[0] * n[0] * aa, sign * bb,
                    -sign * n[0]])
    t2 = jnp.stack([bb, sign + n[1] * n[1] * aa, -n[1]])
    return jnp.stack([t1, t2, n])


def _pair_geometry(cA, dA, rA, cB, dB, rB):
    """gap, unit normal (B→A), and shared contact point for two capsules
    given segment (start, vector) forms in a common frame."""
    wA, wB = _seg_seg_closest(cA, cA + dA, cB, cB + dB)
    diff = wA - wB
    dist = jnp.sqrt(jnp.dot(diff, diff) + _EPS)
    nrm = diff / dist
    gap = dist - rA - rB
    point = 0.5 * ((wA - rA * nrm) + (wB + rB * nrm))
    return gap, nrm, point


# --------------------------------------------------- fixed-base queries
def _arm_point_jac(model, Rw, pw, link, x):
    """(3, n) linear Jacobian of a (traced) point ``x`` rigidly attached to
    ``link``, all in the frame of ``Rw/pw`` (world for fixed base, base
    coords for the free-flyer arm). Same trace-time column sparsity as
    :func:`..kinematics.world_jacobian`. ``link == -1`` (base-attached
    point): every arm column is zero."""
    topo = model.topology
    n = topo.n
    if link < 0:
        return jnp.zeros((3, n), x.dtype)
    support = set(topo.ancestors[link]) | {link}
    cols = []
    for j in range(n):
        if j not in support:
            cols.append(jnp.zeros(3, x.dtype))
            continue
        a_ang = Rw[j] @ model.S[j, :3]
        a_lin = Rw[j] @ model.S[j, 3:]
        cols.append(jnp.cross(a_ang, x - pw[j]) + a_lin)
    return jnp.stack(cols, axis=1)


def _geom_segments(cm: CollisionModel, R, p):
    """World/base segment (start, vector) of every geom under FK (R, p).
    Base geoms (link -1) are identity-placed: their endpoints already live
    in the FK frame (base coords for the free-flyer arm)."""
    g = cm.geoms
    dtype = p[0].dtype
    starts = [g.a[i].astype(dtype) if l < 0 else p[l] + R[l] @ g.a[i]
              for i, l in enumerate(g.links)]
    vecs = [(g.b[i] - g.a[i]).astype(dtype) if l < 0
            else R[l] @ (g.b[i] - g.a[i]) for i, l in enumerate(g.links)]
    return starts, vecs


def collision_rows(model, q, cm: CollisionModel):
    """Fixed-base contact rows: returns ``(gaps (c,), J (3c, n))`` with J in
    [t1, t2, n] triplets, world frame, for the static candidate list
    (self pairs first, then obstacle pairs)."""
    from .kinematics import fk

    _check_geoms(model.topology.n, cm, allow_base=False)
    R, p = fk(model, q)
    starts, vecs = _geom_segments(cm, R, p)
    g = cm.geoms
    gaps, rows = [], []
    for gi, gj in cm.pairs:
        gap, nrm, pt = _pair_geometry(starts[gi], vecs[gi], g.r[gi],
                                      starts[gj], vecs[gj], g.r[gj])
        Jrel = (_arm_point_jac(model, R, p, g.links[gi], pt)
                - _arm_point_jac(model, R, p, g.links[gj], pt))
        gaps.append(gap)
        rows.append(_contact_frame_cols(nrm) @ Jrel)
    if cm.obstacles is not None:
        ob = cm.obstacles
        for gi, w in cm.obs_pairs:
            gap, nrm, pt = _pair_geometry(
                starts[gi], vecs[gi], g.r[gi],
                ob.a[w].astype(q.dtype), (ob.b[w] - ob.a[w]).astype(q.dtype),
                ob.r[w])
            J = _arm_point_jac(model, R, p, g.links[gi], pt)
            gaps.append(gap)
            rows.append(_contact_frame_cols(nrm) @ J)
    if not gaps:
        return (jnp.zeros((0,), q.dtype),
                jnp.zeros((0, model.topology.n), q.dtype))
    return jnp.stack(gaps), jnp.concatenate(rows, axis=0)


def collision_distances(model, q, cm: CollisionModel):
    """Signed clearances (c,) for the candidate list — the planning/IK
    query (positive = separated by that margin)."""
    return collision_rows(model, q, cm)[0]


# --------------------------------------------------- free-flyer queries
def fb_collision_rows(ffm, quat, pos, q, cm: CollisionModel):
    """Free-flyer contact rows: ``(gaps (c,), J (3c, 6+n))`` world-frame
    [t1, t2, n] triplets over tangent velocities [vb; q̇] — directly
    appendable to the foot rows of ``contact.fb_step_ground``.

    Self pairs: the base twist acts identically on both coincident contact
    points, so its columns cancel and only the arm-column difference
    remains. Obstacle pairs carry the full base block
    ``R·[−x̂_b | I₃]`` like :func:`..contact.fb_contact_jacobian`."""
    from .freeflyer import quat_to_rot
    from .kinematics import fk
    from .spatial import skew

    arm = ffm.arm
    n = arm.topology.n
    _check_geoms(n, cm)
    R = quat_to_rot(quat)
    Rbl, pbl = fk(arm, q)                      # arm FK in base coords
    starts, vecs = _geom_segments(cm, Rbl, pbl)
    g = cm.geoms
    eye3 = jnp.eye(3, dtype=q.dtype)
    gaps, rows = [], []
    for gi, gj in cm.pairs:
        gap, nrm_b, pt_b = _pair_geometry(starts[gi], vecs[gi], g.r[gi],
                                          starts[gj], vecs[gj], g.r[gj])
        Jrel_arm = (_arm_point_jac(arm, Rbl, pbl, g.links[gi], pt_b)
                    - _arm_point_jac(arm, Rbl, pbl, g.links[gj], pt_b))
        # world rows: rotate both normal frame and Jacobian by R; base
        # blocks cancel exactly (see docstring)
        J = jnp.concatenate([jnp.zeros((3, 6), q.dtype), R @ Jrel_arm],
                            axis=1)
        gaps.append(gap)
        rows.append(_contact_frame_cols(R @ nrm_b) @ J)
    if cm.obstacles is not None:
        ob = cm.obstacles
        for gi, w in cm.obs_pairs:
            # obstacle segment world → base coords for a common frame
            a_b = R.T @ (ob.a[w].astype(q.dtype) - pos)
            d_b = R.T @ (ob.b[w] - ob.a[w]).astype(q.dtype)
            gap, nrm_b, pt_b = _pair_geometry(starts[gi], vecs[gi], g.r[gi],
                                              a_b, d_b, ob.r[w])
            vb_block = jnp.concatenate([-skew(pt_b), eye3], axis=1)
            J = R @ jnp.concatenate(
                [vb_block, _arm_point_jac(arm, Rbl, pbl, g.links[gi], pt_b)],
                axis=1)
            gaps.append(gap)
            rows.append(_contact_frame_cols(R @ nrm_b) @ J)
    if not gaps:
        return jnp.zeros((0,), q.dtype), jnp.zeros((0, 6 + n), q.dtype)
    return jnp.stack(gaps), jnp.concatenate(rows, axis=0)


def fb_collision_distances(ffm, quat, pos, q, cm: CollisionModel):
    return fb_collision_rows(ffm, quat, pos, q, cm)[0]


# --------------------------------------------------- geom-vs-ground queries
# Capsule/sphere geoms against the stepper's ground plane or heightfield —
# the MuJoCo capsule-feet / fallen-torso pattern. Per geom the contacts are
# its ENDPOINT spheres: one for a sphere (a == b), two for a capsule (a
# lying capsule rests flat on both ends; the unsupported middle of a capsule
# bridging a terrain bump is the documented approximation). The decision is
# trace-time static; traced endpoints (grad w.r.t. geometry) conservatively
# get two contacts — for a sphere the duplicate row is redundant but
# harmless (PGS splits the impulse).
def _ground_contact_list(geoms: Geoms):
    """Static (geom_idx, endpoint_idx ∈ {0, 1}) list, one per ground
    contact."""
    import numpy as np

    import jax

    out = []
    traced = any(isinstance(x, jax.core.Tracer) for x in (geoms.a, geoms.b))
    if not traced:
        # whole-array conversion: indexing a constant INSIDE a jit trace
        # would produce a tracer and break the static decision
        an, bn = np.asarray(geoms.a), np.asarray(geoms.b)
    for i in range(len(geoms.links)):
        out.append((i, 0))
        if traced or not np.allclose(an[i], bn[i]):
            out.append((i, 1))
    return tuple(out)


def n_ground_contacts(geoms: Geoms) -> int:
    """Ground-contact count of a geom set: 2 per capsule, 1 per sphere."""
    return len(_ground_contact_list(geoms))


def fb_ground_geom_rows(ffm, quat, pos, q, geoms: Geoms, ground_z=0.0,
                        terrain=None):
    """Geom-vs-ground contact rows for the free-flyer: ``(gaps (c,),
    J (3c, 6+n))`` in local [t1, t2, n] triplets over [vb; q̇], directly
    appendable to the foot rows of ``contact.fb_step_ground`` — capsule
    feet, shin-scraping, and fallen-torso contacts the point-foot rows
    can't express. Geoms may ride links or the base (link -1).

    Per endpoint sphere (center e, radius r): against the plane the gap is
    ``e_z − r − ground_z`` and the frame is the world axes; against a
    :class:`~.terrain.Terrain` the gap is ``(e_z − h)·n_z − r`` along the
    local surface normal with the heightfield's [t1, t2, n] frame (the
    same measure as the foot rows). The Jacobian is the point Jacobian of
    the MATERIAL point at the contact, x_c = e − r·n (full base block —
    the ground is an 'obstacle', not a self pair); for the plane the
    envelope identity d(gap)/dt = n-row · [vb; q̇] is exact (the r·n
    offset is normal to n, so it drops from the normal velocity)."""
    from .freeflyer import quat_to_rot
    from .kinematics import fk
    from .spatial import skew

    arm = ffm.arm
    n = arm.topology.n
    bad = [l for l in geoms.links if not -1 <= l < n]
    if bad:
        raise ValueError(f"ground-geom links {bad} out of range [-1, {n})")
    R = quat_to_rot(quat)
    Rbl, pbl = fk(arm, q)
    eye3 = jnp.eye(3, dtype=q.dtype)
    ez = jnp.asarray([0.0, 0.0, 1.0], q.dtype)
    gaps, rows = [], []
    for i, e_idx in _ground_contact_list(geoms):
        l = geoms.links[i]
        r = geoms.r[i].astype(q.dtype)
        e0 = (geoms.a[i] if e_idx == 0 else geoms.b[i]).astype(q.dtype)
        e_b = e0 if l < 0 else pbl[l] + Rbl[l] @ e0      # base coords
        e_w = pos + R @ e_b
        if terrain is None:
            nrm_w = ez
            gap = e_w[2] - r - ground_z
            C = eye3
        else:
            from .terrain import contact_frame, terrain_surface
            h, nrm_w = terrain_surface(terrain, e_w[0], e_w[1])
            gap = (e_w[2] - h) * nrm_w[2] - r
            C = contact_frame(nrm_w)
        x_c_b = e_b - r * (R.T @ nrm_w)                  # material point
        vb_block = jnp.concatenate([-skew(x_c_b), eye3], axis=1)
        J = R @ jnp.concatenate(
            [vb_block, _arm_point_jac(arm, Rbl, pbl, l, x_c_b)], axis=1)
        gaps.append(gap)
        rows.append(C @ J)
    if not gaps:
        return jnp.zeros((0,), q.dtype), jnp.zeros((0, 6 + n), q.dtype)
    return jnp.stack(gaps), jnp.concatenate(rows, axis=0)


# ------------------------------------------------ batch-last (TPU layout)
# Same redesign as ops/kinematics.py's batch-last forms: geometry per
# vector component with the environment batch on the lanes, so the
# thousands-of-environments RL shape runs every distance/frame/Jacobian op
# at full register width.
def _seg_seg_closest_bl(p1, d1, p2, d2):
    """Batch-last :func:`_seg_seg_closest`: segment (start (3,B),
    vector (3,B)) pairs → witness points ((3,B), (3,B))."""
    dot = lambda x, y: jnp.sum(x * y, axis=0)
    rv = p1 - p2
    a, e, b = dot(d1, d1), dot(d2, d2), dot(d1, d2)
    c, f = dot(d1, rv), dot(d2, rv)
    denom = a * e - b * b
    s = jnp.clip(jnp.where(denom > _EPS, (b * f - c * e)
                           / jnp.maximum(denom, _EPS), 0.0), 0.0, 1.0)
    t = jnp.clip((b * s + f) / jnp.maximum(e, _EPS), 0.0, 1.0)
    s = jnp.clip((b * t - c) / jnp.maximum(a, _EPS), 0.0, 1.0)
    return p1 + s * d1, p2 + t * d2


def _contact_frame_cols_bl(n):
    """(3,B) unit normals → (3,3,B) [t1, t2, n] frame rows."""
    sign = jnp.where(n[2] >= 0.0, 1.0, -1.0)
    aa = -1.0 / (sign + n[2] + jnp.where(n[2] >= 0.0, _EPS, -_EPS))
    bb = n[0] * n[1] * aa
    t1 = jnp.stack([1.0 + sign * n[0] * n[0] * aa, sign * bb,
                    -sign * n[0]])
    t2 = jnp.stack([bb, sign + n[1] * n[1] * aa, -n[1]])
    return jnp.stack([t1, t2, n])


def _pair_geometry_bl(cA, dA, rA, cB, dB, rB):
    wA, wB = _seg_seg_closest_bl(cA, dA, cB, dB)
    diff = wA - wB
    dist = jnp.sqrt(jnp.sum(diff * diff, axis=0) + _EPS)
    nrm = diff / dist
    gap = dist - rA - rB
    point = 0.5 * ((wA - rA * nrm) + (wB + rB * nrm))
    return gap, nrm, point


def _arm_point_jac_bl(model, Rs, ps, link, x):
    """(3, n, B) linear Jacobian of traced point x (3,B) attached to
    ``link`` — the traced-point analog of
    :func:`..kinematics.contact_rows_bl`'s inner loop."""
    from .kinematics import _cross_bl, _mv3

    topo = model.topology
    n = topo.n
    B = x.shape[-1]
    dtype = x.dtype
    if link < 0:                        # base-attached point: zero arm cols
        return jnp.zeros((3, n, B), dtype)
    support = set(topo.ancestors[link]) | {link}
    cols = []
    for j in range(n):
        if j not in support:
            cols.append(jnp.zeros((3, B), dtype))
            continue
        Sang = jnp.broadcast_to(model.S[j, :3].astype(dtype)[:, None],
                                (3, B))
        Slin = jnp.broadcast_to(model.S[j, 3:].astype(dtype)[:, None],
                                (3, B))
        a_ang = _mv3(Rs[j], Sang)
        a_lin = _mv3(Rs[j], Slin)
        cols.append(_cross_bl(a_ang, x - ps[j]) + a_lin)
    return jnp.stack(cols, axis=1)


def _geom_segments_bl(cm, Rs, ps, B, dtype):
    from .kinematics import _mv3

    g = cm.geoms
    starts, vecs = [], []
    for i, l in enumerate(g.links):
        a = jnp.broadcast_to(g.a[i].astype(dtype)[:, None], (3, B))
        d = jnp.broadcast_to((g.b[i] - g.a[i]).astype(dtype)[:, None],
                             (3, B))
        if l < 0:                       # base geom: identity placement
            starts.append(a)
            vecs.append(d)
        else:
            starts.append(ps[l] + _mv3(Rs[l], a))
            vecs.append(_mv3(Rs[l], d))
    return starts, vecs


def fb_collision_rows_bl(ffm, quat_bl, pos_bl, q_bl, cm: CollisionModel):
    """Batch-last :func:`fb_collision_rows`: quat (4,B), pos (3,B),
    q (n,B) → (gaps (c,B), J (3c, 6+n, B)) — appendable to the batched
    stepper's foot rows."""
    from .contact import _quat_to_rot_bl
    from .kinematics import _mv3, fk_bl

    arm = ffm.arm
    n = arm.topology.n
    _check_geoms(n, cm)
    B = q_bl.shape[-1]
    dtype = q_bl.dtype
    R = _quat_to_rot_bl(quat_bl)                 # (3, 3, B)
    Rs, ps = fk_bl(arm, q_bl)
    starts, vecs = _geom_segments_bl(cm, Rs, ps, B, dtype)
    g = cm.geoms
    eye_bl = jnp.broadcast_to(jnp.eye(3, dtype=dtype)[..., None], (3, 3, B))
    zeros6 = jnp.zeros((3, 6, B), dtype)

    def rot_cols(Jcols):
        # R @ J for J (3, m, B): rotate each column
        return jnp.stack([_mv3(R, Jcols[:, j]) for j in
                          range(Jcols.shape[1])], axis=1)

    def skew_bl(x):
        z = jnp.zeros_like(x[0])
        return jnp.stack([
            jnp.stack([z, -x[2], x[1]]),
            jnp.stack([x[2], z, -x[0]]),
            jnp.stack([-x[1], x[0], z])])

    gaps, rows = [], []
    for gi, gj in cm.pairs:
        gap, nrm_b, pt_b = _pair_geometry_bl(
            starts[gi], vecs[gi], g.r[gi].astype(dtype),
            starts[gj], vecs[gj], g.r[gj].astype(dtype))
        Jrel = (_arm_point_jac_bl(arm, Rs, ps, g.links[gi], pt_b)
                - _arm_point_jac_bl(arm, Rs, ps, g.links[gj], pt_b))
        J = jnp.concatenate([zeros6, rot_cols(Jrel)], axis=1)
        C = _contact_frame_cols_bl(_mv3(R, nrm_b))           # (3, 3, B)
        gaps.append(gap)
        rows.append(jnp.stack([sum(C[r, c][None] * J[c] for c in range(3))
                               for r in range(3)]))          # (3, 6+n, B)
    if cm.obstacles is not None:
        ob = cm.obstacles
        for gi, w in cm.obs_pairs:
            a_w = jnp.broadcast_to(ob.a[w].astype(dtype)[:, None], (3, B))
            d_w = jnp.broadcast_to(
                (ob.b[w] - ob.a[w]).astype(dtype)[:, None], (3, B))
            # obstacle world → base coords: Rᵀ·x via _mv3's transpose flag
            a_b = _mv3(R, a_w - pos_bl, tA=True)
            d_b = _mv3(R, d_w, tA=True)
            gap, nrm_b, pt_b = _pair_geometry_bl(
                starts[gi], vecs[gi], g.r[gi].astype(dtype),
                a_b, d_b, ob.r[w].astype(dtype))
            vb_block = jnp.concatenate([-skew_bl(pt_b), eye_bl], axis=1)
            Jfull = jnp.concatenate(
                [vb_block,
                 _arm_point_jac_bl(arm, Rs, ps, g.links[gi], pt_b)], axis=1)
            J = rot_cols(Jfull)
            C = _contact_frame_cols_bl(_mv3(R, nrm_b))
            gaps.append(gap)
            rows.append(jnp.stack([sum(C[r, c][None] * J[c]
                                       for c in range(3))
                                   for r in range(3)]))
    if not gaps:
        return (jnp.zeros((0, B), dtype), jnp.zeros((0, 6 + n, B), dtype))
    return jnp.stack(gaps), jnp.concatenate(rows, axis=0)


def fb_ground_geom_rows_bl(ffm, quat_bl, pos_bl, q_bl, geoms: Geoms,
                           ground_z=0.0, terrain=None):
    """Batch-last :func:`fb_ground_geom_rows`: quat (4,B), pos (3,B),
    q (n,B) → (gaps (c,B), J (3c, 6+n, B)) — appendable to the batched
    stepper's foot rows."""
    from .contact import _quat_to_rot_bl
    from .kinematics import _mv3, fk_bl

    arm = ffm.arm
    n = arm.topology.n
    bad = [l for l in geoms.links if not -1 <= l < n]
    if bad:
        raise ValueError(f"ground-geom links {bad} out of range [-1, {n})")
    B = q_bl.shape[-1]
    dtype = q_bl.dtype
    R = _quat_to_rot_bl(quat_bl)                 # (3, 3, B)
    Rs, ps = fk_bl(arm, q_bl)
    eye_bl = jnp.broadcast_to(jnp.eye(3, dtype=dtype)[..., None], (3, 3, B))
    ez = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 1.0], dtype)[:, None], (3, B))

    def rot_cols(Jcols):
        return jnp.stack([_mv3(R, Jcols[:, j]) for j in
                          range(Jcols.shape[1])], axis=1)

    def skew_bl(x):
        z = jnp.zeros_like(x[0])
        return jnp.stack([
            jnp.stack([z, -x[2], x[1]]),
            jnp.stack([x[2], z, -x[0]]),
            jnp.stack([-x[1], x[0], z])])

    gaps, rows = [], []
    for i, e_idx in _ground_contact_list(geoms):
        l = geoms.links[i]
        r = geoms.r[i].astype(dtype)
        e0 = (geoms.a[i] if e_idx == 0 else geoms.b[i]).astype(dtype)
        e0 = jnp.broadcast_to(e0[:, None], (3, B))
        e_b = e0 if l < 0 else ps[l] + _mv3(Rs[l], e0)
        e_w = pos_bl + _mv3(R, e_b)
        if terrain is None:
            nrm_w = ez
            gap = e_w[2] - r - ground_z
            C = None                             # world axes
        else:
            from .terrain import contact_frame, terrain_surface
            h, nrm_w = terrain_surface(terrain, e_w[0], e_w[1])
            gap = (e_w[2] - h) * nrm_w[2] - r
            C = contact_frame(nrm_w)             # (3, 3, B)
        x_c_b = e_b - r * _mv3(R, nrm_w, tA=True)
        vb_block = jnp.concatenate([-skew_bl(x_c_b), eye_bl], axis=1)
        J = rot_cols(jnp.concatenate(
            [vb_block, _arm_point_jac_bl(arm, Rs, ps, l, x_c_b)], axis=1))
        gaps.append(gap)
        if C is None:
            rows.append(J)
        else:
            rows.append(jnp.stack([sum(C[r_, c][None] * J[c]
                                       for c in range(3))
                                   for r_ in range(3)]))
    if not gaps:
        return (jnp.zeros((0, B), dtype), jnp.zeros((0, 6 + n, B), dtype))
    return jnp.stack(gaps), jnp.concatenate(rows, axis=0)
