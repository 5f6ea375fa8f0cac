"""Sensor layer: MuJoCo-style sensor readings over the engine's states.

MuJoCo's ``<sensor>`` block is the standard way an RL/controls user
specifies observations — IMUs (gyro / accelerometer), velocimeters, touch
sensors, joint encoders, and world-frame trackers. The reference is a
derivatives library with no sensor concept; this module sits beyond it,
giving the parallel-environment layer (:mod:`..envs`) a batched,
differentiable ``sensordata`` pipeline computed entirely from the engine's
own kinematics (no simulator round-trip).

Design (TPU-first, like everything in the engine):

* the sensor LIST is trace-time static (:class:`SensorSpec` rows of plain
  numpy/int fields) — the per-state reading function is one straight-line
  jittable program, vmapped over environments by the env layer;
* all site kinematics share ONE forward-kinematics sweep per state; the
  per-site velocity columns use the same trace-time ancestor sparsity as
  the contact Jacobians (``kinematics.world_jacobian``);
* ACCELERATION is defined integrator-consistently: the engine's ground
  steppers are velocity-stepping (impulsive contact), so the physical
  acceleration of a site over a step is the finite difference of its
  world velocity across the step — ``sensordata(state, prev_state=...)``
  computes exactly that (capturing centripetal terms and contact shocks),
  while MuJoCo reports the constraint-consistent continuous-time
  acceleration. With ``prev_state=None`` the site is treated as
  unaccelerated, so an accelerometer at rest reads ``−g`` in its own
  frame (+9.81 up), matching MuJoCo's convention;
* TOUCH attributes contact rows to sensors by owning LINK (the foot/geom
  rows of the steppers carry static link ids), summing positive normal
  impulse / dt — force units, like MuJoCo. MuJoCo instead integrates
  contact force over the site's volume; for the point-foot / capsule-geom
  contacts the steppers generate, link attribution is the natural
  equivalent. Self-collision pair rows (two owners) are not attributed.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .freeflyer import quat_to_rot, rot_to_quat
from .kinematics import fk
from .md_contact import md_fk

_SENSOR_DIMS = {
    "jointpos": 1, "jointvel": 1, "gyro": 3, "accelerometer": 3,
    "velocimeter": 3, "touch": 1, "framepos": 3, "framequat": 4,
    "framelinvel": 3, "frameangvel": 3, "actuatorfrc": 1,
    "tendonpos": 1, "tendonvel": 1,
}

_SITE_KINDS = ("gyro", "accelerometer", "velocimeter", "framepos",
               "framequat", "framelinvel", "frameangvel")


class SensorSpec(NamedTuple):
    """One resolved sensor row — trace-time static.

    ``link``/``pos``/``R`` locate the site frame for site-attached kinds
    (``link`` in the env's own indexing: fb = arm link, -1 the floating
    base; md = tree link, -1/-2 static world). ``coord`` is the q-index
    (jointpos), v-index (jointvel), or actuator index (actuatorfrc).
    ``touch`` uses ``link`` only. ``row`` carries a fixed tendon's
    coefficient row in the env's coordinates (q-layout for ``tendonpos``,
    v-layout for ``tendonvel`` — the reading is ``row·q`` / ``row·q̇``)."""
    kind: str
    name: str
    link: int = -2
    pos: Any = None            # (3,) np.ndarray, link frame
    R: Any = None              # (3, 3) np.ndarray, link frame
    coord: int = -1
    row: Any = None            # (nq|nv,) np.ndarray, tendon coefficients

    @property
    def dim(self) -> int:
        return _SENSOR_DIMS[self.kind]


def sensor_dim(specs) -> int:
    return sum(s.dim for s in specs)


def sensor_slices(specs) -> "dict[str, slice]":
    """Sensor name → slice into the flat sensordata vector (MuJoCo's
    ``sensor_adr``/``sensor_dim`` tables as one dict)."""
    out, off = {}, 0
    for s in specs:
        out[s.name] = slice(off, off + s.dim)
        off += s.dim
    return out


# ------------------------------------------------------------------ site
# kinematics: world (x, R, ω, v) of every referenced site, one FK sweep
def _fb_site_states(ffm, specs, quat, pos, q, vb, qd):
    """Free-flyer site states. Site on arm link l: compose the base pose
    with the base-frame arm FK; velocity = base twist transport + the
    ancestor-sparse arm Jacobian columns (``kinematics.world_jacobian``
    with the FK sweep hoisted out of the per-site loop)."""
    arm = ffm.arm
    dtype = q.dtype
    R0 = quat_to_rot(quat)
    w_b, v_b = vb[:3], vb[3:]
    need_arm = any(s.kind in _SITE_KINDS and s.link >= 0 for s in specs)
    if need_arm:
        Ra, pa = fk(arm, q)
    out = {}
    for s in specs:
        if s.kind not in _SITE_KINDS or (s.link, id(s.pos)) in out:
            continue
        off = jnp.asarray(s.pos, dtype)
        Rs = jnp.asarray(s.R, dtype)
        if s.link == -2:                         # static worldbody site
            st = (off, Rs, jnp.zeros(3, dtype), jnp.zeros(3, dtype))
        elif s.link == -1:                       # on the floating base
            x = pos + R0 @ off
            st = (x, R0 @ Rs, R0 @ w_b, R0 @ (v_b + jnp.cross(w_b, off)))
        else:
            l = s.link
            r_b = pa[l] + Ra[l] @ off            # site point, base frame
            w_rel = jnp.zeros(3, dtype)
            v_rel = jnp.zeros(3, dtype)
            for j in sorted(set(arm.topology.ancestors[l]) | {l}):
                a_ang = Ra[j] @ arm.S[j, :3]
                a_lin = Ra[j] @ arm.S[j, 3:]
                w_rel = w_rel + a_ang * qd[j]
                v_rel = v_rel + (jnp.cross(a_ang, r_b - pa[j])
                                 + a_lin) * qd[j]
            st = (pos + R0 @ r_b, R0 @ Ra[l] @ Rs,
                  R0 @ (w_b + w_rel),
                  R0 @ (v_b + jnp.cross(w_b, r_b) + v_rel))
        out[(s.link, id(s.pos))] = st
    return out


def _md_site_states(mdm, specs, q, qd):
    """Multi-dof site states: the in-tree floating/ball joints make
    ``md_fk`` world-posed directly; velocity columns follow
    ``md_contact.md_point_jacobian``'s per-coordinate loop, with the
    angular rows added."""
    dtype = q.dtype
    topo = mdm.topology
    need = any(s.kind in _SITE_KINDS and s.link >= 0 for s in specs)
    if need:
        R, p = md_fk(mdm, q)
    out = {}
    for s in specs:
        if s.kind not in _SITE_KINDS or (s.link, id(s.pos)) in out:
            continue
        off = jnp.asarray(s.pos, dtype)
        Rs = jnp.asarray(s.R, dtype)
        if s.link < 0:                           # welded to the world
            st = (off, Rs, jnp.zeros(3, dtype), jnp.zeros(3, dtype))
        else:
            l = s.link
            x = p[l] + R[l] @ off
            w = jnp.zeros(3, dtype)
            v = jnp.zeros(3, dtype)
            for j in sorted(set(topo.ancestors[l]) | {l}):
                sv, wv = mdm.v_slices[j]
                for c in range(wv):
                    a_ang = R[j] @ mdm.S[j, :3, c]
                    a_lin = R[j] @ mdm.S[j, 3:, c]
                    w = w + a_ang * qd[sv + c]
                    v = v + (jnp.cross(a_ang, x - p[j])
                             + a_lin) * qd[sv + c]
            st = (x, R[l] @ Rs, w, v)
        out[(s.link, id(s.pos))] = st
    return out


def _site_states(kind, model, specs, state):
    if kind == "fb":
        return _fb_site_states(model, specs, *state)
    return _md_site_states(model, specs, *state)


def _joint_reads(kind, state):
    """(q-coords, v-coords) flat read vectors per env kind."""
    if kind == "fb":
        return state[2], state[4]
    return state[0], state[1]


def sensor_readings(kind: str, model, specs, state, prev_state=None,
                    dt: Optional[float] = None, gravity: float = -9.81,
                    impulses=None, contact_links=None, act_force=None):
    """Flat sensordata vector (sensor_dim,) for ONE environment state.

    ``prev_state`` enables integrator-consistent accelerometers (see
    module docstring); ``impulses (k, 3)`` + static ``contact_links
    (k,)`` enable touch; ``act_force (a,)`` (the clamped scalar actuator
    forces) enables actuatorfrc. Touch/actuatorfrc rows read 0 when
    their inputs are absent (MuJoCo's pre-step sensordata). The env
    layer vmaps this over the batch
    (:meth:`..envs.GroundEnv.sensordata`)."""
    qf, qdf = _joint_reads(kind, state)
    dtype = qf.dtype
    sites = _site_states(kind, model, specs, state)
    psites = (_site_states(kind, model, specs, prev_state)
              if prev_state is not None else None)
    g_vec = jnp.array([0.0, 0.0, gravity], dtype)
    parts = []
    for s in specs:
        if s.kind == "jointpos":
            parts.append(qf[s.coord:s.coord + 1])
        elif s.kind == "jointvel":
            parts.append(qdf[s.coord:s.coord + 1])
        elif s.kind == "tendonpos":
            parts.append((qf @ jnp.asarray(s.row, dtype))[None])
        elif s.kind == "tendonvel":
            parts.append((qdf @ jnp.asarray(s.row, dtype))[None])
        elif s.kind == "actuatorfrc":
            # no ctrl passed → pre-step reading of 0 (MuJoCo's sensordata
            # before the first mj_step)
            parts.append(jnp.zeros(1, dtype) if act_force is None
                         else act_force[s.coord:s.coord + 1])
        elif s.kind == "touch":
            # a contact_links entry is either the single owning link or a
            # (link_a, link_b) tuple for self-collision rows — the impulse
            # acts equal-and-opposite on both bodies, so a touch site on
            # either reads its full normal force (MuJoCo's per-geom
            # site-volume semantics for whole-link sites)
            rows = ([] if impulses is None or contact_links is None
                    else [i for i, l in enumerate(contact_links)
                          if (s.link in l if isinstance(l, tuple)
                              else l == s.link)])
            if not rows:                # pre-step / no rows on this link
                parts.append(jnp.zeros(1, dtype))
            else:
                lam_n = jnp.stack([impulses[i, 2] for i in rows])
                parts.append(jnp.sum(jnp.maximum(lam_n, 0.0))[None]
                             / jnp.asarray(dt, dtype))
        else:
            x, Rw, w, v = sites[(s.link, id(s.pos))]
            if s.kind == "framepos":
                parts.append(x)
            elif s.kind == "framequat":
                parts.append(rot_to_quat(Rw))
            elif s.kind == "framelinvel":
                parts.append(v)
            elif s.kind == "frameangvel":
                parts.append(w)
            elif s.kind == "gyro":
                parts.append(Rw.T @ w)
            elif s.kind == "velocimeter":
                parts.append(Rw.T @ v)
            elif s.kind == "accelerometer":
                if psites is not None:
                    v_prev = psites[(s.link, id(s.pos))][3]
                    a_w = (v - v_prev) / jnp.asarray(dt, dtype)
                else:
                    a_w = jnp.zeros(3, dtype)
                parts.append(Rw.T @ (a_w - g_vec))
    return jnp.concatenate(parts)
