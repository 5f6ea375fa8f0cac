"""High-level parallel-environment API: one object from an MJCF/URDF
document to batched frictional ground stepping.

The engine's contact stack is a toolbox (`ops/contact.py`,
`ops/md_contact.py`, `ops/collision.py`, `models/mjcf.py`); this module is
the assembled instrument — the MuJoCo-style ``reset / step / rollout``
surface an RL user expects, with every wiring decision (free-flyer vs
multi-dof routing, foot-site extraction, actuator gearing, joint limits,
collision geoms, termination) made automatically from the document:

    env = g.make_ground_env(zoo.ant_mjcf(), dt=2e-3)
    state = env.reset(4096, seed=0)
    state, impulses = env.step(state, ctrl)           # ctrl (B, n_ctrl)
    obs = env.observation(state)                      # (B, obs_dim)
    done = env.fallen(state)                          # (B,) bool

Routing (trace-time static, like every topology decision in the engine):

* hinge/slide trees — either the MJCF jointless-root idiom or an explicit
  root ``<freejoint/>`` (demoted via
  :func:`..models.urdf.demote_floating_root`) — run the FREE-FLYER stack,
  whose steppers fuse into one Pallas kernel per 128-environment lane tile
  on TPU (`ops/kernels/contact_fused.py`);
* trees with ball or in-tree free joints run the MULTI-DOF stack
  (`ops/md_contact.py`, fused via `ops/kernels/md_contact_fused.py`).

The reference has no environment layer (it is a derivatives library); this
sits beyond it, composing SURVEY §2's algorithm families into the
parallel-RL serving shape the TPU build exists for.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .models import mjcf as _mjcf
from .models.urdf import RobotDescription, demote_floating_root, parse_urdf
from .ops import contact as _ct
from .ops import md_contact as _mc
from .ops import multidof as _md
from .ops import sensors as _sn
from .ops.freeflyer import free_flyer_model, quat_to_rot


def _site_feet(sites, prefixes=("foot", "toe")):
    """Foot anchors by MuJoCo naming convention: sites whose name starts
    with 'foot' or 'toe', in document order."""
    names = sorted(n for n in sites
                   if any(n.lower().startswith(p) for p in prefixes))
    return names


def _act_arrays_fb(act, n, demoted):
    """(vidx, qidx) of each actuator in the fixed-base arm coordinates."""
    j = np.asarray(act.joint, np.int64)
    if demoted:
        if np.any(j == 0):
            raise ValueError("an <actuator> drives the root free joint — "
                             "not representable on the free-flyer base")
        j = j - 1
    assert j.max(initial=-1) < n
    return j, j


def _act_arrays_md(act, mdm):
    """(vidx into q̇/τ rows, qidx into q coords) — scalar joints only
    (a motor on a ball/free joint is ambiguous in the scalar-gear model)."""
    vidx, qidx = [], []
    for j in act.joint:
        voff, w = mdm.v_slices[j]
        if w != 1:
            raise ValueError(
                f"<motor> on multi-dof joint {j} (width {w}) — attach "
                "motors to hinge/slide joints")
        vidx.append(voff)
        qidx.append(mdm.q_slices[j][0])
    return np.asarray(vidx, np.int64), np.asarray(qidx, np.int64)


def _joint_matrix_to_env(M, kind, model, demoted, what="tendon"):
    """Expand a per-moving-joint coefficient matrix ``M (r, n_doc)`` (a
    tendon coef table or an actuator moment table over the document's
    moving joints) to the env's coordinate layouts: returns ``(M_q, M_v)``
    — fb: both are the arm's (r, n) joint matrix (root free-joint column
    dropped after checking it is unused); md: (r, nq) / (r, nv) with the
    coefficients on each scalar joint's q-slot / tangent row (multi-dof
    joints must carry zero coefficients — no scalar coordinate exists)."""
    M = np.asarray(M, np.float64)
    if kind == "fb":
        if demoted:
            if np.any(M[:, 0] != 0.0):
                raise ValueError(
                    f"a {what} coefficient sits on the root free joint — "
                    "not representable on the free-flyer base")
            M = M[:, 1:]
        return M, M
    A_q = np.zeros((M.shape[0], model.nq))
    A_v = np.zeros((M.shape[0], model.nv))
    for j in range(len(model.q_slices)):
        if not np.any(M[:, j]):
            continue
        qs, qw = model.q_slices[j]
        vs, vw = model.v_slices[j]
        if qw != 1 or vw != 1:
            raise ValueError(
                f"a {what} coefficient sits on multi-dof joint {j} "
                f"(width {vw}) — scalar (hinge/slide) joints only")
        A_q[:, qs] = M[:, j]
        A_v[:, vs] = M[:, j]
    return A_q, A_v


def _md_joint_grants(mdm, desc, use_limits: bool = True):
    """Expand the document's per-JOINT limit/effort/frictionloss grants
    to the multi-dof model's coordinate layouts: ``limits`` as (nq,)
    lower/upper (±inf on ball/free slots — no scalar range exists
    there), ``effort``/``frictionloss`` as (nv,) per tangent coordinate
    (a ball joint's frictionloss applies componentwise to its 3 tangent
    rows, MuJoCo's per-dof row semantics). Returns (limits, effort,
    frictionloss), each None when the document grants nothing."""
    n = len(mdm.q_slices)
    lo = np.full(mdm.nq, -np.inf)
    hi = np.full(mdm.nq, np.inf)
    eff = np.full(mdm.nv, np.inf)
    fl = np.zeros(mdm.nv)
    for j in range(n):
        qs, qw = mdm.q_slices[j]
        vs, vw = mdm.v_slices[j]
        if qw == 1 and desc.q_lower is not None:
            lo[qs], hi[qs] = desc.q_lower[j], desc.q_upper[j]
        # effort and frictionloss expand componentwise to EVERY tangent
        # coordinate of the joint (a ball's actuatorfrcrange clamps each
        # of its 3 torque rows, matching the frictionloss treatment)
        if desc.effort is not None:
            eff[vs:vs + vw] = desc.effort[j]
        if desc.frictionloss is not None:
            fl[vs:vs + vw] = desc.frictionloss[j]
    limits = ((lo, hi) if use_limits and np.any(np.isfinite(lo) |
                                                np.isfinite(hi)) else None)
    effort = (eff if use_limits and np.any(np.isfinite(eff)) else None)
    frictionloss = fl if np.any(fl > 0) else None
    return limits, effort, frictionloss


@dataclasses.dataclass(frozen=True)
class GroundEnv:
    """A batch of identical frictional-ground environments. Frozen/static —
    jit-stable when closed over; states are plain pytrees.

    Build with :func:`make_ground_env` (MJCF) or
    :func:`make_ground_env_urdf`. All physics options (``mu``, ``iters``,
    ``terrain=``, ``collision=``, ``ground_geoms=``, ``loops=``,
    ``limits``/``effort``…) ride the underlying steppers —
    :func:`..ops.contact.fb_step_ground_batched` /
    :func:`..ops.md_contact.md_step_ground_batched` — unchanged."""

    kind: str                       # "fb" | "md"
    model: Any                      # FreeFlyerModel | MultiDofModel
    feet: tuple                     # link indices (remapped if demoted)
    offsets: np.ndarray             # (k, 3) anchors in link frames
    dt: float
    mu: float = 0.8
    iters: int = 30
    gravity: float = -9.81
    erp: float = 0.2
    margin: float = 1e-3
    restitution: float = 0.0
    # actuator block (None = ctrl IS the torque vector): MuJoCo's affine
    # model — force = gain·c + bias_q·(gear·q_j) + bias_v·(gear·q̇_j),
    # clamped to forcerange; τ_j += gear·force
    act_vidx: Optional[np.ndarray] = None     # (a,) rows into τ / q̇
    act_qidx: Optional[np.ndarray] = None     # (a,) coords into q
    act_gear: Optional[np.ndarray] = None     # (a,)
    act_gain: Optional[np.ndarray] = None     # (a,)
    act_bias_q: Optional[np.ndarray] = None   # (a,)
    act_bias_v: Optional[np.ndarray] = None   # (a,)
    act_flo: Optional[np.ndarray] = None      # (a,) forcerange
    act_fhi: Optional[np.ndarray] = None
    ctrl_lower: Optional[np.ndarray] = None   # (a,)
    ctrl_upper: Optional[np.ndarray] = None
    # generic (moment-matrix) transmission — set when any actuator drives
    # a fixed tendon: actuator length = moment_q·q, applied torque =
    # force·moment_v (gear folded in); overrides the indexed path above
    act_moment_q: Optional[np.ndarray] = None  # (a, nq_env)
    act_moment_v: Optional[np.ndarray] = None  # (a, nv_env)
    # joint constraints, both routes: fb shapes are per joint ((n,));
    # md shapes are per q-coordinate for limits ((nq,), ±inf on
    # ball/free slots) and per tangent coordinate ((nv,)) for the rest
    limits: Optional[tuple] = None            # (q_lower, q_upper)
    effort: Optional[np.ndarray] = None       # τ clamp
    frictionloss: Optional[np.ndarray] = None  # dry friction
    terrain: Any = None
    collision: Any = None
    mu_collision: Optional[float] = None
    ground_geoms: Any = None
    mu_ground: Optional[float] = None
    loops: Any = None
    welds: Any = None                        # (pairs, R0): weld orientation
    # rows; the anchor halves are merged into `loops` (both routes)
    # fixed tendons (MJCF <tendon><fixed>), env coordinate layouts:
    tendons: Any = None       # (A_q, A_v, lo, hi) — range rows for the
    # steppers' tendons= (limited tendons only)
    tendon_passive: Any = None  # (A_q, A_v, stiffness, damping, L0) —
    # passive spring/damper tendons, added to τ each step
    softness: Any = None                      # compliant-contact diag (soft)
    sensors: tuple = ()                       # SensorSpec rows (static)
    init_q: Optional[np.ndarray] = None       # neutral joint coords
    init_height: float = 0.5
    min_height: float = 0.1                   # `fallen` thresholds
    max_tilt: float = 1.0                     # rad from vertical

    # ----------------------------------------------------------- properties
    @property
    def n_ctrl(self) -> int:
        if self.act_vidx is not None:
            return len(self.act_vidx)
        return self.model.n if self.kind == "fb" else self.model.nv

    @property
    def n_contacts(self) -> int:
        from .ops.collision import n_ground_contacts
        k = len(self.feet)
        if self.collision is not None:
            k += self.collision.n_contacts
        if self.ground_geoms is not None:
            k += n_ground_contacts(self.ground_geoms)
        return k

    # ---------------------------------------------------------------- state
    def reset(self, batch: int, seed: int = 0, pos_noise: float = 0.1,
              vel_noise: float = 0.1, height_noise: float = 0.05,
              dtype=None):
        """Initial state pytree for ``batch`` environments: the neutral
        configuration dropped at ``init_height`` (+U[0, height_noise]),
        joint coordinates perturbed by U[±pos_noise] (tangent-space for
        multi-dof robots), velocities by U[±vel_noise]. ``dtype`` defaults
        to the model's dtype."""
        if dtype is None:
            dtype = (self.model.arm.inertia.dtype if self.kind == "fb"
                     else self.model.inertia.dtype)
        rng = np.random.default_rng(seed)
        B = batch
        if self.kind == "fb":
            n = self.model.n
            quat = np.tile([1.0, 0, 0, 0], (B, 1))
            pos = np.zeros((B, 3))
            pos[:, 2] = self.init_height + rng.uniform(0, height_noise, B)
            q0 = np.zeros(n) if self.init_q is None else self.init_q
            q = q0 + rng.uniform(-pos_noise, pos_noise, (B, n))
            if self.limits is not None:
                # spawn in-range: an out-of-range initial q would be
                # TELEPORTED to the bound by the first step's limit
                # projection — feet can snap into the ground and the erp
                # recovery catapults the robot (MuJoCo initial states
                # are in-range by construction)
                q = np.clip(q, self.limits[0], self.limits[1])
            vb = rng.uniform(-vel_noise, vel_noise, (B, 6))
            qd = rng.uniform(-vel_noise, vel_noise, (B, n))
            arr = lambda a: jnp.asarray(a, dtype)
            return (arr(quat), arr(pos), arr(q), arr(vb), arr(qd))
        mdm = self.model
        q0 = (np.asarray(_md.neutral_q(mdm), np.float64)
              if self.init_q is None else np.asarray(self.init_q))
        d = jnp.asarray(rng.uniform(-pos_noise, pos_noise, (B, mdm.nv)),
                        dtype)
        q = jax.vmap(lambda t: _md.md_tangent_apply(
            mdm, jnp.asarray(q0, dtype), t))(d)
        # root free joint (if any): spawn height into its position slot
        if mdm.joint_types and mdm.joint_types[0] == "floating":
            q = q.at[:, 6].set(jnp.asarray(
                self.init_height + rng.uniform(0, height_noise, B), dtype))
        if self.limits is not None:
            # in-range spawn (see the fb branch); md limits are (nq,)
            # with ±inf on ball/free slots, so a whole-q clip only
            # touches the scalar-joint coordinates
            q = jnp.clip(q, jnp.asarray(self.limits[0], dtype),
                         jnp.asarray(self.limits[1], dtype))
        qd = jnp.asarray(rng.uniform(-vel_noise, vel_noise, (B, mdm.nv)),
                         dtype)
        return (q, qd)

    def actuator_force(self, state, ctrl):
        """Clamped scalar actuator forces (B, a) — MuJoCo's
        ``actuator_force``: the affine gain/bias law per actuator before
        the gear scatter (this is what ``<actuatorfrc>`` sensors read)."""
        dtype = ctrl.dtype
        arr = lambda a: jnp.asarray(a, dtype)
        lo = np.where(np.isfinite(self.ctrl_lower), self.ctrl_lower, -1e30)
        hi = np.where(np.isfinite(self.ctrl_upper), self.ctrl_upper, 1e30)
        c = jnp.clip(ctrl, arr(lo), arr(hi))
        if self.kind == "fb":
            qf, qdf = state[2], state[4]
        else:
            qf, qdf = state[0], state[1]
        if self.act_moment_q is not None:
            # moment-matrix transmission (tendon actuators): length /
            # velocity are moment·q / moment·q̇, gear folded in
            ln = qf @ arr(self.act_moment_q).T
            vel = qdf @ arr(self.act_moment_v).T
        else:
            g = arr(self.act_gear)
            ln = g * qf[..., self.act_qidx]
            vel = g * qdf[..., self.act_vidx]
        f = (arr(self.act_gain) * c + arr(self.act_bias_q) * ln
             + arr(self.act_bias_v) * vel)
        flo = np.where(np.isfinite(self.act_flo), self.act_flo, -1e30)
        fhi = np.where(np.isfinite(self.act_fhi), self.act_fhi, 1e30)
        return jnp.clip(f, arr(flo), arr(fhi))

    def actuator_torque(self, state, ctrl):
        """Apply the document's actuator law: controls (B, n_ctrl) → the
        generalized torque vector (B, n_tau). Without an <actuator> block,
        ``ctrl`` IS the torque vector. Motors are state-free; position/
        velocity servos read the joint state (MuJoCo's affine gain/bias
        model, forcerange-clamped)."""
        if self.act_vidx is None:
            return ctrl
        dtype = ctrl.dtype
        n_tau = self.model.n if self.kind == "fb" else self.model.nv
        f = self.actuator_force(state, ctrl)
        if self.act_moment_v is not None:
            return f @ jnp.asarray(self.act_moment_v, dtype)
        g = jnp.asarray(self.act_gear, dtype)
        tau = jnp.zeros(ctrl.shape[:-1] + (n_tau,), dtype)
        return tau.at[..., self.act_vidx].add(g * f)

    # ----------------------------------------------------------------- step
    def step(self, state, ctrl, impl: str = "auto",
             diff_mode: str = "unroll", push=None):
        """One dt of every environment: ``ctrl (B, n_ctrl)`` → (next_state,
        impulses (B, k, 3)). On TPU ``impl="auto"`` runs the fused step
        kernels; ``diff_mode="implicit"`` gives exact IFT gradients through
        the cone solve (XLA body). ``push``: optional (B, 6) external base
        wrench per environment ([moment; force], base frame) — the RL
        push-perturbation idiom; rides the fused kernels."""
        dtype = state[0].dtype
        tau = self.actuator_torque(state, jnp.asarray(ctrl, dtype))
        if self.tendon_passive is not None:
            # passive tendon spring/damper forces (MuJoCo's fixed-tendon
            # stiffness/damping): F = −k·(L − L0) − b·L̇, τ += F·A_v
            A_q, A_v, k_t, b_t, L0 = self.tendon_passive
            qf, qdf = ((state[2], state[4]) if self.kind == "fb"
                       else (state[0], state[1]))
            arr = lambda a: jnp.asarray(a, dtype)
            F = -(arr(k_t) * (qf @ arr(A_q).T - arr(L0))
                  + arr(b_t) * (qdf @ arr(A_v).T))
            tau = tau + F @ arr(A_v)
        tnd_fb = tnd_md = None
        if self.tendons is not None:
            A_q, A_v, t_lo, t_hi = self.tendons
            tnd_fb = (A_v, t_lo, t_hi)
            tnd_md = (A_q, A_v, t_lo, t_hi)
        if self.kind == "fb":
            return _ct.fb_step_ground_batched(
                self.model, state, tau, self.dt, self.feet, self.offsets,
                mu=self.mu, gravity=self.gravity, iters=self.iters,
                erp=self.erp, margin=self.margin,
                restitution=self.restitution, impl=impl,
                limits=self.limits, effort=self.effort,
                diff_mode=diff_mode, terrain=self.terrain,
                collision=self.collision, mu_collision=self.mu_collision,
                ground_geoms=self.ground_geoms, mu_ground=self.mu_ground,
                loops=self.loops, welds=self.welds, f_base=push,
                frictionloss=self.frictionloss, softness=self.softness,
                tendons=tnd_fb)
        q, qd = state
        if push is not None:
            # a floating root's first 6 velocity rows ARE the base wrench
            # slot of the generalized force vector
            if not (self.model.joint_types
                    and self.model.joint_types[0] == "floating"):
                raise ValueError("push= needs a floating root")
            tau = tau.at[:, :6].add(jnp.asarray(push, dtype))
        (q2, qd2), imp = _mc.md_step_ground_batched(
            self.model, q, qd, tau, self.dt, self.feet, self.offsets,
            mu=self.mu, gravity=self.gravity, iters=self.iters,
            erp=self.erp, margin=self.margin, restitution=self.restitution,
            limits=self.limits, effort=self.effort,
            impl=impl, diff_mode=diff_mode, terrain=self.terrain,
            ground_geoms=self.ground_geoms, mu_ground=self.mu_ground,
            loops=self.loops, welds=self.welds,
            frictionloss=self.frictionloss, softness=self.softness,
            tendons=tnd_md)
        return (q2, qd2), imp

    def rollout(self, state, ctrls, impl: str = "auto", pushes=None,
                sensors: bool = False):
        """``lax.scan`` of :meth:`step` over ``ctrls (T, B, n_ctrl)`` — T
        steps in ONE dispatch. Returns (final state, impulses (T, B, k, 3)),
        or with ``sensors=True`` (final state, (impulses, sensordata
        (T, B, sensor_dim))) — per-step :meth:`sensordata` with the
        prev-state/impulse/ctrl threading done for you (accelerometers and
        touch included). Differentiable end-to-end (BPTT through contact,
        sensor-space losses included). ``pushes``: optional (T, B, 6)
        per-step base-wrench schedule."""
        def body(s, x):
            c, p = x
            s2, imp = self.step(s, c, impl=impl, push=p)
            if sensors:
                sd = self.sensordata(s2, prev_state=s, impulses=imp,
                                     ctrl=c)
                return s2, (imp, sd)
            return s2, imp
        return jax.lax.scan(body, state, (ctrls, pushes))

    # ----------------------------------------------------------- diagnostics
    def base_pose(self, state):
        """(quat (B, 4), pos (B, 3)) of the floating base."""
        if self.kind == "fb":
            return state[0], state[1]
        q = state[0]
        if not (self.model.joint_types
                and self.model.joint_types[0] == "floating"):
            raise ValueError("robot has no floating root")
        return q[:, 0:4], q[:, 4:7]

    def base_velocity(self, state):
        """Body-frame base twist (B, 6)."""
        return state[3] if self.kind == "fb" else state[1][:, :6]

    def joint_state(self, state):
        """(q_joints, qd_joints) — the actuated tree, base excluded."""
        if self.kind == "fb":
            return state[2], state[4]
        return state[0][:, 7:], state[1][:, 6:]

    def observation(self, state):
        """Standard translation-invariant observation: [base height (1),
        base quaternion (4), joint positions, base twist (6), joint
        velocities] → (B, obs_dim)."""
        quat, pos = self.base_pose(state)
        qj, qdj = self.joint_state(state)
        return jnp.concatenate(
            [pos[:, 2:3], quat, qj, self.base_velocity(state), qdj], axis=1)

    def fallen(self, state):
        """(B,) termination flags: base below ``min_height`` or tilted more
        than ``max_tilt`` rad from vertical (body z-axis vs world up)."""
        quat, pos = self.base_pose(state)
        up_z = jax.vmap(lambda w: quat_to_rot(w)[2, 2])(quat)
        return ((pos[:, 2] < self.min_height)
                | (up_z < jnp.cos(self.max_tilt)))

    # ------------------------------------------------------------- sensors
    @property
    def sensor_names(self) -> tuple:
        return tuple(s.name for s in self.sensors)

    @property
    def sensor_dim(self) -> int:
        return _sn.sensor_dim(self.sensors)

    def sensor_slices(self) -> dict:
        """Sensor name → slice into the sensordata vector."""
        return _sn.sensor_slices(self.sensors)

    def contact_links(self) -> tuple:
        """Owning link of every contact row of :meth:`step`'s impulse
        array (feet, then collision pairs, then ground-geom endpoints).
        Robot-vs-static-obstacle rows have a single robot owner and are
        attributed to that geom's link, so touch sensors see obstacle
        impulses. SELF-collision rows have two owners and are attributed
        to BOTH links as a ``(link_a, link_b)`` tuple: the contact acts
        equal-and-opposite on the two geoms, so a MuJoCo touch site on
        either body reads the same normal force — a site on each reads it
        once each (not split). ``sensor_readings`` matches a touch row
        when its link is the scalar owner or a member of the pair."""
        from .ops.collision import _ground_contact_list
        links = list(self.feet)
        if self.collision is not None:
            gl = self.collision.geoms.links
            links += [(gl[ga], gl[gb]) for ga, gb in self.collision.pairs]
            links += [self.collision.geoms.links[g]
                      for g, _ in self.collision.obs_pairs]
        if self.ground_geoms is not None:
            links += [self.ground_geoms.links[g]
                      for g, _ in _ground_contact_list(self.ground_geoms)]
        return tuple(links)

    def sensordata(self, state, prev_state=None, impulses=None, ctrl=None):
        """The document's ``<sensor>`` readings, batched: (B, sensor_dim).

        Pure kinematic sensors (jointpos/jointvel/gyro/velocimeter/
        frame*) need only ``state``. ``accelerometer`` rows additionally
        want ``prev_state`` (the state the last :meth:`step` advanced
        FROM) for the integrator-consistent finite-difference
        acceleration — without it the site is treated as unaccelerated
        (at-rest IMU reading, −g in the site frame). ``touch`` rows need
        ``impulses`` (the step's second return); ``actuatorfrc`` rows
        need ``ctrl``. Differentiable end-to-end; one fused XLA program
        under jit (vmapped straight-line kinematics, no dynamics solve).

        Typical RL loop::

            prev = state
            state, imp = env.step(state, ctrl)
            obs = env.sensordata(state, prev_state=prev, impulses=imp,
                                 ctrl=ctrl)
        """
        if not self.sensors:
            raise ValueError("no sensors: the document has no <sensor> "
                             "block (or sensors=() was passed)")
        af = None
        if ctrl is not None and self.act_vidx is not None:
            af = self.actuator_force(
                state, jnp.asarray(ctrl, state[0].dtype))
        cl = self.contact_links()

        def single(st, ex):
            return _sn.sensor_readings(
                self.kind, self.model, self.sensors, st,
                prev_state=ex.get("prev"), dt=self.dt,
                gravity=self.gravity, impulses=ex.get("imp"),
                contact_links=cl, act_force=ex.get("af"))

        ex = {}
        if prev_state is not None:
            ex["prev"] = prev_state
        if impulses is not None:
            ex["imp"] = impulses
        if af is not None:
            ex["af"] = af
        return jax.vmap(single)(state, ex)


def _resolve_sensors(raw, source, desc, kind, model, demoted, sites, act):
    """MjcfSensor rows → trace-time-static SensorSpec rows in the env's
    own coordinates (fb: arm links / arm q-v indices, the demoted free
    joint erased; md: tree links / q- and v-slice offsets)."""
    bodies = _mjcf.mjcf_bodies(source) if any(
        s.objtype == "body" for s in raw) else {}
    tend_rows = None                     # lazy: (names, A_q, A_v)
    jmap = {nm: i for i, nm in enumerate(desc.topology.joint_names)}
    remap = (lambda l: l - 1 if l >= 0 else l) if demoted else (lambda l: l)
    specs = []
    for sr in raw:
        if sr.objtype == "joint":
            if sr.obj not in jmap:
                raise ValueError(
                    f"sensor {sr.name!r} references unknown joint "
                    f"{sr.obj!r}")
            j = jmap[sr.obj]
            if kind == "fb":
                if demoted and j == 0:
                    raise ValueError(
                        f"sensor {sr.name!r} on the root free joint — "
                        "read the base via frame*/gyro sensors instead")
                coord = j - 1 if demoted else j
            else:
                sl = (model.q_slices[j] if sr.kind == "jointpos"
                      else model.v_slices[j])
                if sl[1] != 1:
                    raise ValueError(
                        f"sensor {sr.name!r}: {sr.kind} is scalar-joint "
                        f"only (joint {sr.obj!r} has width {sl[1]}) — "
                        "use frame*/gyro sensors for ball/free joints")
                coord = sl[0]
            specs.append(_sn.SensorSpec(kind=sr.kind, name=sr.name,
                                        coord=coord))
        elif sr.objtype in ("site", "body"):
            table = sites if sr.objtype == "site" else bodies
            if sr.obj not in table:
                raise ValueError(
                    f"sensor {sr.name!r} references unknown "
                    f"{sr.objtype} {sr.obj!r}")
            rec = table[sr.obj]
            specs.append(_sn.SensorSpec(
                kind=sr.kind, name=sr.name, link=remap(rec.link),
                pos=np.asarray(rec.pos, np.float64),
                R=np.asarray(rec.R, np.float64)))
        elif sr.objtype == "tendon":
            if tend_rows is None:
                tend = _mjcf.mjcf_tendons(source)
                tend_rows = (tend.names,
                             *_joint_matrix_to_env(tend.coef, kind, model,
                                                   demoted))
            t_names, A_q, A_v = tend_rows
            if sr.obj not in t_names:
                raise ValueError(
                    f"sensor {sr.name!r} references unknown tendon "
                    f"{sr.obj!r}")
            ti = t_names.index(sr.obj)
            specs.append(_sn.SensorSpec(
                kind=sr.kind, name=sr.name, coord=ti,
                row=(A_q if sr.kind == "tendonpos" else A_v)[ti].copy()))
        else:                                     # actuator
            if sr.obj not in act.names:
                raise ValueError(
                    f"sensor {sr.name!r} references unknown actuator "
                    f"{sr.obj!r}")
            specs.append(_sn.SensorSpec(kind=sr.kind, name=sr.name,
                                        coord=act.names.index(sr.obj)))
    return tuple(specs)


def make_ground_env(source: str, *, dt: float = 2e-3, mu: float = 0.8,
                    feet=None, collision: bool = False,
                    ground_geoms: bool = False, terrain=None,
                    loops: str | bool = "auto",
                    welds: str | bool | tuple = "auto",
                    use_limits: bool = True,
                    sensors: str | tuple = "auto",
                    init_height: float = 0.5, dtype=jnp.float32,
                    **opts) -> GroundEnv:
    """Build a :class:`GroundEnv` from an MJCF document.

    Everything is extracted from the document: the kinematic tree
    (``parse_mjcf``), foot anchors (``feet=`` site names, or every site
    named ``foot*``/``toe*``), the actuator block (``ctrl → τ`` gearing and
    ctrlranges), joint limits, loop-closure ``<equality><connect>`` cuts
    (``loops="auto"``) and ``<equality><weld>`` constraints
    (``welds="auto"``; anchor rows merge into the loop cuts, orientation
    rows ride ``welds=`` on the steppers), the ``<sensor>`` block (``sensors="auto"`` →
    :meth:`GroundEnv.sensordata`; pass ``sensors=()`` to skip or a tuple
    of :class:`~.models.mjcf.MjcfSensor` rows to override), and — opt-in,
    they add cone rows per environment — capsule/sphere collision geoms
    (``collision=True`` → self/obstacle pairs, ``ground_geoms=True`` →
    geom-vs-ground contact).

    ``**opts`` forwards to :class:`GroundEnv` (``iters``, ``gravity``,
    ``erp``, ``margin``, ``restitution``, ``min_height``, ``max_tilt``,
    ``mu_collision``, ``mu_ground``…).
    """
    desc = _mjcf.parse_mjcf(source)
    sites = _mjcf.mjcf_sites(source)
    types = desc.joint_types
    demoted = False
    if (types and types[0] == "floating"
            and not any(t in ("spherical", "floating") for t in types[1:])):
        desc_arm = demote_floating_root(desc)
        model = free_flyer_model(desc_arm, dtype=dtype)
        kind, demoted = "fb", True
    elif any(t in ("spherical", "floating") for t in types):
        model = _md.multidof_model_from_description(desc, dtype=dtype)
        kind = "md"
    else:
        model = free_flyer_model(desc, dtype=dtype)   # jointless-root idiom
        kind = "fb"
    remap = (lambda l: l - 1) if demoted else (lambda l: l)

    names = feet if feet is not None else _site_feet(sites)
    if not names:
        raise ValueError("no foot sites found — name them foot*/toe* or "
                         "pass feet=[site names]")
    fs = [sites[nm] for nm in names]
    feet_links = tuple(remap(s.link) for s in fs)
    if kind == "fb" and any(l < 0 for l in feet_links):
        raise ValueError("a foot site sits on the base — feet must ride "
                         "moving links")
    offsets = np.stack([s.pos for s in fs])

    act_kw = {}
    act = _mjcf.mjcf_actuators(source)
    if len(act.joint):
        gain, bias_q, bias_v = act.gains()
        flo = (act.force_lower if act.force_lower is not None
               else np.full(len(act.joint), -np.inf))
        fhi = (act.force_upper if act.force_upper is not None
               else np.full(len(act.joint), np.inf))
        act_kw = dict(act_gear=np.asarray(act.gear), act_gain=gain,
                      act_bias_q=bias_q, act_bias_v=bias_v,
                      act_flo=flo, act_fhi=fhi,
                      ctrl_lower=act.ctrl_lower, ctrl_upper=act.ctrl_upper)
        if act.tendon is not None and np.any(act.tendon >= 0):
            # tendon transmission somewhere → the moment-matrix path for
            # the whole block (its joint rows are gear·e_j, identical to
            # the indexed path); the expansion's own guards catch a
            # moment on the root free joint / a multi-dof joint
            mq, mv = _joint_matrix_to_env(act.moment, kind, model,
                                          demoted, what="actuator moment")
            act_kw.update(
                act_vidx=np.full(len(act.joint), -1, np.int64),
                act_qidx=np.full(len(act.joint), -1, np.int64),
                act_moment_q=mq, act_moment_v=mv)
        else:
            if kind == "fb":
                vidx, qidx = _act_arrays_fb(act, model.n, demoted)
            else:
                vidx, qidx = _act_arrays_md(act, model)
            act_kw.update(act_vidx=vidx, act_qidx=qidx)

    tend_kw = {}
    tend = _mjcf.mjcf_tendons(source)
    if len(tend.names):
        A_q, A_v = _joint_matrix_to_env(tend.coef, kind, model, demoted)
        lm = tend.limited
        if use_limits and lm.any():
            tend_kw["tendons"] = (A_q[lm], A_v[lm], tend.lo[lm],
                                  tend.hi[lm])
        pm = (tend.stiffness > 0) | (tend.damping > 0)
        if pm.any():
            tend_kw["tendon_passive"] = (
                A_q[pm], A_v[pm], tend.stiffness[pm], tend.damping[pm],
                tend.springlength[pm])

    limits = effort = fl = None
    if kind == "fb":
        d = desc_arm if demoted else desc
        if use_limits:
            if d.q_lower is not None and np.any(np.isfinite(d.q_lower)):
                limits = (d.q_lower, d.q_upper)
            if d.effort is not None and np.any(np.isfinite(d.effort)):
                effort = d.effort
        if d.frictionloss is not None and np.any(d.frictionloss > 0):
            fl = d.frictionloss
    else:
        # md route: expand the per-JOINT document grants to the model's
        # coordinate layouts — limits on the scalar (hinge/slide) q
        # slots (ball/free slots stay ±inf: no scalar range exists),
        # effort/frictionloss on every tangent coordinate of the joint
        limits, effort, fl = _md_joint_grants(model, desc,
                                              use_limits=use_limits)

    cm = gg = None
    if collision or ground_geoms:
        _, cmodel = _mjcf.mjcf_collision_model(source, dtype=dtype)
        if demoted and cmodel is not None:
            geoms = cmodel.geoms._replace(
                links=tuple(remap(l) for l in cmodel.geoms.links))
            cmodel = cmodel._replace(geoms=geoms)
        if collision:
            cm = cmodel
        if ground_geoms and cmodel is not None:
            gg = cmodel.geoms
    lp = _mjcf.mjcf_loops(source) if loops == "auto" else (loops or None)
    if lp is not None and demoted:
        pairs, oa, ob = lp
        lp = (tuple((remap(a), remap(b)) for a, b in pairs), oa, ob)
    # welds are parsed independently of the loops= override: passing
    # explicit loop cuts must not silently drop the document's welds
    # (welds=False opts out; an explicit (pairs, oa, ob, R0) overrides)
    wd = _mjcf.mjcf_welds(source) if welds == "auto" else (welds or None)
    welds = None
    if wd is not None:
        wpairs, woa, wob, wR0 = wd
        if demoted:
            if any(a == 0 or b == 0 for a, b in wpairs):
                raise NotImplementedError(
                    "weld attached to the floating-base body is not "
                    "representable on the free-flyer base")
            wpairs = tuple((remap(a), b if b < 0 else remap(b))
                           for a, b in wpairs)
        # anchor halves ARE connect rows — merge into the loop cut list;
        # orientation halves ride welds=(pairs, R0)
        if lp is None:
            lp = (wpairs, woa, wob)
        else:
            lpairs0, loa0, lob0 = lp
            lp = (tuple(lpairs0) + wpairs,
                  np.concatenate([np.asarray(loa0), woa]),
                  np.concatenate([np.asarray(lob0), wob]))
        welds = (wpairs, wR0)

    raw_sens = (_mjcf.mjcf_sensors(source) if sensors == "auto"
                else tuple(sensors or ()))
    sens = (_resolve_sensors(raw_sens, source, desc, kind, model, demoted,
                             sites, act)
            if raw_sens else ())

    return GroundEnv(kind=kind, model=model, feet=feet_links,
                     offsets=offsets, dt=dt, mu=mu, limits=limits,
                     effort=effort, frictionloss=fl, terrain=terrain,
                     collision=cm, ground_geoms=gg, loops=lp, welds=welds,
                     sensors=sens, init_height=init_height, **act_kw,
                     **tend_kw, **opts)


def make_ground_env_urdf(urdf: str, feet, offsets, *, dt: float = 2e-3,
                         mu: float = 0.8, use_limits: bool = True,
                         init_height: float = 0.5, dtype=jnp.float32,
                         **opts) -> GroundEnv:
    """Build a free-flyer :class:`GroundEnv` from a fixed-base URDF (the
    root link becomes the floating base): ``feet`` are moving-link indices,
    ``offsets (k, 3)`` the anchors in link frames. URDF has no actuator
    block — ``ctrl`` is the joint torque vector directly (the ``<limit
    effort>`` clamp still applies when present)."""
    desc = parse_urdf(urdf)
    model = free_flyer_model(desc, dtype=dtype)
    limits = effort = None
    if use_limits:
        if desc.q_lower is not None and np.any(np.isfinite(desc.q_lower)):
            limits = (desc.q_lower, desc.q_upper)
        if desc.effort is not None and np.any(np.isfinite(desc.effort)):
            effort = desc.effort
    return GroundEnv(kind="fb", model=model, feet=tuple(feet),
                     offsets=np.asarray(offsets, np.float64), dt=dt, mu=mu,
                     limits=limits, effort=effort, init_height=init_height,
                     **opts)
