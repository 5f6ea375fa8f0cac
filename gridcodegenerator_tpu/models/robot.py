"""RobotModel — the per-robot constants pytree.

TPU-native replacement for the reference's generated ``robotModel`` struct +
``init_XImats`` / ``load_update_XImats_helpers``
(``/root/reference/helpers/_topology_helpers.py:3-54,90-182``): where the
reference bakes each robot's X/I matrices into CUDA source and patches the
q-dependent entries from sympy expressions at runtime, we precompute constant
coefficient matrices so that every joint transform is an affine function of
``(sin q, cos q)`` (revolute) or ``q`` (prismatic):

    X_i(q_i) = Xb_i + f1(q_i) · Xs_i + f2(q_i) · Xc_i

with ``f1 = sin, f2 = cos`` for revolute and ``f1 = id, f2 = 0`` for
prismatic. This evaluates all n transforms for a whole batch as three fused
multiply-adds — no per-entry sympy patching, no scalar loops, ideal for the
TPU vector unit.

Derivation (Featherstone conventions, [angular; linear] ordering): with
``K = skew(axis)`` and ``K6 = blockdiag(K, K)``, the joint rotation transform
is ``X_J(q) = I − sin(q)·K6 + (1 − cos(q))·K6²`` (child←joint coordinates),
so ``X(q) = X_J(q) · X_T`` expands to the affine form above with

    Xb = (I + K6²)·X_T,   Xs = −K6·X_T,   Xc = −K6²·X_T.

For prismatic joints ``X_J(q) = I + q·L6`` with ``L6 = [[0,0],[−skew(a),0]]``.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .topology import Topology
from .urdf import RobotDescription, parse_urdf, rpy_to_matrix, skew


def _origin_xform(R: np.ndarray, r: np.ndarray) -> np.ndarray:
    """Constant spatial motion transform of a joint origin: child frame pose
    (R, r) in parent coordinates → ``X = [[E,0],[−E·r̂,E]]`` with ``E = Rᵀ``."""
    E = R.T
    X = np.zeros((6, 6))
    X[:3, :3] = E
    X[3:, 3:] = E
    X[3:, :3] = -E @ skew(r)
    return X


def joint_xform_coefficients(desc: RobotDescription):
    """Precompute (Xb, Xs, Xc) stacks, each (n, 6, 6) float64."""
    n = desc.n
    Xb = np.zeros((n, 6, 6))
    Xs = np.zeros((n, 6, 6))
    Xc = np.zeros((n, 6, 6))
    I6 = np.eye(6)
    for i in range(n):
        R = rpy_to_matrix(desc.origin_rpy[i])
        XT = _origin_xform(R, desc.origin_xyz[i])
        a = desc.axis[i]
        if desc.joint_types[i] == "prismatic":
            L6 = np.zeros((6, 6))
            L6[3:, :3] = -skew(a)
            Xb[i] = XT
            Xs[i] = L6 @ XT
            # Xc stays 0
        else:  # revolute / continuous
            K = skew(a)
            K6 = np.zeros((6, 6))
            K6[:3, :3] = K
            K6[3:, 3:] = K
            K6sq = K6 @ K6
            Xb[i] = (I6 + K6sq) @ XT
            Xs[i] = -K6 @ XT
            Xc[i] = -K6sq @ XT
    return Xb, Xs, Xc


def joint_motion_subspaces(desc: RobotDescription) -> np.ndarray:
    """S vectors, (n, 6): ``[axis; 0]`` revolute, ``[0; axis]`` prismatic.

    Generalizes the reference's one-hot-only S
    (``/root/reference/helpers/_spatial_algebra_helpers.py:13``) to arbitrary
    fixed axes.
    """
    S = np.zeros((desc.n, 6))
    for i in range(desc.n):
        if desc.joint_types[i] == "prismatic":
            S[i, 3:] = desc.axis[i]
        else:
            S[i, :3] = desc.axis[i]
    return S


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class RobotModel:
    """Per-robot constants. Array leaves are traced/jittable; ``topology``,
    ``name`` and joint types are static metadata (recompile per robot — the
    TPU analog of the reference generating one header per robot,
    ``/root/reference/GRiDCodeGenerator.py:308-310``)."""

    # --- data (pytree leaves) ---
    Xb: jax.Array          # (n, 6, 6) constant term of X_i(q)
    Xs: jax.Array          # (n, 6, 6) sin/linear coefficient
    Xc: jax.Array          # (n, 6, 6) cos coefficient
    S: jax.Array           # (n, 6) joint motion subspace
    inertia: jax.Array     # (n, 6, 6) link spatial inertias
    damping: jax.Array     # (n,) viscous joint damping
    armature: jax.Array    # (n,) reflected rotor inertia: τᵢ += aᵢ·q̈ᵢ,
    #                        i.e. M → M + diag(a) (beyond the reference,
    #                        which has no rotor model; MuJoCo "armature"
    #                        semantics). Enters every family through the
    #                        articulated D = SᵀU + aᵢ term / the CRBA
    #                        diagonal — see PARITY.md "Armature".
    prismatic: jax.Array   # (n,) bool mask

    # --- static metadata ---
    topology: Topology = dataclasses.field(metadata=dict(static=True))
    name: str = dataclasses.field(metadata=dict(static=True))
    # joint types are static (trace-time) information: kernels specialize the
    # sin/cos-vs-linear transform update per joint without runtime selects
    joint_types: tuple = dataclasses.field(default=(), metadata=dict(static=True))
    # use the Cody-Waite/minimax sincos (ops/trig.py) instead of the
    # backend's: on TPU the stock f32 sin/cos lowerings are the dominant
    # term of the ∇FD parity budget (PARITY.md, "the f32 floor"). Static so
    # flipping it retraces every jitted consumer.
    accurate_trig: bool = dataclasses.field(default=False,
                                            metadata=dict(static=True))

    @property
    def n(self) -> int:
        return self.topology.n

    @property
    def dtype(self):
        return self.Xb.dtype

    def astype(self, dtype) -> "RobotModel":
        return dataclasses.replace(
            self,
            Xb=self.Xb.astype(dtype), Xs=self.Xs.astype(dtype),
            Xc=self.Xc.astype(dtype), S=self.S.astype(dtype),
            inertia=self.inertia.astype(dtype), damping=self.damping.astype(dtype),
            armature=self.armature.astype(dtype),
        )

    # ------------------------------------------------------------------ ops
    def joint_transforms(self, q: jax.Array) -> jax.Array:
        """All joint transforms X_i(q_i) as one fused affine update.

        The TPU-native analog of the reference's per-entry sympy patching in
        ``load_update_XImats_helpers``
        (``/root/reference/helpers/_topology_helpers.py:113-170``).

        Args:
          q: (..., n) joint positions.
        Returns:
          (..., n, 6, 6) motion transforms (child ← parent coordinates).
        """
        q = q.astype(self.dtype)
        if self.accurate_trig:
            from ..ops.trig import sincos
            s, c = sincos(q)
        else:
            s, c = jnp.sin(q), jnp.cos(q)
        f1 = jnp.where(self.prismatic, q, s)[..., None, None]
        f2 = jnp.where(self.prismatic, jnp.zeros_like(q), c)[..., None, None]
        return self.Xb + f1 * self.Xs + f2 * self.Xc


def robot_model_from_description(desc: RobotDescription, dtype=jnp.float32,
                                 accurate_trig: bool = False) -> RobotModel:
    if any(t in ("spherical", "floating") for t in desc.joint_types):
        raise ValueError(
            "robot has multi-dof (spherical/floating) joints — build it with "
            "ops/multidof.py::multidof_model_from_description instead of the "
            "single-dof RobotModel")
    Xb, Xs, Xc = joint_xform_coefficients(desc)
    S = joint_motion_subspaces(desc)
    prism = np.array([t == "prismatic" for t in desc.joint_types])
    armature = (np.zeros(desc.n) if desc.armature is None
                else np.asarray(desc.armature, np.float64))
    return RobotModel(
        Xb=jnp.asarray(Xb, dtype), Xs=jnp.asarray(Xs, dtype), Xc=jnp.asarray(Xc, dtype),
        S=jnp.asarray(S, dtype), inertia=jnp.asarray(desc.inertia, dtype),
        damping=jnp.asarray(desc.damping, dtype),
        armature=jnp.asarray(armature, dtype), prismatic=jnp.asarray(prism),
        topology=desc.topology, name=desc.name, joint_types=tuple(desc.joint_types),
        accurate_trig=accurate_trig,
    )


def with_armature(model: RobotModel, armature) -> RobotModel:
    """A copy of ``model`` with per-joint reflected rotor inertia (scalar or
    (n,)): every downstream algorithm then solves with M + diag(armature) and
    reports τᵢ += armatureᵢ·q̈ᵢ — MuJoCo's "armature" semantics, beyond the
    reference's rigid-link-only model. For robots whose URDF carries the
    nonstandard ``<dynamics armature="...">`` attribute this is already set
    by :func:`load_robot`."""
    a = jnp.broadcast_to(jnp.asarray(armature, model.dtype), (model.n,))
    return dataclasses.replace(model, armature=a)


def load_robot(urdf: str, dtype=jnp.float32) -> RobotModel:
    """Parse a URDF (path or XML string) into a jittable :class:`RobotModel`.

    The one-call analog of the reference's whole codegen pipeline
    (``GRiDCodeGenerator(robot).gen_all_code()`` →
    ``/root/reference/GRiDCodeGenerator.py:241``): everything downstream
    specializes to this robot at JAX trace time instead of CUDA emission time.
    """
    return robot_model_from_description(parse_urdf(urdf), dtype=dtype)
