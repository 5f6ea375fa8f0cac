"""Public API: batched, jitted dynamics entry points.

This is the TPU-native replacement for the reference's generated host API
(``inverse_dynamics<T>(hd_data, d_robotModel, gravity, num_timesteps, ...)``,
``/root/reference/GRiDCodeGenerator.py:243-279``): instead of memcpy + kernel
launch + memcpy, every function is a jitted JAX computation that accepts a
single state ``(n,)`` or any batch ``(..., n)`` of states. The batch axis
plays the role of the reference's ``NUM_TIMESTEPS`` trajectory axis (one CUDA
block per state, ``_code_generation_helpers.py:41-47``) and is supplied by
``vmap``; sharding it across a TPU mesh lives in
:mod:`gridcodegenerator_tpu.parallel`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .models.robot import RobotModel, load_robot  # re-export  # noqa: F401
from .ops import fd, fd_grad, minv, rnea, rnea_grad


def _batchify(fn, n_state_args: int):
    """Lift a single-state function ``fn(model, *states, gravity=...)`` to
    accept arbitrary leading batch dimensions on its state arguments."""

    @functools.wraps(fn)
    def wrapped(model, *args, **kwargs):
        # TPU f32 matmuls default to bfloat16 passes; the 6-D spatial
        # contractions need true f32 accumulation to hit the parity target
        # (measured: 2.5e-3 → ~1e-6 relative error on ∇FD).
        with jax.default_matmul_precision("highest"):
            states = args[:n_state_args]
            batch_shape = jnp.shape(states[0])[:-1]
            if not batch_shape:
                return fn(model, *args, **kwargs)
            f = fn
            for _ in batch_shape:
                f = jax.vmap(f, in_axes=(None,) + (0,) * n_state_args)
            return f(model, *states, **kwargs)

    return wrapped


# --------------------------------------------------------------------------
# The five algorithm families (reference README.md:33-40)
# --------------------------------------------------------------------------
@functools.partial(jax.jit, static_argnames=("gravity",))
@functools.partial(_batchify, n_state_args=3)
def inverse_dynamics(model: RobotModel, q, qd, qdd, *, gravity: float = -9.81):
    """c(q, q̇, q̈): joint torques. RNEA."""
    return rnea.inverse_dynamics(model, q, qd, qdd, gravity)


@functools.partial(jax.jit, static_argnames=("gravity",))
@functools.partial(_batchify, n_state_args=2)
def bias_force(model: RobotModel, q, qd, *, gravity: float = -9.81):
    """c(q, q̇) with q̈ = 0 — the reference's no-qdd ID variant
    (``_inverse_dynamics.py:499-502``)."""
    return rnea.inverse_dynamics(model, q, qd, None, gravity)


@functools.partial(jax.jit, static_argnames=("dense",))
@functools.partial(_batchify, n_state_args=1)
def direct_minv(model: RobotModel, q, *, dense: bool = True):
    """Analytic M⁻¹(q). ``dense=False`` returns the raw upper triangle (the
    reference's native output convention, ``_direct_minv.py:32,390``)."""
    return minv.direct_minv(model, q, dense=dense)


@functools.partial(jax.jit, static_argnames=("gravity",))
@functools.partial(_batchify, n_state_args=3)
def forward_dynamics(model: RobotModel, q, qd, u, *, gravity: float = -9.81):
    """q̈ = M⁻¹ (u − c(q, q̇))."""
    return fd.forward_dynamics(model, q, qd, u, gravity)


@functools.partial(jax.jit, static_argnames=("gravity",))
@functools.partial(_batchify, n_state_args=3)
def inverse_dynamics_gradient(model: RobotModel, q, qd, qdd, *,
                              gravity: float = -9.81):
    """[∂c/∂q | ∂c/∂q̇] as (..., n, 2n)."""
    return rnea_grad.inverse_dynamics_gradient(model, q, qd, qdd, gravity)


@functools.partial(jax.jit, static_argnames=("gravity",))
@functools.partial(_batchify, n_state_args=3)
def forward_dynamics_gradient(model: RobotModel, q, qd, u, *,
                              gravity: float = -9.81):
    """[∂q̈/∂q | ∂q̈/∂q̇] as (..., n, 2n) — the north-star op."""
    return fd_grad.forward_dynamics_gradient(model, q, qd, u, gravity)


@functools.partial(jax.jit, static_argnames=("gravity",))
@functools.partial(_batchify, n_state_args=4)
def forward_dynamics_gradient_qdd_minv(model: RobotModel, q, qd, qdd, Minv, *,
                                       gravity: float = -9.81):
    """∇FD when q̈ and a dense-symmetric M⁻¹ are already available (the
    reference's ``USE_QDD_MINV_FLAG`` host mode,
    ``_forward_dynamics_gradient.py:119-127``)."""
    return fd_grad.forward_dynamics_gradient_qdd_minv(
        model, q, qd, qdd, Minv, gravity)
