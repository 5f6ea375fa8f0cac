"""Domain randomization: per-environment model parameters.

RL sim-to-real training randomizes physics per environment — link masses,
joint damping, rotor inertia, friction. The contact steppers already take
per-environment ``mu``; this module adds per-environment MODEL constants for
every model family, without touching the dynamics code: model pytrees
(:class:`~..models.robot.RobotModel`, ``FreeFlyerModel``, ``MultiDofModel``)
whose randomized leaves carry a leading batch axis, plus a generic lifter
that vmaps any single-state entry point over (model leaves, states)
simultaneously.

The lift runs the vmap execution tier (one trace, batched by XLA) — exact
per-environment physics, differentiable through the randomization factors
(the system-identification shape: ``grad(loss)(factors)`` flows through
:func:`scale_links`). The batch-last / fused-kernel tiers bake model
constants per robot (the reference's one-header-per-robot specialization,
``/root/reference/GRiDCodeGenerator.py:308-310``) and keep their speed for
the homogeneous-fleet case; heterogeneous fleets pay the vmap tier.

Typical use::

    model_b = randomize_model(model, key, B, inertia_scale=0.2,
                              damping_scale=0.5)
    fd_b = vmap_model(ops.fd.forward_dynamics, model_b, model)
    qdd = fd_b(q, qd, u)                        # (B, n), per-env physics
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

__all__ = ["model_axes", "vmap_model", "scale_links", "randomize_model"]


def model_axes(model_b, model):
    """in_axes pytree for a batched model: 0 for every leaf that grew a
    leading batch axis relative to the unbatched ``model``, None (broadcast)
    for the rest. Works for any registered model pytree."""
    return jax.tree_util.tree_map(
        lambda b, u: 0 if jnp.ndim(b) == jnp.ndim(u) + 1 else None,
        model_b, model)


def vmap_model(fn, model_b, model, out_axes=0):
    """Lift ``fn(model, *args, **kw)`` over a batched model: returns
    ``batched(*args, **kw)`` mapping the model's batched leaves AND every
    positional arg's leading axis together. kwargs are passed through
    unmapped (static options like ``gravity=``)."""
    axes = model_axes(model_b, model)

    def batched(*args, **kw):
        return jax.vmap(lambda m, a: fn(m, *a, **kw),
                        in_axes=(axes, 0), out_axes=out_axes)(model_b, args)

    return batched


def scale_links(model, inertia_factors=None, damping_factors=None,
                armature_factors=None):
    """Scale model constants by (possibly batched) per-link factors:
    ``inertia_factors`` (..., n) multiplies each link's spatial inertia
    (uniform density scaling — COM and radii of gyration preserved),
    ``damping_factors``/``armature_factors`` (..., n) the joint damping /
    rotor inertia. Leading axes become the model batch. Differentiable in
    every factor (system identification / randomization curricula)."""
    kw = {}
    if inertia_factors is not None:
        f = jnp.asarray(inertia_factors, model.inertia.dtype)
        kw["inertia"] = model.inertia * f[..., None, None]
    if damping_factors is not None:
        kw["damping"] = model.damping * jnp.asarray(
            damping_factors, model.damping.dtype)
    if armature_factors is not None:
        kw["armature"] = model.armature * jnp.asarray(
            armature_factors, model.armature.dtype)
    return dataclasses.replace(model, **kw)


def randomize_model(model, key, B: int, *, inertia_scale: float = 0.0,
                    damping_scale: float = 0.0,
                    armature_scale: float = 0.0):
    """Sample a B-environment batched model: each scale ``s`` draws
    independent per-link multiplicative factors uniform in [1−s, 1+s]
    (s = 0 leaves that leaf unbatched). Returns the batched model; recover
    the in_axes with :func:`model_axes` or lift entries directly with
    :func:`vmap_model`."""
    n = model.inertia.shape[0]
    k1, k2, k3 = jax.random.split(key, 3)

    def draw(k, s):
        if s == 0.0:
            return None
        return 1.0 + s * jax.random.uniform(k, (B, n), model.inertia.dtype,
                                            -1.0, 1.0)

    return scale_links(model,
                       inertia_factors=draw(k1, inertia_scale),
                       damping_factors=draw(k2, damping_scale),
                       armature_factors=draw(k3, armature_scale))
