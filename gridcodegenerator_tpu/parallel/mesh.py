"""Multi-chip sharding over TPU meshes.

The reference is a single-GPU engine — its only "transport" is
``cudaMemcpyAsync`` over three priority streams
(``/root/reference/GRiDCodeGenerator.py:155-188``). The TPU-native
distributed design (SURVEY.md §2.5/§5.8) exploits the two embarrassingly
parallel axes of batched rigid-body dynamics:

* **dp (data / batch)** — trajectory states are independent; the batch axis
  shards across the mesh with zero collectives on the compute path. This is
  the production scale-out axis (ICI within a pod slice, DCN across hosts).
* **cp (column / Jacobian)** — the 2n derivative directions of ∇ID/∇FD are
  independent given the shared (v, a, f, M⁻¹) state; for latency-bound small
  batches, columns shard across ``cp`` and each device runs
  :func:`..ops.fd_grad.forward_dynamics_gradient_cols` on its block.

Robot constants (the ``robotModel`` struct analog) are replicated.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.robot import RobotModel
from ..ops import fd_grad as _fd_grad


def make_mesh(dp: int | None = None, cp: int = 1, devices=None) -> Mesh:
    """Build a (dp, cp) mesh. Defaults: all devices on the dp axis."""
    devices = list(jax.devices()) if devices is None else list(devices)
    if dp is None:
        dp = len(devices) // cp
    if dp * cp != len(devices):
        devices = devices[: dp * cp]
    dev_array = np.array(devices).reshape(dp, cp)
    return Mesh(dev_array, axis_names=("dp", "cp"))


def replicate_model(model: RobotModel, mesh: Mesh) -> RobotModel:
    """Place the robot-constant pytree on every device (the TPU analog of
    ``init_robotModel`` copying XImats to the GPU,
    ``/root/reference/helpers/_topology_helpers.py:365-380``)."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), model)


def shard_batch(fn, mesh: Mesh, n_state_args: int, out_ndim: int = 2):
    """Lift a batched function ``fn(model, *states)`` to run sharded over the
    mesh's ``dp`` axis (states sharded on their leading batch axis, model
    replicated). Pure data parallelism: XLA inserts no collectives."""

    state_spec = P(("dp", "cp"))  # batch over every device

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(),) + (state_spec,) * n_state_args,
        out_specs=state_spec,
    )
    def sharded(model, *states):
        return fn(model, *states)

    return jax.jit(sharded)


def sharded_fd_grad(model: RobotModel, mesh: Mesh, gravity: float = -9.81):
    """Batched ∇FD sharded over a 2-D (dp × cp) mesh.

    Returns a jitted ``f(q, qd, u) -> (B, n, 2n)`` where the batch is sharded
    over ``dp`` and the 2n Jacobian columns are computed block-parallel over
    ``cp`` (each cp shard runs the column-blocked gradient recursion for its
    own block of differentiation directions, then the blocks concatenate
    along the column axis).

    Requirements: B divisible by ``dp``; the column axis is padded up to a
    multiple of ``cp`` internally and sliced back afterwards.
    """
    n = model.n
    cp = mesh.shape["cp"]
    blk = -(-n // cp)          # ceil(n / cp): q-columns per cp shard
    padded = blk * cp

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P("dp"), P("dp"), P("dp")),
        out_specs=(P("dp", None, "cp"), P("dp", None, "cp")),
    )
    def _run(mdl, q, qd, u):
        offset = jax.lax.axis_index("cp") * blk
        f = jax.vmap(
            lambda qq, qqd, uu: _fd_grad.forward_dynamics_gradient_cols(
                mdl, qq, qqd, uu, gravity, col_offset=offset, col_count=blk))
        return f(q, qd, u)

    @jax.jit
    def fd_grad_fn(q, qd, u):
        ddq, ddqd = _run(model, q, qd, u)
        return jnp.concatenate([ddq[..., :n], ddqd[..., :n]], axis=-1)

    return fd_grad_fn


def sharded_fd_grad_fused(model: RobotModel, mesh: Mesh, gravity: float = -9.81,
                          block_b=None, interpret: bool = False):
    """dp-sharded batched ∇FD that runs the *same fused Pallas kernel* per
    shard as the single-chip production path (``ops/kernels/fused.py::
    fd_grad_fused``) — one code path from one chip to a pod slice (the
    unification the reference gets for free by having exactly one kernel;
    its multi-GPU analog would be the 3-stream host overlap,
    ``GRiDCodeGenerator.py:155-188``).

    ``interpret=True`` runs the kernel bodies in Pallas interpret mode so the
    combination shard_map ∘ fused-kernel is testable on a CPU mesh
    (tests/test_sharding.py::test_sharded_fused_equals_sharded_vmap).
    """
    from ..ops.kernels import fused

    n = model.n
    spec = P(("dp", "cp"))

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), spec, spec, spec), out_specs=spec,
        # pallas_call does not annotate varying-mesh-axes metadata; the body
        # is per-shard pure (no collectives), so the vma check is vacuous
        check_vma=False)
    def _run(mdl, q, qd, u):
        bl = [s.T for s in (q, qd, u)]        # (n, b_local) batch-last
        ddq, ddqd = fused.fd_grad_fused(mdl, *bl, gravity,
                                        block_b=block_b, interpret=interpret)
        J = jnp.concatenate([ddq, ddqd], axis=1)   # (n, 2n, b_local)
        return jnp.moveaxis(J, -1, 0)

    return jax.jit(lambda q, qd, u: _run(model, q, qd, u))


def sharded_md_fd_grad(model, mesh: Mesh, gravity: float = -9.81,
                       impl: str = "auto"):
    """dp-sharded batched tangent-space ∇FD for multi-dof / floating-base
    models (:class:`..ops.multidof.MultiDofModel`): the batch shards over
    the mesh, each shard runs the batched production path —
    ``md_forward_dynamics_gradient_batched``, which on TPU routes to the
    fused single-tile kernel or, past the VMEM gate (humanoid free-flyer
    scale), the column-blocked staged md pipeline
    (`ops/kernels/multidof_staged.py`). Pure data parallelism (the
    tangent-space recursion is per-state); no collectives.

    Returns a jitted ``fn(q (B,nq), qd (B,nv), u (B,nv)) -> (∂q̈/∂δq,
    ∂q̈/∂q̇, ∂q̈/∂u)``, each (B, nv, nv), B divisible by the mesh size."""
    from ..ops import multidof as _md

    spec = P(("dp", "cp"))

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(spec, spec, spec), out_specs=(spec, spec, spec),
        # pallas bodies are per-shard pure (no collectives); vma is vacuous
        check_vma=False)
    def _run(q, qd, u):
        # model is a closure capture, NOT a shard_map operand: the md
        # kernels bake its constants as trace-time literals (concrete
        # required), same as sharded_ground_step's ffm
        return _md.md_forward_dynamics_gradient_batched(
            model, q, qd, u, gravity=gravity, impl=impl)

    return jax.jit(_run)


def sharded_constrained_fd(model: RobotModel, mesh: Mesh, links, offsets,
                           anchors=None, gravity: float = -9.81,
                           baumgarte=(0.0, 0.0), reg: float = 0.0):
    """dp-sharded stance/pinned forward dynamics: the batch shards over the
    mesh, the contact geometry replicates — the deployment shape for
    stance-phase trajectory optimization at pod scale. Pure data
    parallelism (the Delassus solve is per-state); no collectives. Each
    shard runs the batched production path (``api.constrained_forward_
    dynamics`` → batch-last contact pipeline, fused dynamics kernels on
    TPU), not a vmap of single states."""
    from .. import api

    links = tuple(links)
    offsets = jnp.asarray(offsets)
    anch = None if anchors is None else jnp.asarray(anchors)
    spec = P(("dp", "cp"))

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), spec, spec, spec), out_specs=(spec, spec))
    def _run(mdl, q, qd, u):
        return api.constrained_forward_dynamics(
            mdl, q, qd, u, links, offsets, anch, gravity=gravity,
            baumgarte=baumgarte, reg=reg)

    model = replicate_model(model, mesh)
    return jax.jit(lambda q, qd, u: _run(model, q, qd, u))


def sharded_ground_step(ffm, mesh: Mesh, links, offsets, dt, mu=0.8,
                        ground_z: float = 0.0, gravity: float = -9.81,
                        iters: int = 30, erp: float = 0.2,
                        margin: float = 1e-3, restitution: float = 0.0,
                        impl: str = "auto", terrain=None,
                        collision=None, mu_collision=None,
                        ground_geoms=None, mu_ground=None, loops=None):
    """dp-sharded batched frictional environment stepper — the multi-chip
    parallel-RL shape: N environments shard over the mesh, each shard
    advances its slice with :func:`..ops.contact.fb_step_ground_batched`
    (ONE fused Pallas kernel per lane tile on TPU). Environments are
    independent → pure data parallelism, no collectives; scaling is linear
    in chips by construction.

    ``terrain``: optional heightfield (:class:`..ops.terrain.Terrain`) —
    the node table is replicated to every shard (it is a model constant,
    exactly like the robot inertias). ``collision``: optional
    :class:`..ops.collision.CollisionModel`, likewise replicated — every
    shard solves its environments' self-collision/obstacle cone rows
    in-kernel. ``loops``: optional loop-closure cuts
    ``(pairs, offsets_a, offsets_b)`` as bilateral rows in each shard's
    PGS (closed-chain linkage legs; static geometry, replicated).
    ``ground_geoms``/``mu_ground``: geom-vs-ground cone rows (capsule
    feet, fallen-torso contact), likewise replicated static geometry.

    Returns a jitted ``step(state, tau) -> (next_state, impulses)`` with
    ``state = (quat (B,4), pos (B,3), q (B,n), vb (B,6), qd (B,n))``,
    B divisible by the mesh size."""
    from ..ops import contact as _ct

    links = tuple(links)
    off = np.asarray(offsets, np.float64)
    spec = P(("dp", "cp"))
    state_specs = (spec,) * 5

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(state_specs, spec), out_specs=(state_specs, spec),
        # the fused kernel body is per-shard pure (no collectives); pallas
        # carries no varying-mesh-axes metadata, so the vma check is vacuous
        check_vma=False)
    def _step(state, tau):
        return _ct.fb_step_ground_batched(
            ffm, state, tau, dt, links, off, mu, ground_z, gravity, iters,
            erp, margin, restitution, impl=impl, terrain=terrain,
            collision=collision, mu_collision=mu_collision,
            ground_geoms=ground_geoms, mu_ground=mu_ground, loops=loops)

    return jax.jit(_step)


def sharded_fb_fd(ffm, mesh: Mesh, gravity: float = -9.81,
                  impl: str = "auto"):
    """dp-sharded free-flyer forward dynamics: batch-first states shard
    over the mesh, each shard runs the batched production path
    (:func:`..ops.freeflyer.fb_forward_dynamics_batched` — the fused
    floating-base ABA kernel on TPU). Pure data parallelism, no
    collectives.

    Returns a jitted ``fd(quat (B,4), q (B,n), vb (B,6), qd (B,n),
    tau (B,n)) -> (v̇b (B,6), q̈ (B,n))``, B divisible by the mesh size."""
    from ..ops import freeflyer as _ff

    spec = P(("dp", "cp"))

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(spec,) * 5, out_specs=(spec, spec),
        # the fused kernel body is per-shard pure (no collectives)
        check_vma=False)
    def _run(quat, q, vb, qd, tau):
        return _ff.fb_forward_dynamics_batched(
            ffm, quat, q, vb, qd, tau, gravity, impl=impl)

    return jax.jit(_run)


def sharded_api(model: RobotModel, mesh: Mesh, gravity: float = -9.81):
    """Convenience bundle of dp-sharded batched entry points (the distributed
    equivalent of the reference host API set, ``GRiDCodeGenerator.py:243-279``).

    Every entry routes through the *public* single-chip API (``api.py``), so
    each shard resolves the same implementation the unsharded call would —
    fused Pallas kernels on TPU, the vmap path elsewhere. Multi-chip and
    single-chip are therefore the same compute code; ``shard_map`` only adds
    the batch partitioning (no collectives on any compute path)."""
    from .. import api

    model = replicate_model(model, mesh)

    def v(fn, k):
        return shard_batch(fn, mesh, n_state_args=k)

    return dict(
        inverse_dynamics=v(lambda m, q, qd, qdd: api.inverse_dynamics(m, q, qd, qdd, gravity=gravity), 3),
        bias_force=v(lambda m, q, qd: api.bias_force(m, q, qd, gravity=gravity), 2),
        direct_minv=v(lambda m, q: api.direct_minv(m, q, dense=True), 1),
        forward_dynamics=v(lambda m, q, qd, u: api.forward_dynamics(m, q, qd, u, gravity=gravity), 3),
        inverse_dynamics_gradient=v(lambda m, q, qd, qdd: api.inverse_dynamics_gradient(m, q, qd, qdd, gravity=gravity), 3),
        forward_dynamics_gradient=v(lambda m, q, qd, u: api.forward_dynamics_gradient(m, q, qd, u, gravity=gravity), 3),
        forward_dynamics_gradient_2d=sharded_fd_grad(model, mesh, gravity),
        forward_dynamics_gradient_fused=sharded_fd_grad_fused(model, mesh, gravity),
    )
