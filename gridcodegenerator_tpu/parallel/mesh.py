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


def sharded_api(model: RobotModel, mesh: Mesh, gravity: float = -9.81):
    """Convenience bundle of dp-sharded batched entry points (the distributed
    equivalent of the reference host API set, ``GRiDCodeGenerator.py:243-279``)."""
    from ..ops import fd, minv, rnea, rnea_grad

    model = replicate_model(model, mesh)

    def v(fn, k):
        batched = lambda m, *s: jax.vmap(lambda *ss: fn(m, *ss))(*s)
        return shard_batch(batched, mesh, n_state_args=k)

    return dict(
        inverse_dynamics=v(lambda m, q, qd, qdd: rnea.inverse_dynamics(m, q, qd, qdd, gravity), 3),
        bias_force=v(lambda m, q, qd: rnea.inverse_dynamics(m, q, qd, None, gravity), 2),
        direct_minv=v(lambda m, q: minv.direct_minv(m, q, dense=True), 1),
        forward_dynamics=v(lambda m, q, qd, u: fd.forward_dynamics(m, q, qd, u, gravity), 3),
        inverse_dynamics_gradient=v(lambda m, q, qd, qdd: rnea_grad.inverse_dynamics_gradient(m, q, qd, qdd, gravity), 3),
        forward_dynamics_gradient=v(lambda m, q, qd, u: _fd_grad.forward_dynamics_gradient(m, q, qd, u, gravity), 3),
        forward_dynamics_gradient_2d=sharded_fd_grad(model, mesh, gravity),
    )
