"""Per-robot compiled artifacts — the ``gen_all_code()`` analog.

The reference's product is a robot-specialized source artifact: Python runs
once per robot and emits ``<namespace>.cuh`` for nvcc
(``/root/reference/GRiDCodeGenerator.py:241-310``). The TPU-native analog is
a robot-specialized **compiled executable** (specialization happens at trace
time; XLA plays nvcc):

* :func:`compile_robot` — AOT-compile every algorithm for a robot at fixed
  batch sizes; returns a :class:`CompiledRobot` whose members are loaded
  TPU executables (zero retracing/compilation at call time — the analog of
  shipping the compiled ``grid.cuh`` functions).
* :func:`export_robot` / :func:`load_exported` — serialize the specialized
  computations (StableHLO via ``jax.export``) to a single portable file that
  can be reloaded and executed without the URDF, parser, or tracing — the
  analog of handing someone the generated header.
"""

from __future__ import annotations

import io
import json
import zipfile
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
from jax import export as jax_export

from . import api
from .models.robot import RobotModel

_ALGORITHMS = {
    # name → (api function, number of state arguments)
    "inverse_dynamics": (api.inverse_dynamics, 3),
    "bias_force": (api.bias_force, 2),
    "direct_minv": (api.direct_minv, 1),
    "forward_dynamics": (api.forward_dynamics, 3),
    "inverse_dynamics_gradient": (api.inverse_dynamics_gradient, 3),
    "forward_dynamics_gradient": (api.forward_dynamics_gradient, 3),
}


def _specialized(model: RobotModel, name: str, gravity: float, impl: str):
    fn, n_args = _ALGORITHMS[name]
    kwargs = {} if name == "direct_minv" else {"gravity": gravity}

    def run(*states):
        return fn(model, *states, impl=impl, **kwargs)

    return run, n_args


@dataclass
class CompiledRobot:
    """AOT-compiled algorithm set for one robot at fixed batch sizes.

    ``compiled[(name, batch)]`` is a loaded executable; calling the attribute
    methods dispatches to it with no tracing or compilation."""

    name: str
    n: int
    batch_sizes: tuple
    compiled: dict = field(default_factory=dict)

    def _call(self, alg, *states):
        B = states[0].shape[0] if states[0].ndim > 1 else 0
        key = (alg, B)
        if key not in self.compiled:
            raise KeyError(
                f"{alg} not compiled for batch {B}; available: "
                f"{sorted(self.compiled)}")
        return self.compiled[key](*states)

    def inverse_dynamics(self, q, qd, qdd):
        return self._call("inverse_dynamics", q, qd, qdd)

    def bias_force(self, q, qd):
        return self._call("bias_force", q, qd)

    def direct_minv(self, q):
        return self._call("direct_minv", q)

    def forward_dynamics(self, q, qd, u):
        return self._call("forward_dynamics", q, qd, u)

    def inverse_dynamics_gradient(self, q, qd, qdd):
        return self._call("inverse_dynamics_gradient", q, qd, qdd)

    def forward_dynamics_gradient(self, q, qd, u):
        return self._call("forward_dynamics_gradient", q, qd, u)


def compile_robot(model: RobotModel, batch_sizes=(1024,), *,
                  algorithms=tuple(_ALGORITHMS), gravity: float = -9.81,
                  dtype=jnp.float32, impl: str = "auto") -> CompiledRobot:
    """AOT-compile the algorithm set for ``model`` (the ``gen_all_code`` +
    nvcc step collapsed into one call)."""
    out = CompiledRobot(name=model.name, n=model.n,
                        batch_sizes=tuple(batch_sizes))
    for name in algorithms:
        run, n_args = _specialized(model, name, gravity, impl)
        for B in batch_sizes:
            shape = jax.ShapeDtypeStruct((B, model.n), dtype)
            lowered = jax.jit(run).lower(*([shape] * n_args))
            out.compiled[(name, B)] = lowered.compile()
    return out


def export_robot(model: RobotModel, path: str, batch_sizes=(1024,), *,
                 algorithms=tuple(_ALGORITHMS), gravity: float = -9.81,
                 dtype=jnp.float32, impl: str = "vmap",
                 platforms=None) -> None:
    """Serialize the robot-specialized computations to ``path`` (a zip of
    StableHLO modules + metadata). ``impl='vmap'`` produces portable modules
    (pure StableHLO, exported for cpu+tpu by default); ``impl='pallas'``
    embeds TPU Mosaic kernels (TPU-only artifact)."""
    if platforms is None:
        platforms = ("tpu",) if impl == "pallas" else ("cpu", "tpu")
    meta = dict(name=model.name, n=model.n, batch_sizes=list(batch_sizes),
                gravity=gravity, dtype=str(jnp.dtype(dtype)),
                algorithms=list(algorithms), impl=impl,
                parents=list(model.topology.parents),
                joint_names=list(model.topology.joint_names))
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("meta.json", json.dumps(meta, indent=1))
        for name in algorithms:
            run, n_args = _specialized(model, name, gravity, impl)
            for B in batch_sizes:
                shape = jax.ShapeDtypeStruct((B, model.n), dtype)
                exp = jax_export.export(
                    jax.jit(run), platforms=list(platforms))(*([shape] * n_args))
                zf.writestr(f"{name}__{B}.shlo", exp.serialize())


@dataclass
class CompiledFreeFlyer:
    """AOT-compiled floating-base contact set for one robot + foot geometry
    at fixed environment counts — the deployment artifact for the
    quadruped / parallel-RL workload (stance solve + frictional ground
    step, fused Pallas kernels when compiled with ``impl='pallas'``)."""

    name: str
    n: int
    batch_sizes: tuple
    compiled: dict = field(default_factory=dict)

    def _call(self, alg, B, *args):
        key = (alg, B)
        if key not in self.compiled:
            raise KeyError(
                f"{alg} not compiled for batch {B}; available: "
                f"{sorted(self.compiled)}")
        return self.compiled[key](*args)

    def stance_fd(self, quat, pos, q, vb, qd, tau):
        """(B,4),(B,3),(B,n),(B,6),(B,n),(B,n) → (v̇b, q̈, λ)."""
        return self._call("stance_fd", q.shape[0], quat, pos, q, vb, qd, tau)

    def ground_step(self, quat, pos, q, vb, qd, tau):
        """One frictional environment step → (quat₂, pos₂, q₂, v̇b₂, q̇₂,
        impulses (B,k,3))."""
        return self._call("ground_step", q.shape[0], quat, pos, q, vb, qd,
                          tau)


def compile_freeflyer(ffm, links, offsets, batch_sizes=(1024,), *,
                      dt: float = 1e-3, mu: float = 0.8,
                      ground_z: float = 0.0, gravity: float = -9.81,
                      anchors=None, baumgarte=(0.0, 0.0), reg: float = 0.0,
                      iters: int = 30, dtype=jnp.float32,
                      impl: str = "auto") -> CompiledFreeFlyer:
    """AOT-compile the stance solve and the frictional ground stepper for a
    free-flyer robot with fixed foot geometry — the contact-layer analog of
    :func:`compile_robot` (zero tracing at serving time)."""
    from .ops import contact as _ct

    links = tuple(links)
    n = ffm.n
    out = CompiledFreeFlyer(name=ffm.arm.name, n=n,
                            batch_sizes=tuple(batch_sizes))

    def stance(quat, pos, q, vb, qd, tau):
        return _ct.fb_constrained_fd_batched(
            ffm, quat, pos, q, vb, qd, tau, links, offsets, anchors,
            gravity, baumgarte, reg, impl=impl)

    def step(quat, pos, q, vb, qd, tau):
        nxt, imp = _ct.fb_step_ground_batched(
            ffm, (quat, pos, q, vb, qd), tau, dt, links, offsets, mu,
            ground_z, gravity, iters, impl=impl)
        return (*nxt, imp)

    for B in batch_sizes:
        shapes = [jax.ShapeDtypeStruct((B, d), dtype)
                  for d in (4, 3, n, 6, n, n)]
        for name, fn in (("stance_fd", stance), ("ground_step", step)):
            out.compiled[(name, B)] = jax.jit(fn).lower(*shapes).compile()
    return out


@dataclass
class CompiledMultiDof:
    """AOT-compiled generalized-coordinate algorithm set (spherical /
    in-tree floating joints, quaternion coordinates) at fixed batch sizes
    — the md-family analog of :class:`CompiledRobot`. On TPU the gradient
    entries embed the fused single-tile kernels or, past the VMEM gate,
    the column-blocked staged md pipeline."""

    name: str
    nq: int
    nv: int
    batch_sizes: tuple
    compiled: dict = field(default_factory=dict)

    def _call(self, alg, B, *args):
        key = (alg, B)
        if key not in self.compiled:
            raise KeyError(
                f"{alg} not compiled for batch {B}; available: "
                f"{sorted(self.compiled)}")
        return self.compiled[key](*args)

    def inverse_dynamics(self, q, qd, qdd):
        return self._call("md_id", q.shape[0], q, qd, qdd)

    def forward_dynamics(self, q, qd, u):
        return self._call("md_fd", q.shape[0], q, qd, u)

    def id_grad(self, q, qd, qdd):
        return self._call("md_id_grad", q.shape[0], q, qd, qdd)

    def forward_dynamics_gradient(self, q, qd, u):
        return self._call("md_fd_grad", q.shape[0], q, qd, u)


def compile_multidof(model, batch_sizes=(1024,), *, gravity: float = -9.81,
                     dtype=jnp.float32, impl: str = "auto") -> CompiledMultiDof:
    """AOT-compile the multi-dof algorithm set (ID, FD, tangent-space
    ∂ID/∇FD) for a :class:`~gridcodegenerator_tpu.ops.multidof.
    MultiDofModel` — zero tracing at serving time."""
    from .ops import multidof as _md

    algs = {
        "md_id": lambda q, qd, qdd: _md.md_inverse_dynamics_batched(
            model, q, qd, qdd, gravity, impl=impl),
        "md_fd": lambda q, qd, u: _md.md_forward_dynamics_batched(
            model, q, qd, u, gravity, impl=impl),
        "md_id_grad": lambda q, qd, qdd: _md.md_id_grad_batched(
            model, q, qd, qdd, gravity, impl=impl),
        "md_fd_grad":
            lambda q, qd, u: _md.md_forward_dynamics_gradient_batched(
                model, q, qd, u, gravity, impl=impl),
    }
    out = CompiledMultiDof(name=model.name, nq=model.nq, nv=model.nv,
                           batch_sizes=tuple(batch_sizes))
    for name, fn in algs.items():
        for B in batch_sizes:
            shapes = [jax.ShapeDtypeStruct((B, model.nq), dtype),
                      jax.ShapeDtypeStruct((B, model.nv), dtype),
                      jax.ShapeDtypeStruct((B, model.nv), dtype)]
            out.compiled[(name, B)] = jax.jit(fn).lower(*shapes).compile()
    return out


@dataclass
class ExportedRobot:
    """Reloaded serialized robot — callable without URDF/parsing/tracing."""

    meta: dict
    _fns: dict

    def __getattr__(self, alg):
        if alg.startswith("_"):
            raise AttributeError(alg)
        if alg not in self.meta["algorithms"]:
            raise AttributeError(f"{alg} was not exported")

        def call(*states):
            B = states[0].shape[0]
            return self._fns[(alg, B)].call(*states)

        return call


def load_exported(path: str) -> ExportedRobot:
    with zipfile.ZipFile(path) as zf:
        meta = json.loads(zf.read("meta.json"))
        fns = {}
        for name in zf.namelist():
            if not name.endswith(".shlo"):
                continue
            alg, B = name[:-5].rsplit("__", 1)
            fns[(alg, int(B))] = jax_export.deserialize(zf.read(name))
    return ExportedRobot(meta=meta, _fns=fns)
