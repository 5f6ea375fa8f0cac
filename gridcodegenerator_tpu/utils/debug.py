"""Step-matched debug instrumentation — the ``DEBUG_MODE`` analog.

The reference's debugging story (SURVEY.md §4.3): with ``DEBUG_MODE=True``
the generator emits serialized ``printf``/``printMat`` blocks after every
algorithm stage, and the NumPy golden model prints the identical labels at
the identical stages, so a human can diff device stdout against Python
stdout wave-by-wave (e.g. ``_inverse_dynamics.py:73-83`` vs
``_test.py:33-37``).

Here the same contract holds between the float64 golden model
(:func:`golden_rnea_trace`) and the traced JAX computation
(:func:`jax_rnea_trace`, using ``jax.debug.print`` so the prints fire from
inside jitted code on any backend): run both on the same state and diff the
outputs line by line.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..models.robot import RobotModel
from ..models.urdf import RobotDescription
from ..ops import rnea as rnea_ops
from ..ops.spatial import crm_apply, xform_apply, xform_T_apply
from .golden import GoldenDynamics, crf, crm

_FMT = "{:+.6e}"


def _fmt_vec(v):
    return " ".join(_FMT.format(float(x)) for x in np.asarray(v).ravel())


def golden_rnea_trace(desc: RobotDescription, q, qd, qdd=None, gravity=-9.81,
                      printer=print):
    """Stage-labelled golden RNEA (labels match :func:`jax_rnea_trace`)."""
    gold = GoldenDynamics(desc)
    n = desc.n
    X = gold.xmats(q)
    a_base = np.zeros(6)
    a_base[5] = -gravity
    v = np.zeros((n, 6))
    a = np.zeros((n, 6))
    for i in range(n):
        p = desc.topology.parents[i]
        Sqd = gold.S[i] * qd[i]
        v[i] = (X[i] @ v[p] if p >= 0 else 0) + Sqd
        a[i] = X[i] @ (a[p] if p >= 0 else a_base) + crm(v[i]) @ Sqd
        if qdd is not None:
            a[i] += gold.S[i] * qdd[i]
        printer(f"v[{i}] = {_fmt_vec(v[i])}")
        printer(f"a[{i}] = {_fmt_vec(a[i])}")
    f = np.zeros((n, 6))
    for i in range(n):
        Iv = gold.inertias[i] @ v[i]
        f[i] = gold.inertias[i] @ a[i] + crf(v[i]) @ Iv
        printer(f"f[{i}] = Ia + fxv(v,Iv) = {_fmt_vec(f[i])}")
    for i in range(n - 1, -1, -1):
        p = desc.topology.parents[i]
        if p >= 0:
            f[p] += X[i].T @ f[i]
            printer(f"f[{p}] += X^T f[{i}] = {_fmt_vec(f[p])}")
    c = np.array([gold.S[i] @ f[i] for i in range(n)])
    c += gold.damping * np.asarray(qd)
    printer(f"c = {_fmt_vec(c)}")
    return c


def jax_rnea_trace(model: RobotModel, q, qd, qdd=None, gravity=-9.81):
    """Stage-labelled traced RNEA: identical computation and labels, printed
    via ``jax.debug.print`` (works inside jit, on TPU)."""
    topo = model.topology
    n = topo.n
    X = model.joint_transforms(q)
    a_base = rnea_ops.gravity_accel(gravity, X.dtype)
    fmt6 = " ".join(["{:+.6e}"] * 6)
    v = [None] * n
    a = [None] * n
    for i in range(n):
        p = topo.parents[i]
        Sqd = model.S[i] * qd[i]
        v[i] = (xform_apply(X[i], v[p]) if p >= 0 else 0) + Sqd
        a[i] = xform_apply(X[i], a[p] if p >= 0 else a_base) + crm_apply(v[i], Sqd)
        if qdd is not None:
            a[i] = a[i] + model.S[i] * qdd[i]
        jax.debug.print("v[{i}] = " + fmt6, *v[i], i=i, ordered=True)
        jax.debug.print("a[{i}] = " + fmt6, *a[i], i=i, ordered=True)
    f = [None] * n
    for i in range(n):
        Iv = model.inertia[i] @ v[i]
        from ..ops.spatial import crf_apply
        f[i] = model.inertia[i] @ a[i] + crf_apply(v[i], Iv)
        jax.debug.print("f[{i}] = Ia + fxv(v,Iv) = " + fmt6, *f[i], i=i,
                        ordered=True)
    for i in range(n - 1, -1, -1):
        p = topo.parents[i]
        if p >= 0:
            f[p] = f[p] + xform_T_apply(X[i], f[i])
            jax.debug.print("f[{p}] += X^T f[{i}] = " + fmt6, *f[p], p=p, i=i,
                            ordered=True)
    c = jnp.stack([model.S[i] @ f[i] for i in range(n)])
    c = c + model.damping * qd
    jax.debug.print("c = " + " ".join(["{:+.6e}"] * n), *c, ordered=True)
    return c


_GRAD_STAGES = ("Iv", "Xv", "Xa", "SxXv", "SxXa", "Sxv", "Sxf",
                "dv_dq", "dv_dqd", "da_dq", "da_dqd",
                "df_dq_local", "df_dqd_local", "df_dq", "df_dqd")


def golden_rnea_grad_trace(desc: RobotDescription, q, qd, qdd=None,
                           gravity=-9.81, printer=print):
    """Stage-labelled golden ∂ID: every intermediate tensor of
    :meth:`GoldenDynamics.rnea_grad_inner` printed under labels that
    :func:`jax_rnea_grad_trace` reproduces — the ∂ID leg of the
    reference's DEBUG_MODE contract
    (``_inverse_dynamics_gradient.py:98-113`` emits stage printf blocks;
    ``_test.py:229-488`` prints the identical labels from NumPy).
    Returns the (dc_dq, dc_dqd) pair."""
    gold = GoldenDynamics(desc)
    out = gold.rnea_grad_inner(q, qd, qdd, gravity)
    n = desc.n
    for name in _GRAD_STAGES:
        for i in range(n):
            printer(f"{name}[{i}] = {_fmt_vec(out[name][i])}")
    printer(f"dc_dq = {_fmt_vec(out['dc_dq'])}")
    printer(f"dc_dqd = {_fmt_vec(out['dc_dqd'])}")
    return out["dc_dq"], out["dc_dqd"]


def jax_rnea_grad_trace(model: RobotModel, q, qd, qdd=None, gravity=-9.81):
    """Stage-labelled traced ∂ID: the same dense dataflow as
    :meth:`GoldenDynamics.rnea_grad_inner`, computed in jnp with
    ``jax.debug.print`` at every stage (fires inside jit, on TPU) under
    labels identical to :func:`golden_rnea_grad_trace` — diff the two
    stdout streams stage by stage when a fused ∂ID kernel diverges.
    Returns (dc_dq, dc_dqd)."""
    from ..ops.spatial import crf_apply
    from ..ops.spatial import crf as crf_m
    from ..ops.spatial import crm as crm_m

    topo = model.topology
    n = topo.n
    parents = topo.parents
    S = model.S
    X = model.joint_transforms(q)
    a_base = rnea_ops.gravity_accel(gravity, X.dtype)

    def show(name, i, val):
        cnt = int(np.prod(np.shape(val)))
        jax.debug.print(f"{name}[{i}] = " + " ".join(["{:+.6e}"] * cnt),
                        *jnp.ravel(val), ordered=True)

    # RNEA sweep (v, a; f accumulated through the backward pass — the
    # vaf state the reference's ∂ID inner consumes, SURVEY §3.4)
    v, a = [None] * n, [None] * n
    for i in range(n):
        p = parents[i]
        Sqd = S[i] * qd[i]
        v[i] = (xform_apply(X[i], v[p]) if p >= 0 else 0) + Sqd
        a[i] = (xform_apply(X[i], a[p] if p >= 0 else a_base)
                + crm_apply(v[i], Sqd))
        if qdd is not None:
            a[i] = a[i] + S[i] * qdd[i]
    f = [model.inertia[i] @ a[i]
         + crf_apply(v[i], model.inertia[i] @ v[i]) for i in range(n)]
    for i in range(n - 1, -1, -1):
        p = parents[i]
        if p >= 0:
            f[p] = f[p] + xform_T_apply(X[i], f[i])

    # temp comps + mx/fx column terms (golden.rnea_grad_inner order)
    Iv = [model.inertia[i] @ v[i] for i in range(n)]
    Xv = [xform_apply(X[i], v[parents[i]]) if parents[i] >= 0
          else jnp.zeros(6, X.dtype) for i in range(n)]
    Xa = [xform_apply(X[i], a[parents[i]] if parents[i] >= 0 else a_base)
          for i in range(n)]
    SxXv = [crm_m(S[i]) @ Xv[i] for i in range(n)]
    SxXa = [crm_m(S[i]) @ Xa[i] for i in range(n)]
    Sxv = [crm_m(S[i]) @ v[i] for i in range(n)]
    Sxf = [crf_m(S[i]) @ f[i] for i in range(n)]

    z = lambda: jnp.zeros((6, n), X.dtype)
    dv_dq, dv_dqd = [z() for _ in range(n)], [z() for _ in range(n)]
    for i in range(n):
        p = parents[i]
        if p >= 0:
            dv_dq[i] = X[i] @ dv_dq[p]
            dv_dqd[i] = X[i] @ dv_dqd[p]
            dv_dq[i] = dv_dq[i].at[:, i].add(-SxXv[i])
        dv_dqd[i] = dv_dqd[i].at[:, i].add(S[i])
    da_dq, da_dqd = [None] * n, [None] * n
    for i in range(n):
        cS = crm_m(S[i])
        da_dq[i] = (-cS @ dv_dq[i] * qd[i]).at[:, i].add(-SxXa[i])
        da_dqd[i] = (-cS @ dv_dqd[i] * qd[i]).at[:, i].add(-Sxv[i])
    for i in range(n):
        p = parents[i]
        if p >= 0:
            da_dq[i] = da_dq[i] + X[i] @ da_dq[p]
            da_dqd[i] = da_dqd[i] + X[i] @ da_dqd[p]
    df_dq, df_dqd = [None] * n, [None] * n
    for i in range(n):
        colsq = jnp.stack([crf_m(dv_dq[i][:, c]) @ Iv[i]
                           for c in range(n)], axis=1)
        colsd = jnp.stack([crf_m(dv_dqd[i][:, c]) @ Iv[i]
                           for c in range(n)], axis=1)
        FxvI = crf_m(v[i]) @ model.inertia[i]
        df_dq[i] = colsq + model.inertia[i] @ da_dq[i] + FxvI @ dv_dq[i]
        df_dqd[i] = colsd + model.inertia[i] @ da_dqd[i] + FxvI @ dv_dqd[i]
    df_dq_local = list(df_dq)
    df_dqd_local = list(df_dqd)
    for i in range(n - 1, -1, -1):
        p = parents[i]
        if p >= 0:
            df_dq[p] = df_dq[p] + X[i].T @ df_dq[i]
            df_dqd[p] = df_dqd[p] + X[i].T @ df_dqd[i]
            df_dq[p] = df_dq[p].at[:, i].add(X[i].T @ Sxf[i])
    dc_dq = jnp.stack([S[i] @ df_dq[i] for i in range(n)])
    dc_dqd = (jnp.stack([S[i] @ df_dqd[i] for i in range(n)])
              + jnp.diag(model.damping))

    stages = {"Iv": Iv, "Xv": Xv, "Xa": Xa, "SxXv": SxXv, "SxXa": SxXa,
              "Sxv": Sxv, "Sxf": Sxf, "dv_dq": dv_dq, "dv_dqd": dv_dqd,
              "da_dq": da_dq, "da_dqd": da_dqd,
              "df_dq_local": df_dq_local, "df_dqd_local": df_dqd_local,
              "df_dq": df_dq, "df_dqd": df_dqd}
    for name in _GRAD_STAGES:
        for i in range(n):
            show(name, i, stages[name][i])
    jax.debug.print("dc_dq = " + " ".join(["{:+.6e}"] * (n * n)),
                    *jnp.ravel(dc_dq), ordered=True)
    jax.debug.print("dc_dqd = " + " ".join(["{:+.6e}"] * (n * n)),
                    *jnp.ravel(dc_dqd), ordered=True)
    return dc_dq, dc_dqd


def golden_minv_trace(desc: RobotDescription, q, printer=print):
    """Stage-labelled golden M⁻¹ (U, D⁻¹ per joint + final rows — the
    reference's ``_direct_minv`` DEBUG stages)."""
    gold = GoldenDynamics(desc)
    n = desc.n
    X = gold.xmats(q)
    IA = gold.inertias.copy()
    U = np.zeros((n, 6))
    Dinv = np.zeros(n)
    for i in range(n - 1, -1, -1):
        U[i] = IA[i] @ gold.S[i]
        Dinv[i] = 1.0 / (gold.S[i] @ U[i])
        printer(f"U[{i}] = {_fmt_vec(U[i])}")
        printer(f"Dinv[{i}] = {_FMT.format(Dinv[i])}")
        p = desc.topology.parents[i]
        if p >= 0:
            Ia = IA[i] - np.outer(U[i], Dinv[i] * U[i])
            IA[p] += X[i].T @ Ia @ X[i]
    M = gold.minv(q, True)
    for i in range(n):
        printer(f"Minv[{i}] = {_fmt_vec(M[i])}")
    return M


def parity_report(desc: RobotDescription, model: RobotModel, q, qd, u,
                  gravity=-9.81, printer=print):
    """Structured parity summary (the framework's logging/observability
    story, SURVEY.md §5.5): per-algorithm error norms of the traced model
    against the float64 golden model for one state."""
    import gridcodegenerator_tpu as g

    gold = GoldenDynamics(desc)
    q64, qd64, u64 = (np.asarray(x, np.float64) for x in (q, qd, u))
    checks = {
        "inverse_dynamics": (
            np.asarray(g.bias_force(model, q, qd, gravity=gravity)),
            gold.rnea(q64, qd64, None, gravity)[0]),
        "direct_minv": (
            np.asarray(g.direct_minv(model, q)), gold.minv(q64, True)),
        "forward_dynamics": (
            np.asarray(g.forward_dynamics(model, q, qd, u, gravity=gravity)),
            gold.fd(q64, qd64, u64, gravity)),
        "forward_dynamics_gradient": (
            np.asarray(g.forward_dynamics_gradient(model, q, qd, u,
                                                   gravity=gravity)),
            gold.fd_grad(q64, qd64, u64, gravity)),
    }
    out = {}
    for name, (got, ref) in checks.items():
        scale = max(1.0, np.abs(ref).max())
        err = float(np.abs(got.astype(np.float64) - ref).max() / scale)
        out[name] = err
        printer(f"parity {name:28s} rel_err={err:.3e}")
    return out
