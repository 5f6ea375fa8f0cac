"""Staged multi-kernel pipeline for LARGE multi-dof robots (humanoid
free-flyer scale: Atlas + floating base is n=29 joints, nv=34).

The fused single-tile gradient kernels (:mod:`.multidof_fused`) hold the
full per-joint DV/DA/DF derivative worksets (≈ 18·n·nv floats/state) in
VMEM and gate out beyond nv ≈ 20 (``md_grad_workset_ok``); past the gate
the batched entries previously fell back to one giant plain-XLA program —
the compile-time blowup class that blocked the round-2 ground stepper.
This module is the generalized-coordinate counterpart of the fixed-base
staged pipeline (:mod:`.staged`) and of the reference's packed
ancestor/subtree column compression
(``/root/reference/algorithms/_inverse_dynamics_gradient.py:55-96``):
the tangent-space ∂ID propagation is split into column blocks of ``cb``
differentiation directions so each kernel's live set is ∝ n·cb, with only
small per-state tensors staged through HBM:

  FD    q,q̇,u     → q̈                (existing fused FD kernel)
  K1md  q,q̇,(q̈)  → v, a, f_acc      (vaf at the true accelerations)
  K2md  q          → M⁻¹              (CRBA + multi-rhs Cholesky vs I)
  K5md^k q,q̇,v,a,f(,M⁻¹) → block     (column-blocked tangent-space ∂ID;
                                       with M⁻¹ the −M⁻¹·∂c finish is
                                       fused and the ∂c block never
                                       round-trips HBM)

∂q̈/∂u = M⁻¹ falls out of K2md directly. The K5md body is the wide
column-tensor form (``multidof_fused._md_id_grad_cols_wide`` — one
(6, cb, B) tensor per joint, shared with the single-tile kernels), so
interpret-mode equivalence tests cover this path on CPU. Equivalence:
tests/test_multidof_fused.py (staged vs fused vs per-state analytic
gradients).
"""

from __future__ import annotations

import jax.numpy as jnp

from . import multidof_fused as mf
# _MERGE_BASE: merged-body base multiplier, hardware-calibrated — see
# its definition in .staged (two gate models OOM'd on real silicon
# before it). With it, _side_plan's launch-count comparison auto-rejects
# merging at humanoid scale while still allowing it on robots where the
# merged body genuinely fits.
from .staged import _CAL, _LANE_BUDGET, _MERGE_BASE

__all__ = ["md_id_grad_staged", "md_fd_grad_staged", "md_staged_ok",
           "md_col_block"]


# Analytic live-set models (floats/state) for the staged kernel bodies,
# calibrated by the same Mosaic stack factor as the fixed-base pipeline.
def _vaf_ws(n: int) -> float:
    return 90.0 * n + 200.0


def _minv_ws(n: int, nv: int) -> float:
    # X + IC (72n) + M/L/eye/y/x (≈5 nv² live across the multi-rhs solve)
    return 72.0 * n + 5.0 * nv * nv + 200.0


def _k5_ws(n: int, nv: int, cb: int, fused: bool,
           n_sides: int = 1) -> float:
    base = 54.0 * n + 200.0 + (float(nv * nv) if fused else 0.0)
    if n_sides > 1:
        base *= _MERGE_BASE
    return base + n_sides * (18.0 * n + 2.0 * nv) * cb


def md_col_block(n: int, nv: int, fused: bool = True,
                 n_sides: int = 1) -> int:
    """Largest K5md column-block width that fits a 128-state lane tile
    (the 2-D ≥1024-state tier is out of reach for these bodies). Returns
    0 when even cb=1 does not fit. ``n_sides=2`` sizes the merged
    both-sides launch (∂/∂q and ∂/∂q̇ from one kernel) with the
    hardware-calibrated merged-base multiplier (see ``_MERGE_BASE``)."""
    budget = _LANE_BUDGET / _CAL
    base = 54.0 * n + 200.0 + (float(nv * nv) if fused else 0.0)
    if n_sides > 1:
        base *= _MERGE_BASE
    slope = n_sides * (18.0 * n + 2.0 * nv)
    cb = int((budget - base) // slope)
    if cb < 1:
        return 0
    return min(cb, nv)


def _split_cols(nv: int, cb: int):
    """Equal-ish column blocks (at most two distinct widths — a ragged
    tiny tail block is both a wasted launch and the shape class that once
    crashed Mosaic, see ``staged._col_block``)."""
    nb = -(-nv // cb)
    base, rem = divmod(nv, nb)
    out, c0 = [], 0
    for k in range(nb):
        w = base + (1 if k < rem else 0)
        out.append((c0, w))
        c0 += w
    return out


def md_staged_ok(n: int, nv: int) -> bool:
    """True when every stage of the staged gradient pipeline fits a lane
    tile (FD solve, vaf, M⁻¹, and at least a width-1 fused K5 block)."""
    return (mf.md_workset_ok(n, nv)
            and _vaf_ws(n) * _CAL <= _LANE_BUDGET
            and (_minv_ws(n, nv) + 18.0 * n) * _CAL <= _LANE_BUDGET
            and md_col_block(n, nv, fused=True) > 0)


def md_vaf_staged(model, q, qd, qdd, gravity=-9.81, interpret=False,
                  force_xla=False):
    """K1md: v, a, f_acc, each (6, n, B), at the given accelerations."""
    n = model.n_joints
    grav = float(gravity)

    def body(km, q, qd, *rest):
        X = mf._md_transforms_s(km, q)
        v, a, f = mf._md_vaf_s(km, X, qd, rest[0] if rest else None, grav)
        return (jnp.stack(v, axis=1), jnp.stack(a, axis=1),
                jnp.stack(f, axis=1))

    states = [q, qd] + ([] if qdd is None else [qdd])
    return mf._run_md(model, body, states, [(6, n)] * 3, interpret,
                      force_xla,
                      gate=lambda n_, nv_: _vaf_ws(n_) * _CAL <= _LANE_BUDGET)


def md_minv_fused(model, q, interpret=False, force_xla=False):
    """K2md: dense M⁻¹ (nv, nv, B) — CRBA + one multi-rhs Cholesky solve
    against I in a single kernel. Row r of the output is M⁻¹[r, :]
    (= M⁻¹[:, r]; M⁻¹ is symmetric)."""
    nv = model.nv

    def body(km, q):
        from .contact_fused import _chol_factor_act, _chol_minv_sym

        X = mf._md_transforms_s(km, q)
        M = mf._md_crba_s(km, X)
        # active-region factor (nv³/6 wide flops) + symmetric L⁻ᵀ·L⁻¹
        # inverse (nv³/3) — 3× fewer wide flops than the full-width
        # factor + multi-rhs solve against I
        return (_chol_minv_sym(_chol_factor_act(M, nv), nv),)

    (Minv,) = mf._run_md(
        model, body, [q], [(nv, nv)], interpret, force_xla,
        gate=lambda n_, nv_: _minv_ws(n_, nv_) * _CAL <= _LANE_BUDGET)
    return Minv


def md_minv_qdd_fused(model, q, qd, u, gravity=-9.81, interpret=False,
                      force_xla=False):
    """K2md+FD merged: ONE kernel computes X, the bias c, CRBA M, the
    column Cholesky, dense M⁻¹ (wide multi-rhs solve vs I) AND
    q̈ = M⁻¹(u − c) — the staged ∇FD previously launched a separate FD
    kernel that recomputed X/CRBA/factor just for q̈. Returns
    (M⁻¹ (nv,nv,B), q̈ (nv,B))."""
    nv = model.nv
    grav = float(gravity)

    def body(km, q, qd, u):
        from .contact_fused import _chol_factor_act, _chol_minv_sym

        X = mf._md_transforms_s(km, q)
        c, *_ = mf._md_rnea_s(km, X, qd, None, grav)
        M = mf._md_crba_s(km, X)
        # active-region factor + symmetric inverse: 3× fewer wide flops
        # than the full-width factor + solve against I (see md_minv_fused)
        Minv = _chol_minv_sym(_chol_factor_act(M, nv), nv)
        rhs = u - c
        qdd = sum(Minv[:, j] * rhs[j:j + 1] for j in range(nv))
        return Minv, qdd

    # gate: K2md's live-set model plus the small extras that survive into
    # the solve phase (c, rhs, q̈ ≈ 3nv + the (6,B) vaf lists are freed
    # before the nv² solve peak — same liveness argument as the contact
    # kernels' staged phases). At n=29/nv=34 this must stay under budget:
    # failing the gate silently routes to the giant-XLA fallback, which
    # measured 13× slower end-to-end.
    return mf._run_md(
        model, body, [q, qd, u], [(nv, nv), (nv,)], interpret, force_xla,
        gate=lambda n_, nv_: (
            (_minv_ws(n_, nv_) + 18.0 * n_) * _CAL <= _LANE_BUDGET))


def _grad_blocks(model, q, qd, v, a, f, Minv, sides, gravity, cb, interpret,
                 force_xla, wide=True):
    """K5md launches; returns per side the concatenated (nv, nv, B)
    result (−M⁻¹·∂c when ``Minv`` is given, raw ∂c otherwise). With
    ``sides=("q", "qd")`` each launch emits BOTH sides of its column
    block — the sides share the launch's X transforms and its q/q̇/vaf
    (18n floats/state) and M⁻¹ (nv² floats/state) HBM reads, halving
    the K5 launch count. ``wide`` selects the (6, cb, B) column-tensor
    body (default — ~cb× fewer instructions at the same flops);
    ``wide=False`` keeps the per-column-list body for equivalence
    testing."""
    n, nv = model.n_joints, model.nv
    grav = float(gravity)
    fused = Minv is not None
    ns = len(sides)
    blocks = [[] for _ in sides]
    for c0, w in _split_cols(nv, cb):
        def body(km, q, qd, v, a, f, *rest, c0=c0, w=w):
            nj = km.topology.n
            vaf = tuple([t[:, i] for i in range(nj)] for t in (v, a, f))
            if wide:
                return mf._md_id_grad_cols_wide(
                    km, q, qd, *vaf, gravity=grav, c0=c0, cb=w,
                    minv=rest[0] if rest else None, sides=sides)
            return mf._md_id_grad_body(
                km, q, qd, None, gravity=grav, cols=(c0, w), vaf=vaf,
                minv=rest[0] if rest else None, sides=sides)

        states = [q, qd, v, a, f] + ([Minv] if fused else [])
        blks = mf._run_md(
            model, body, states, [(nv, w)] * ns, interpret, force_xla,
            gate=lambda n_, nv_, w=w: (
                _k5_ws(n_, nv_, w, fused, ns) * _CAL <= _LANE_BUDGET))
        for s, blk in enumerate(blks):
            blocks[s].append(blk)
    return tuple(jnp.concatenate(bs, axis=1) for bs in blocks)


def _side_plan(n, nv, fused, cb, merge_sides):
    """Resolve (cb, launch plan): one both-sides launch per block when
    the merged workspace fits AND strictly reduces the launch count
    (merging halves the shared-base traffic per column-side, but each
    side still pays its full per-column workset — see :func:`_k5_ws` —
    so the merged block width is ~half the per-side width and the win
    is only the shared X/vaf/M⁻¹ reads). Else per-side launches."""
    cb1 = cb or md_col_block(n, nv, fused=fused)
    if merge_sides:
        cbm = cb or md_col_block(n, nv, fused=fused, n_sides=2)
        if (cbm >= 1
                and _k5_ws(n, nv, cbm, fused, 2) * _CAL <= _LANE_BUDGET
                and (cb is not None
                     or cb1 < 1 or -(-nv // cbm) < 2 * -(-nv // cb1))):
            return cbm, (("q", "qd"),)
    return cb1, (("q",), ("qd",))


def md_id_grad_staged(model, q, qd, qdd=None, gravity=-9.81, cb=None,
                      interpret=False, force_xla=False, wide=True,
                      merge_sides=True):
    """Staged tangent-space ∂ID for large-nv robots: q (nq,B), qd/qdd
    (nv,B) → (∂τ/∂δq, ∂τ/∂q̇), each (nv, nv, B). Large-robot counterpart
    of :func:`.multidof_fused.md_id_grad_fused`. Both sides of each
    column block come from ONE launch by default (``merge_sides``);
    ``merge_sides=False`` keeps the per-side launches for A/B."""
    n, nv = model.n_joints, model.nv
    cb, plan = _side_plan(n, nv, False, cb, merge_sides)
    if cb <= 0:
        raise ValueError(
            f"md_id_grad_staged: no VMEM-valid column block for "
            f"n={n}, nv={nv}")
    v, a, f = md_vaf_staged(model, q, qd, qdd, gravity, interpret, force_xla)
    out = []
    for sides in plan:
        out.extend(_grad_blocks(model, q, qd, v, a, f, None, sides, gravity,
                                cb, interpret, force_xla, wide=wide))
    return tuple(out)


def md_fd_grad_staged(model, q, qd, u, gravity=-9.81, cb=None,
                      interpret=False, force_xla=False, wide=True,
                      merge_sides=True):
    """Staged tangent-space ∇FD for large-nv robots: (∂q̈/∂δq, ∂q̈/∂q̇,
    ∂q̈/∂u), each (nv, nv, B). The −M⁻¹·∂c finish is fused into the K5md
    blocks (M⁻¹ re-read per launch, ∂c never staged); ∂q̈/∂u = M⁻¹ comes
    straight from K2md. Both sides of each column block come from ONE
    launch by default (``merge_sides``)."""
    n, nv = model.n_joints, model.nv
    cb, plan = _side_plan(n, nv, True, cb, merge_sides)
    if cb <= 0:
        raise ValueError(
            f"md_fd_grad_staged: no VMEM-valid column block for "
            f"n={n}, nv={nv}")
    Minv, qdd = md_minv_qdd_fused(model, q, qd, u, gravity, interpret,
                                  force_xla)
    v, a, f = md_vaf_staged(model, q, qd, qdd, gravity, interpret, force_xla)
    out = []
    for sides in plan:
        out.extend(_grad_blocks(model, q, qd, v, a, f, Minv, sides, gravity,
                                cb, interpret, force_xla, wide=wide))
    return out[0], out[1], Minv
