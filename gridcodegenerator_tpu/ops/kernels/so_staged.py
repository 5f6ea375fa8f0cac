"""Staged second-order (Hessian) pipeline for large robots.

The single-tile Hessian kernel (:mod:`.so_fused`) needs the whole
forward-over-analytic working set — primal gradient pipeline plus one
tangent sweep, ~34 n² floats/state — in VMEM, which caps it at n ≈ 12
even on the 128-state lane tier. Humanoids (Atlas n = 28 → 26.7 k
floats/state) previously fell back to the batch-last XLA path. This
module is the ∂ID-staged treatment (:mod:`.staged`) applied one rung up
(the reference stops at first order — ``/root/reference/algorithms/
_forward_dynamics_gradient.py``; second order extends its ladder, see
``ops/so.py``): the Hessian sweep splits into a sequence of small
kernels whose live sets are linear in n (or n·cb for the column-blocked
∂ID tangent), staging per-direction tangent tensors (dc, dv, da, df —
each the size of the primal quantity, with a leading direction axis)
through HBM, with the tangent **direction on the kernel grid** exactly
as in the single-tile kernel.

Two structural savings over the straight jacfwd formulation (both exact,
both from x = (q, q̇, u) entering q̈ = M⁻¹(q)·(u − c(q, q̇)) with
separated roles):

* **No u-direction sweeps.** q̈ is affine in u, so ∂²q̈/∂u∂u ≡ 0 and
  ∂²q̈/∂q̇∂u ≡ 0 (∂ID/∂q̇ is independent of q̈ because M depends on q
  only); the only nonzero u block is ∂²q̈/∂q∂u = ∂M⁻¹/∂q, whose
  λ-contraction is the ``dlamM`` vector the q-sweeps' mass-matrix
  tangent stage already produces. The u blocks are assembled, not swept.
* **Symmetry assembly.** H is symmetric in its two derivative indices,
  so the q-direction sweeps (which compute full 3n-rows) determine every
  (·, q) AND (q, ·) entry; the q̇-direction sweeps then only need the
  ∂c/∂q̇ side (the (q̇, q̇) block). 2n direction sweeps × at most 2
  sides replace the naive 3n × 2.

λ-contraction is pushed *through* the product rule so no (n, n)-sized
tangent ever stages: with lamM = M⁻¹λ (M symmetric),

    λᵀ·d(−M⁻¹ ∂c) = −(dM⁻¹ λ)ᵀ·∂c − lamMᵀ·d(∂c)
                  = −dlamMᵀ·∂c − lamMᵀ·d(∂c),
    dlamM = −M⁻¹·(dM·lamM),  dM from one CRBA JVP per q-direction.

The first term is an XLA einsum against the staged primal ∂c; the
second is the column-blocked tangent-∂ID kernel (T5) contracting in
VMEM. Per-direction staged tensors are O(n·B) (dc, dlamM, dq̈) and
O(6·n·B) (dv, da, df) — never O(n²·B).

Stage map (lane-tile kernels, direction innermost on the grid so each
128-state tile stays VMEM-resident across all its directions):

  primal   K1, K2′, K4, K5ᵏ      (c, v, M⁻¹, q̈, a, f, ∂c — :mod:`.staged`
                                  bodies, computed ONCE for all sweeps)
  T1       jvp of K1             → dc, dv            per direction
  T2 (q)   CRBA jvp + solves     → dlamM, dq̈        per q-direction
           (q̇-dirs: dq̈ = −M⁻¹·dc, an XLA batched matvec; dlamM ≡ 0)
  T4       jvp of K4             → da, df            per direction
  T5ᵏ      jvp of ∂ID cols ⊙ lamM → −lamMᵀ·d∂c[:, blkₖ] per direction

Batches beyond the api route chunk are ``lax.map``-chunked by the api
adapter (the staged tangent tensors are ~n_dirs× the primal staging).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...models.robot import RobotModel
from .. import blops
from .fused import _LANES, _MODEL_FIELDS, _kernel_model, _pallas_batch_call
from .staged import (_CAL, _LANE_BUDGET, _as_list, _plan, _split_cols,
                     bias_and_v_staged, minv_qdd_dense_staged)

# Working-set models (floats/state, lane tier) for the tangent stages:
# a jvp body carries the primal live set plus one tangent copy of it.
_WS_T1 = lambda n: 150.0 * n                       # 2× the K1 bias body
_WS_T2 = lambda n: 2.0 * n * n + 180.0 * n         # CRBA jvp + M⁻¹ input
_WS_T4 = lambda n: 170.0 * n                       # 2× the K4 vaf body
_WS_T5_BASE = lambda n: 130.0 * n                  # X/dX + vaf/dvaf + lamM
_WS_T5_SLOPE = lambda n: 38.0 * n                  # 2× the ∂ID column slope


def so_col_block(n: int) -> int:
    """Column-block width for the tangent-∂ID kernels (T5): the largest
    ``cb`` whose jvp working set fits the lane tile, preferring widths
    that divide n (uniform blocks = one compiled kernel shape; see
    ``staged._col_block``). 0 when not even cb=1 fits (T5 then runs as
    the XLA fallback)."""
    cb_max = int((_LANE_BUDGET / _CAL - _WS_T5_BASE(n)) // _WS_T5_SLOPE(n))
    if cb_max < 1:
        return 0
    cb_max = min(cb_max, n)
    divisors = [d for d in range(1, cb_max + 1) if n % d == 0]
    best = max(divisors) if divisors else 1
    return best if best * 2 > cb_max else cb_max


def _dir_stage_call(model: RobotModel, body, shared, per_dir, n_dirs,
                    out_shapes, per_state, interpret=False):
    """Direction-grid stage dispatcher: run
    ``body(km, d, *shared_tiles, *per_dir_tiles) -> tuple`` over grid
    (batch_tiles, n_dirs), directions innermost (the state tile stays
    VMEM-resident across its directions; only the per-direction tangent
    tiles re-stream). ``shared``: arrays (..., B) identical for every
    direction; ``per_dir``: arrays (n_dirs, ..., B) sliced at d. Returns
    arrays (n_dirs,) + out_shape + (B,).

    Lane-tile layout only (the staged Hessian targets robots past the
    2-D-tile regime); when the working set exceeds the lane budget the
    body runs as plain XLA, ``lax.map``-looped over directions (memory-
    safe sequential fallback, identical math)."""
    if interpret:
        lane = True
    else:
        _, lane = _plan(None, per_state)
    if not lane:
        def run_one(args):
            d, pd = args
            return tuple(body(model, d, *shared, *pd))
        return list(jax.lax.map(
            run_one, (jnp.arange(n_dirs), tuple(per_dir))))

    B = shared[0].shape[-1]
    pad = (-B) % _LANES
    if pad:
        shared = [jnp.pad(s, ((0, 0),) * (s.ndim - 1) + ((0, pad),))
                  for s in shared]
        per_dir = [jnp.pad(s, ((0, 0),) * (s.ndim - 1) + ((0, pad),))
                   for s in per_dir]
    Bp = B + pad
    grid = (Bp // _LANES, n_dirs)

    model_args = []
    for fname in _MODEL_FIELDS:
        arr = getattr(model, fname)
        if fname in ("damping", "armature"):
            model_args.append(arr[:, None])
        else:
            model_args.append(jnp.broadcast_to(
                arr[..., None], arr.shape + (_LANES,)))
    n_model = len(model_args)
    n_shared = len(shared)

    def kernel(*refs):
        mrefs = refs[:n_model]
        srefs = refs[n_model:n_model + n_shared]
        prefs = refs[n_model + n_shared:
                     n_model + n_shared + len(per_dir)]
        orefs = refs[n_model + n_shared + len(per_dir):]
        km = _kernel_model(model, mrefs)
        d = pl.program_id(1)
        outs = body(km, d, *[r[:] for r in srefs],
                    *[r[:][0] for r in prefs])
        for o_ref, o in zip(orefs, outs):
            o_ref[:] = o[None]

    in_specs = (
        [pl.BlockSpec(memory_space=pltpu.VMEM)] * n_model
        + [pl.BlockSpec(s.shape[:-1] + (_LANES,),
                        (lambda i, d, nd=s.ndim: (0,) * (nd - 1) + (i,)),
                        memory_space=pltpu.VMEM) for s in shared]
        + [pl.BlockSpec((1,) + s.shape[1:-1] + (_LANES,),
                        (lambda i, d, nd=s.ndim:
                         (d,) + (0,) * (nd - 2) + (i,)),
                        memory_space=pltpu.VMEM) for s in per_dir]
    )
    out_specs = [pl.BlockSpec(
        (1,) + shp + (_LANES,),
        (lambda i, d, nr=len(shp): (d,) + (0,) * nr + (i,)),
        memory_space=pltpu.VMEM) for shp in out_shapes]
    out_shape = [jax.ShapeDtypeStruct((n_dirs,) + shp + (Bp,),
                                      shared[0].dtype)
                 for shp in out_shapes]

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*model_args, *shared, *per_dir)
    if pad:
        outs = [o[..., :B] for o in outs]
    return list(outs)


def _one_hot(n, d, tile, dtype):
    iota = jax.lax.broadcasted_iota(jnp.int32, (n,) + tile, 0)
    return (iota == d).astype(dtype)


def _crba_matvecs(km, X, vecs):
    """(M·x for x in vecs) with M from the batch-last CRBA — contracting
    over the structurally nonzero (root-path) entries only."""
    M = blops.crba_bl(km, X)
    n = km.n
    outs = []
    for x in vecs:
        rows = []
        for i in range(n):
            acc = None
            for j in range(n):
                if M[i][j] is None:
                    continue
                t = M[i][j] * x[j:j + 1]
                acc = t if acc is None else acc + t
            rows.append(acc)
        outs.append(jnp.concatenate(rows, axis=0))
    return outs


def fd_hessian_vp_staged(model: RobotModel, q, qd, u, lam, gravity=-9.81,
                         cb=None, interpret=False):
    """Staged λᵀ·∂²q̈/∂x∂x for large robots: q/qd/u/lam (n, B) → (3n, 3n, B).

    See the module docstring for the stage map and the two structural
    savings (no u-sweeps; symmetry assembly). The ∂²/∂q̇∂u and ∂²/∂u∂u
    blocks are *exact* zeros here (they are analytically zero; the
    jacfwd-based paths carry only roundoff there), so cross-path
    equivalence tests must use tolerance-based comparison."""
    n = model.n
    cdt = q.dtype
    cb = cb or so_col_block(n)

    # ---- primal pipeline, computed once and shared by all sweeps ----
    c, v = bias_and_v_staged(model, q, qd, gravity, None, interpret)
    Minv, qdd = minv_qdd_dense_staged(model, q, u - c, interpret=interpret)

    def body_af(km, q, qd, qdd, v):
        X = blops.joint_transforms_bl(km, q)
        vl = _as_list(v.astype(cdt), km.n)
        _, a, f = blops.rnea_fwd_bl(km, X, qd, qdd, gravity, v_known=vl)
        _, f = blops.rnea_bwd_bl(km, X, f, None)
        return jnp.stack(a, axis=1), jnp.stack(f, axis=1)

    k1_blk, k1_lane = _plan(None, 70.0 * n)
    a, f = _pallas_batch_call(model, body_af, [q, qd, qdd, v],
                              [(6, n)] * 2, k1_blk, interpret,
                              lane_tile=k1_lane)

    # primal ∂c (both sides) for the −dlamMᵀ·∂c product-rule term,
    # from the staged v/a/f (no K1 recompute as in id_grad_staged)
    k5p_blk, k5p_lane = _plan(None, 60.0 * n + 19.0 * n * max(1, cb))
    dc_p = {"q": [], "qd": []}
    for side in ("q", "qd"):
        for c0, w in _split_cols(None, n, max(1, cb)):
            def body_cols(km, q, qd, v, a, f, c0=c0, w=w, side=side):
                X = blops.joint_transforms_bl(km, q)
                vl, al, fl = (_as_list(t, km.n) for t in (v, a, f))
                dc = blops.rnea_grad_cols_bl(km, X, qd, vl, al, fl,
                                             gravity, c0=c0, cb=w,
                                             sides=(side,))
                return (dc[side],)
            (blk,) = _pallas_batch_call(model, body_cols, [q, qd, v, a, f],
                                        [(n, w)], k5p_blk, interpret,
                                        lane_tile=k5p_lane)
            dc_p[side].append(blk)
    dcq_p = jnp.concatenate(dc_p["q"], axis=1)       # (n, n, B)
    dcqd_p = jnp.concatenate(dc_p["qd"], axis=1)

    lamM = blops.matvecN(Minv, lam)                  # (n, B)

    # ---- tangent stage bodies (which: 0 = q-directions, 1 = q̇) ----
    def t1_body(km, d, q, qd, *, which):
        e = _one_hot(km.n, d, q.shape[1:], q.dtype)

        def cv(z):
            q_, qd_ = (z, qd) if which == 0 else (q, z)
            X = blops.joint_transforms_bl(km, q_)
            vv, _, f0 = blops.rnea_fwd_bl(km, X, qd_, None, gravity)
            cc, _ = blops.rnea_bwd_bl(km, X, f0, qd_)
            return cc, jnp.stack(vv, axis=1)

        _, (dc, dv) = jax.jvp(cv, ((q, qd)[which],), (e,))
        return dc, dv

    def t2_body(km, d, q, lamM, qdd, Minv, dc):
        e = _one_hot(km.n, d, q.shape[1:], q.dtype)

        def mv(q_):
            X = blops.joint_transforms_bl(km, q_)
            return tuple(_crba_matvecs(km, X, (lamM, qdd)))

        _, (dMlam, dMq) = jax.jvp(mv, (q,), (e,))
        dlamM = -blops.matvecN(Minv, dMlam)
        dqdd = -blops.matvecN(Minv, dMq + dc)
        return dlamM, dqdd

    def t4_body(km, d, q, qd, v, qdd, dv, dqdd, *, which):
        e = _one_hot(km.n, d, q.shape[1:], q.dtype)

        def af(z, qdd_, v_):
            q_, qd_ = (z, qd) if which == 0 else (q, z)
            X = blops.joint_transforms_bl(km, q_)
            vl = _as_list(v_, km.n)
            _, aa, ff = blops.rnea_fwd_bl(km, X, qd_, qdd_, gravity,
                                          v_known=vl)
            _, ff = blops.rnea_bwd_bl(km, X, ff, None)
            return jnp.stack(aa, axis=1), jnp.stack(ff, axis=1)

        _, (da, df) = jax.jvp(af, ((q, qd)[which], qdd, v), (e, dqdd, dv))
        return da, df

    def t5_body(km, d, q, qd, v, a, f, lamM, dv, da, df, *, which, side,
                c0, w):
        e = _one_hot(km.n, d, q.shape[1:], q.dtype)

        def rowblk(z, v_, a_, f_):
            q_, qd_ = (z, qd) if which == 0 else (q, z)
            X = blops.joint_transforms_bl(km, q_)
            vl, al, fl = (_as_list(t, km.n) for t in (v_, a_, f_))
            rows = blops.rnea_grad_cols_bl(
                km, X, qd_, vl, al, fl, gravity, c0=c0, cb=w,
                sides=(side,), as_rows=True)[side]
            acc = None
            for i, r in enumerate(rows):
                if r is None:
                    continue
                t = lamM[i:i + 1] * r
                acc = t if acc is None else acc + t
            return acc                                   # (w, *tile)

        _, drow = jax.jvp(rowblk, ((q, qd)[which], v, a, f),
                          (e, dv, da, df))
        return (-drow,)

    def t5_sweep(side, which, dv_t, da_t, df_t):
        blks = []
        for c0, w in _split_cols(None, n, max(1, cb)):
            (o,) = _dir_stage_call(
                model,
                (lambda km, d, q, qd, v, a, f, lamM, dv, da, df,
                 _s=side, _w=which, _c0=c0, _cb=w:
                 t5_body(km, d, q, qd, v, a, f, lamM, dv, da, df,
                         which=_w, side=_s, c0=_c0, w=_cb)),
                [q, qd, v, a, f, lamM], [dv_t, da_t, df_t], n, [(w,)],
                _WS_T5_BASE(n) + _WS_T5_SLOPE(n) * w, interpret)
            blks.append(o)
        return jnp.concatenate(blks, axis=1)             # (n_dirs, n, B)

    # ---- q-direction sweeps (full 3n rows per direction) ----
    dc_q, dv_q = _dir_stage_call(
        model, (lambda km, d, q, qd: t1_body(km, d, q, qd, which=0)),
        [q, qd], [], n, [(n,), (6, n)], _WS_T1(n), interpret)
    dlamM, dqdd_q = _dir_stage_call(
        model, t2_body, [q, lamM, qdd, Minv], [dc_q], n, [(n,), (n,)],
        _WS_T2(n), interpret)
    da_q, df_q = _dir_stage_call(
        model,
        (lambda km, d, q, qd, v, qdd, dv, dqdd:
         t4_body(km, d, q, qd, v, qdd, dv, dqdd, which=0)),
        [q, qd, v, qdd], [dv_q, dqdd_q], n, [(6, n)] * 2, _WS_T4(n),
        interpret)
    Aq = t5_sweep("q", 0, dv_q, da_q, df_q)
    Aqd = t5_sweep("qd", 0, dv_q, da_q, df_q)
    # product rule: λᵀ·d(−M⁻¹∂c) also carries −dlamMᵀ·∂c (XLA einsum
    # against the staged primal ∂c — n³·B FMAs/side, bandwidth-trivial).
    # HIGHEST: the default MXU f32 matmul truncates inputs to bf16 —
    # measured 1.2e-2 relative error on the Atlas hardware tier vs the
    # ~1e-4 f32 pipeline floor (same failure mode as the terrain gather,
    # contact_fused.py).
    hi = jax.lax.Precision.HIGHEST
    tq = -jnp.einsum("dib,ijb->djb", dlamM, dcq_p, precision=hi)
    tqd = -jnp.einsum("dib,ijb->djb", dlamM, dcqd_p, precision=hi)
    # column d of H for d ∈ q-block, all 3n rows (j-major after swap)
    Cq = jnp.concatenate([Aq + tq, Aqd + tqd, dlamM], axis=1)
    Hq = jnp.swapaxes(Cq, 0, 1)                          # (3n, n, B)

    # ---- q̇-direction sweeps ((q̇, q̇) block only — the (q, q̇) and
    # (u, q̇) blocks come from Hq by symmetry) ----
    dc_d, dv_d = _dir_stage_call(
        model, (lambda km, d, q, qd: t1_body(km, d, q, qd, which=1)),
        [q, qd], [], n, [(n,), (6, n)], _WS_T1(n), interpret)
    # dM/∂q̇ ≡ 0: dq̈ = −M⁻¹·dc, a batched XLA matvec per direction
    # (HIGHEST — see the product-rule einsums above)
    dqdd_d = -jnp.einsum("ijb,djb->dib", Minv, dc_d,
                         precision=jax.lax.Precision.HIGHEST)
    da_d, df_d = _dir_stage_call(
        model,
        (lambda km, d, q, qd, v, qdd, dv, dqdd:
         t4_body(km, d, q, qd, v, qdd, dv, dqdd, which=1)),
        [q, qd, v, qdd], [dv_d, dqdd_d], n, [(6, n)] * 2, _WS_T4(n),
        interpret)
    Hqd_qd = jnp.swapaxes(t5_sweep("qd", 1, dv_d, da_d, df_d), 0, 1)

    # ---- assembly: H[a,b] = H[b,a]; u-affine ⇒ (q̇,u) = (u,u) = 0 ----
    z = jnp.zeros((n, n) + q.shape[1:], cdt)
    col_qd = jnp.concatenate(
        [jnp.swapaxes(Hq[n:2 * n], 0, 1), Hqd_qd, z], axis=0)
    col_u = jnp.concatenate(
        [jnp.swapaxes(Hq[2 * n:], 0, 1), z, z], axis=0)
    return jnp.concatenate([Hq, col_qd, col_u], axis=1)  # (3n, 3n, B)
