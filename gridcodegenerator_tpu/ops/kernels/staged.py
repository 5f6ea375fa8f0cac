"""Staged multi-kernel pipeline for large robots (Atlas-scale, n ≳ 15).

The single-tile fused kernels (:mod:`.fused`) require the whole algorithm
working set to fit VMEM at the minimum (8, 128)-register batch tile of 1024
states; for ∇FD that is ~16.6·n² floats/state — impossible beyond n≈14 on a
16 MB core. The reference hits the same wall in CUDA shared memory and solves
it with packed ancestor/subtree column compression
(``/root/reference/algorithms/_inverse_dynamics_gradient.py:1-4,55-96``).
The TPU-native counterpart implemented here splits the pipeline into a
sequence of kernels whose live sets are column-blocked (working set ∝ n·cb,
not n²), staging only small per-state tensors (c, v, a, f, U, D⁻¹, M⁻¹ rows,
∂c blocks) through HBM and *recomputing X(q) in-kernel* (36n floats of VMEM
vs. 36n·B of HBM traffic per launch — flops are cheaper than bandwidth):

  K1  q,q̇      → c, v            (bias RNEA; v is q̈-independent)
  K2  q         → U, D⁻¹          (articulated-body backward sweep)
  K3ᵏ q,U,D⁻¹   → M⁻¹[:, blkₖ]    (column-blocked F/row recursions)
      XLA: densify M⁻¹, q̈ = M⁻¹(u − c)   (tiny batched matmul)
  K4  q,q̇,q̈,v  → a, f            (vaf at the true q̈, v reused)
  K5ˢᵏ q,q̇,v,a,f → ∂c_s[:, blkₖ]  (column-blocked ∂ID, per side s)
      XLA: ∂q̈ = −M⁻¹ · ∂c        (batched matmul)

Every kernel body reuses the same :mod:`..blops` functions the single-tile
kernels use, so interpret-mode equivalence tests cover this path on CPU.
"""

from __future__ import annotations

import jax.numpy as jnp

from ...models.robot import RobotModel
from .. import blops
from .fused import _pallas_batch_call

# Hardware-calibrated Mosaic scoped-VMEM stack factor over the analytic
# live-set models (v5e, 2026-08-16): the K5 ∂ID block body (3.3 k modeled
# floats/state) OOM'd a 1024-state 2-D tile at 21.45 MB → real/modeled ≈ 1.6×
# there, and the n=28 single-kernel ∇FD body measured 3.1×. Use the larger
# factor everywhere — the cost of conservatism is only which tile tier a
# kernel lands on, never correctness.
_CAL = 3.1
# floats/state on a 128-state lane tile: 16 MB/128/4 B = 32.8 k raw; the
# largest body PROVEN to compile on hardware sat at 27.8 k estimated-real
# (n=28 FD), so gate at 28 k rather than the raw ceiling
_LANE_BUDGET = 28_000.0
_2D_BUDGET = 3_400_000.0   # floats/tile on (8·k, 128) tiles (≥1024 states)


def _tile_plan(per_state: float):
    """(block_b, lane_tile) for a kernel body of ``per_state`` modeled
    floats/state: a ≥1024-state 2-D tile when the calibrated working set
    allows it, else the 128-state lane tile (8× smaller minimum), else the
    plain-XLA fallback (block_b=None, lane_tile=False)."""
    need = per_state * _CAL
    blk = int(_2D_BUDGET // need) // 1024 * 1024
    if blk >= 1024:
        return min(blk, 2048), False
    if need <= _LANE_BUDGET:
        return None, True
    return None, False


def _col_block(n: int, extra: float = 0.0) -> int:
    """Largest ∂ID column-block width whose K5 working set
    (≈ 60n + 19n·cb + extra·(1 + cb/n)… floats/state) fits the best
    available tile tier. ``extra`` adds a cb-independent term to the live
    set (the fused −M⁻¹·∂c finish holds the (n,n) M⁻¹ tile in VMEM: pass
    extra = n² + n·cb ≈ handled by the +2n·cb slope below).

    Prefers a block width that divides n evenly: uniform blocks mean ONE
    compiled kernel shape instead of a ragged tail (v5e 2026-08-16: a
    width-2 tail block after two width-13 blocks crashed the Mosaic
    compiler with ``Check failed: limits[i] <= dim(i) (2 vs. 1)``; uniform
    widths also reuse layouts better). Falls back to the ragged maximum
    only when the best divisor would waste more than half the budget."""
    slope = 19.0 * n + (2.0 * n if extra else 0.0)
    cb_2d = int((_2D_BUDGET / 1024 / _CAL - 60.0 * n - extra) // slope)
    cb_max = cb_2d if cb_2d >= 1 else int(
        (_LANE_BUDGET / _CAL - 60.0 * n - extra) // slope)
    if extra and cb_max < 1:
        return 0          # no valid fused-finish tile: caller falls back
    cb_max = max(1, min(cb_max, n))
    divisors = [d for d in range(1, cb_max + 1) if n % d == 0]
    best = max(divisors) if divisors else 1
    return best if best * 2 > cb_max else cb_max


def _split_cols(arr_axis1_n, n, cb):
    return [(c0, min(cb, n - c0)) for c0 in range(0, n, cb)]


def _as_list(stacked, n):
    """(6, n, *B) staged tensor → per-joint list of (6, *B) (kernel-body
    form). Static basic-indexing slices only — no gathers (Mosaic-safe)."""
    return [stacked[:, i] for i in range(n)]


def _plan(block_b, per_state):
    """Explicit ``block_b`` (tests) keeps the 2-D path; otherwise the
    calibrated tier planner decides."""
    if block_b is not None:
        return block_b, False
    return _tile_plan(per_state)


def bias_and_v_staged(model: RobotModel, q, qd, gravity, block_b, interpret):
    """K1: c (n, B) and v (6, n, B)."""
    def body(km, q, qd):
        X = blops.joint_transforms_bl(km, q)
        v, a0, f0 = blops.rnea_fwd_bl(km, X, qd, None, gravity)
        c, _ = blops.rnea_bwd_bl(km, X, f0, qd)
        return c, jnp.stack(v, axis=1)

    n = model.n
    blk, lane = _plan(block_b, 70.0 * n)
    return _pallas_batch_call(model, body, [q, qd], [(n,), (6, n)],
                              blk, interpret, lane_tile=lane)


def minv_staged(model: RobotModel, q, block_b=None, cb=None, interpret=False):
    """Staged analytic M⁻¹ for large robots: q (n,B) → dense (n,n,B).
    K2 (U, D⁻¹) + column-blocked K3 launches + XLA densify."""
    n = model.n
    cb = cb or _col_block(n)
    k2_block, k2_lane = _plan(block_b, 90.0 * n)
    k3_block, k3_lane = _plan(block_b, 45.0 * n + 7.0 * n * cb)

    def body_ud(km, q):
        X = blops.joint_transforms_bl(km, q)
        U, Dinv = blops.minv_UD_bl(km, X)
        return jnp.stack(U, axis=1), jnp.concatenate(Dinv, axis=0)

    U, Dinv = _pallas_batch_call(model, body_ud, [q], [(6, n), (n,)],
                                 k2_block, interpret, lane_tile=k2_lane)

    blocks = []
    for c0, w in _split_cols(None, n, cb):
        def body_cols(km, q, U, Dinv, c0=c0, w=w):
            X = blops.joint_transforms_bl(km, q)
            Ul = _as_list(U, km.n)
            Dl = [Dinv[i:i + 1] for i in range(km.n)]
            return (blops.minv_cols_bl(km, X, Ul, Dl, c0, w),)

        (blk,) = _pallas_batch_call(model, body_cols, [q, U, Dinv],
                                    [(n, w)], k3_block, interpret,
                                    lane_tile=k3_lane)
        blocks.append(blk)
    upper = jnp.concatenate(blocks, axis=1)          # (n, n, B) upper-tri
    return blops.densify_rows([upper[i] for i in range(n)])


def fd_staged(model: RobotModel, q, qd, u, gravity=-9.81, block_b=None,
              interpret=False):
    """Staged forward dynamics for large robots: q̈ (n, B)."""
    c, _ = bias_and_v_staged(model, q, qd, gravity, block_b, interpret)
    Minv = minv_staged(model, q, block_b=block_b, interpret=interpret)
    return blops.matvecN(Minv, u - c)


def id_grad_staged(model: RobotModel, q, qd, qdd, gravity=-9.81,
                   block_b=None, cb=None, interpret=False, stage_dtype=None):
    """Staged ∂ID for large robots: (dc_dq, dc_dqd), each (n, n, B).

    ``stage_dtype`` (e.g. ``jnp.bfloat16``) stores the inter-kernel HBM
    tensors (v, a, f) at reduced precision — each K5 launch then reads
    half the bytes and upcasts in VMEM. Compute stays in ``q.dtype``.
    Parity cost is ~bf16 roundoff on the gradient (measured in
    BENCHLOG.md); default ``None`` keeps full precision."""
    n = model.n
    cb = cb or _col_block(n)
    k1_block, k1_lane = _plan(block_b, 70.0 * n)
    k5_block, k5_lane = _plan(block_b, 60.0 * n + 19.0 * n * cb)
    cdt = q.dtype

    def body_vaf(km, q, qd, qdd):
        X = blops.joint_transforms_bl(km, q)
        v, a, f = blops.rnea_fwd_bl(km, X, qd, qdd, gravity)
        _, f = blops.rnea_bwd_bl(km, X, f, None)
        return jnp.stack(v, axis=1), jnp.stack(a, axis=1), jnp.stack(f, axis=1)

    v, a, f = _pallas_batch_call(model, body_vaf, [q, qd, qdd],
                                 [(6, n)] * 3, k1_block, interpret,
                                 lane_tile=k1_lane)
    if stage_dtype is not None:
        v, a, f = (t.astype(stage_dtype) for t in (v, a, f))

    sides = {}
    for side in ("q", "qd"):
        blocks = []
        for c0, w in _split_cols(None, n, cb):
            def body_grad(km, q, qd, v, a, f, c0=c0, w=w, side=side):
                X = blops.joint_transforms_bl(km, q)
                vl, al, fl = (_as_list(t.astype(cdt), km.n)
                              for t in (v, a, f))
                dc = blops.rnea_grad_cols_bl(km, X, qd, vl, al, fl, gravity,
                                             c0=c0, cb=w, sides=(side,))
                return (dc[side],)

            (blk,) = _pallas_batch_call(model, body_grad, [q, qd, v, a, f],
                                        [(n, w)], k5_block, interpret,
                                        lane_tile=k5_lane)
            blocks.append(blk)
        sides[side] = jnp.concatenate(blocks, axis=1)
    return sides["q"], sides["qd"]


def fd_grad_staged(model: RobotModel, q, qd, u, gravity=-9.81, block_b=None,
                   cb=None, interpret=False, fuse_finish=None,
                   stage_dtype=None):
    """Staged ∇FD — the large-robot counterpart of
    :func:`..kernels.fused.fd_grad_fused`: returns (ddq, ddqd), each (n,n,B).

    Same dataflow as the single-tile kernel (X shared, v reused across the
    two RNEA sweeps, sides processed sequentially); the ∂-tensors never
    materialize wider than ``cb`` columns in VMEM.

    By default (``fuse_finish=None`` → auto) the −M⁻¹·∂c finish is fused
    into the K5 blocks: each launch takes the staged M⁻¹ as an extra VMEM
    input and contracts −M⁻¹·∂c_blk **over the structurally nonzero ∂c rows
    only** (ancestors∪subtree of the block — the same trace-time sparsity
    the reference packs in shared memory,
    ``/root/reference/algorithms/_inverse_dynamics_gradient.py:55-96``).
    The ∂c block then never round-trips HBM and the dense XLA einsum
    (n³·B FMAs/side plus an (n,n,B) relayout) disappears; the extra cost is
    re-reading M⁻¹ per launch. ``fuse_finish=False`` restores the
    stage-then-einsum path (equivalence-tested).

    ``stage_dtype`` (e.g. ``jnp.bfloat16``) stores the inter-kernel HBM
    tensors (v, a, f, and the M⁻¹ copy the K5 launches re-read) at reduced
    precision; compute — including the q̈ solve — stays in ``q.dtype``."""
    n = model.n
    cdt = q.dtype
    if fuse_finish is None or fuse_finish:
        cb_f = cb or _col_block(n, extra=float(n * n))
        if fuse_finish is None:
            fuse_finish = cb_f > 0
        elif cb_f <= 0:
            raise ValueError(
                f"fuse_finish: no VMEM-valid column block for n={n}")
    if not fuse_finish:
        cb_f = cb or _col_block(n)
    cb = cb_f
    k1_block, k1_lane = _plan(block_b, 70.0 * n)
    k5_per_state = 60.0 * n + 19.0 * n * cb \
        + (float(n * n + 2 * n * cb) if fuse_finish else 0.0)
    k5_block, k5_lane = _plan(block_b, k5_per_state)

    c, v = bias_and_v_staged(model, q, qd, gravity, block_b, interpret)
    Minv = minv_staged(model, q, block_b=block_b, interpret=interpret)
    qdd = blops.matvecN(Minv, u - c)
    if stage_dtype is not None:
        v = v.astype(stage_dtype)
        Minv = Minv.astype(stage_dtype)

    def body_af(km, q, qd, qdd, v):
        X = blops.joint_transforms_bl(km, q)
        vl = _as_list(v.astype(cdt), km.n)
        _, a, f = blops.rnea_fwd_bl(km, X, qd, qdd, gravity, v_known=vl)
        _, f = blops.rnea_bwd_bl(km, X, f, None)
        return jnp.stack(a, axis=1), jnp.stack(f, axis=1)

    a, f = _pallas_batch_call(model, body_af, [q, qd, qdd, v],
                              [(6, n)] * 2, k1_block, interpret,
                              lane_tile=k1_lane)
    if stage_dtype is not None:
        a, f = a.astype(stage_dtype), f.astype(stage_dtype)

    outs = {}
    for side in ("q", "qd"):
        blocks = []
        for c0, w in _split_cols(None, n, cb):
            if fuse_finish:
                def body_grad(km, q, qd, v, a, f, Minv,
                              c0=c0, w=w, side=side):
                    X = blops.joint_transforms_bl(km, q)
                    vl, al, fl = (_as_list(t.astype(cdt), km.n)
                                  for t in (v, a, f))
                    Minv = Minv.astype(cdt)
                    rows = blops.rnea_grad_cols_bl(
                        km, X, qd, vl, al, fl, gravity,
                        c0=c0, cb=w, sides=(side,), as_rows=True)[side]
                    acc = None
                    for i, r in enumerate(rows):
                        if r is None:
                            continue
                        term = Minv[:, i][:, None] * r[None]
                        acc = term if acc is None else acc + term
                    return (-acc,)

                (blk,) = _pallas_batch_call(
                    model, body_grad, [q, qd, v, a, f, Minv],
                    [(n, w)], k5_block, interpret, lane_tile=k5_lane)
            else:
                def body_grad(km, q, qd, v, a, f, c0=c0, w=w, side=side):
                    X = blops.joint_transforms_bl(km, q)
                    vl, al, fl = (_as_list(t.astype(cdt), km.n)
                                  for t in (v, a, f))
                    dc = blops.rnea_grad_cols_bl(km, X, qd, vl, al, fl,
                                                 gravity, c0=c0, cb=w,
                                                 sides=(side,))
                    return (dc[side],)

                (blk,) = _pallas_batch_call(
                    model, body_grad, [q, qd, v, a, f],
                    [(n, w)], k5_block, interpret, lane_tile=k5_lane)
            blocks.append(blk)
        out = jnp.concatenate(blocks, axis=1)
        outs[side] = out if fuse_finish \
            else blops.matmatN(Minv.astype(cdt), out, negate=True)
    return outs["q"], outs["qd"]
