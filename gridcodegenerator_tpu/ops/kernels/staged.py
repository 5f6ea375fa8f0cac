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
  K2′ q,u−c     → M⁻¹, q̈         (ONE kernel: CRBA + active-region
      Cholesky + symmetric L⁻ᵀL⁻¹ inverse + the q̈ solve — default)
  [A/B "recursion" path:
   K2  q         → U, D⁻¹         (articulated-body backward sweep)
   K3ᵏ q,U,D⁻¹   → M⁻¹[:, blkₖ]   (column-blocked F/row recursions)
       XLA: densify M⁻¹, q̈ = M⁻¹(u − c)]
  K4  q,q̇,q̈,v  → a, f            (vaf at the true q̈, v reused)
  K5ᵏ  q,q̇,v,a,f → ∂c_q[:, blkₖ], ∂c_q̇[:, blkₖ]  (column-blocked ∂ID;
       both sides from one launch by default, per-side for A/B)
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
# Merged (both-sides) gradient bodies inflate their cb-independent base.
# r4 calibration measured 3.2× on the THREE-LOOP ∂ bodies (md pipeline,
# v5e 2026-08-18; two gate models OOM'd before that multiplier). r5: the
# fixed-base ∂ body was restructured into ONE fused forward loop
# (blops.rnea_grad_cols_bl — dv/da of a joint die at its last child
# instead of living across three full passes), and hardware re-measure
# (v5e 2026-08-21, benchmarks/staged_breakdown.py, Atlas n=28 @262k)
# shows merged launches now compile at cb=7 AND cb=14 (the old model
# allowed cb=2) and beat per-side: K5 49.3 ms (cb7 per-side, old
# default) → 36.2 (cb7 merged) / 35.1 (cb14 merged); cb28 merged OOMs.
# 1.6× matches that envelope with the reduced-liveness slope below.
_MERGE_BASE = 1.6


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


def _k5_slope(n: int, extra: float, n_sides: int) -> float:
    """Per-column (cb-proportional) K5 live-set slope, floats/state — PER
    SIDE (Mosaic does not reuse the first side's stack for the second).
    r5, post fused-forward-loop restructure: the ∂v/∂a tensors of a joint
    die at its last child, so only the df accumulators (6n) + the output
    row block (n) scale with cb — 7n, vs the old three-pass 19n; +2n when
    the fused −M⁻¹·∂c finish is live. Hardware envelope: merged cb=14
    compiles at n=28 (26.8k modeled·_CAL ≈ the lane budget), cb=28
    merged OOMs — both match (v5e 2026-08-21)."""
    return n_sides * (7.0 * n + (2.0 * n if extra else 0.0))


def _k5_per_state(n: int, cb: int, extra: float = 0.0,
                  n_sides: int = 1) -> float:
    """Modeled K5 working set (floats/state) for a width-``cb`` block.
    A merged both-sides body ~triples the cb-independent base as well
    (hardware calibration ``multidof_staged._MERGE_BASE``: two gate
    models in a row OOM'd on real silicon before that multiplier)."""
    base = 60.0 * n + extra
    if n_sides > 1:
        base *= _MERGE_BASE
    return base + _k5_slope(n, extra, n_sides) * cb


def _col_block(n: int, extra: float = 0.0, n_sides: int = 1) -> int:
    """Largest ∂ID column-block width whose K5 working set
    (:func:`_k5_per_state`) fits the best available tile tier. ``extra``
    adds a cb-independent term to the live set (the fused −M⁻¹·∂c finish
    holds the (n,n) M⁻¹ tile in VMEM: pass extra = n²; its n·cb output
    interaction is the +2n·cb slope term). ``n_sides=2`` sizes the merged
    both-sides launch (∂/∂q and ∂/∂q̇ from one kernel).

    Prefers a block width that divides n evenly: uniform blocks mean ONE
    compiled kernel shape instead of a ragged tail (v5e 2026-08-16: a
    width-2 tail block after two width-13 blocks crashed the Mosaic
    compiler with ``Check failed: limits[i] <= dim(i) (2 vs. 1)``; uniform
    widths also reuse layouts better). Falls back to the ragged maximum
    only when the best divisor would waste more than half the budget."""
    slope = _k5_slope(n, extra, n_sides)
    base = (60.0 * n + extra) * (_MERGE_BASE if n_sides > 1 else 1.0)
    cb_2d = int((_2D_BUDGET / 1024 / _CAL - base) // slope)
    cb_max = cb_2d if cb_2d >= 1 else int(
        (_LANE_BUDGET / _CAL - base) // slope)
    if (extra or n_sides > 1) and cb_max < 1:
        return 0          # no valid tile for this mode: caller falls back
    cb_max = max(1, min(cb_max, n))
    divisors = [d for d in range(1, cb_max + 1) if n % d == 0]
    best = max(divisors) if divisors else 1
    return best if best * 2 > cb_max else cb_max


def _side_plan(n: int, extra: float, cb, merge_sides: bool):
    """Resolve (cb, launch plan): one both-sides launch per column block
    when the merged workspace fits a tile tier AND strictly reduces the
    launch count (each side pays its full per-column workset — see
    :func:`_k5_slope` — so the merged width is ~half the per-side width
    and the win is the shared X recompute + q/q̇/v/a/f (and M⁻¹) HBM
    reads per launch). Else per-side launches. Mirrors the md pipeline
    (``multidof_staged._side_plan``)."""
    cb1 = cb or _col_block(n, extra)
    if merge_sides:
        cbm = cb or _col_block(n, extra, n_sides=2)
        # ≤, not <: at equal launch counts the merged body still wins —
        # it shares each launch's X recompute and q/q̇/v/a/f (+M⁻¹) HBM
        # reads (hardware: 36.2 vs 42.9–49.3 ms at equal/4-launch plans,
        # Atlas 262k, v5e 2026-08-21)
        if (cbm >= 1
                and _tile_plan(
                    _k5_per_state(n, cbm, extra, 2)) != (None, False)
                and (cb is not None
                     or cb1 < 1 or -(-n // cbm) <= 2 * -(-n // cb1))):
            return cbm, (("q", "qd"),)
    return cb1, (("q",), ("qd",))


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


def minv_qdd_dense_staged(model: RobotModel, q, rhs=None, block_b=None,
                          interpret=False):
    """K2′: ONE kernel emits the dense symmetric M⁻¹ (n, n, B) — and
    q̈ = M⁻¹·``rhs`` when ``rhs`` (n, B) is given — via CRBA + the
    active-region column Cholesky + the triangular-sliced L⁻ᵀ·L⁻¹
    symmetric inverse. This is the fixed-base port of the md pipeline's
    ``multidof_staged.md_minv_qdd_fused``: it replaces the articulated
    path's K2 (U/D⁻¹) + ⌈n/cb⌉ column-blocked K3 launches + XLA densify
    (+ the XLA q̈ solve) with one launch at ~3× fewer wide-op flops
    (M = CRBA ~n·matmat6 + ancestor dots; factor n³/6; inverse n³/3 —
    vs the F/row recursions' per-column 6-vector chains).

    The articulated recursion (:func:`minv_staged`) remains the
    reference-semantics path (``/root/reference/algorithms/
    _direct_minv.py``) and the A/B alternative."""
    n = model.n
    blk, lane = _plan(block_b, 72.0 * n + 5.0 * n * n + 200.0)

    def body(km, q, *rest):
        from .contact_fused import _chol_factor_act, _chol_minv_sym

        X = blops.joint_transforms_bl(km, q)
        M = blops.crba_bl(km, X)
        Minv = _chol_minv_sym(_chol_factor_act(M, km.n), km.n)
        if not rest:
            return (Minv,)
        r = rest[0]
        qdd = sum(Minv[:, j] * r[j:j + 1] for j in range(km.n))
        return Minv, qdd

    states = [q] + ([] if rhs is None else [rhs])
    outs = [(n, n)] + ([] if rhs is None else [(n,)])
    return _pallas_batch_call(model, body, states, outs, blk, interpret,
                              lane_tile=lane)


_MINV_AF_WS = lambda n: 172.0 * n + 5.0 * n * n + 200.0


def minv_qdd_af_dense_staged(model: RobotModel, q, qd, umc, v,
                             gravity=-9.81, block_b=None, interpret=False):
    """K2″: the K2′ + K4 merge for the staged ∇FD — ONE kernel emitting the
    dense symmetric M⁻¹ AND the true-q̈ second RNEA sweep's (a, f), given
    ``umc = u − c`` and the K1-staged ``v``. q̈ = M⁻¹·umc is computed and
    consumed *inside* the kernel (never round-trips HBM, and the separate
    K4 launch's X recompute disappears). Returns (Minv (n,n,B), a (6,n,B),
    f (6,n,B))."""
    n = model.n
    blk, lane = _plan(block_b, _MINV_AF_WS(n))
    cdt = q.dtype

    def body(km, q, qd, umc, v):
        from .contact_fused import _chol_factor_act, _chol_minv_sym

        X = blops.joint_transforms_bl(km, q)
        M = blops.crba_bl(km, X)
        Minv = _chol_minv_sym(_chol_factor_act(M, km.n), km.n)
        qdd = sum(Minv[:, j] * umc[j:j + 1] for j in range(km.n))
        vl = _as_list(v.astype(cdt), km.n)
        _, a, f = blops.rnea_fwd_bl(km, X, qd, qdd, gravity, v_known=vl)
        _, f = blops.rnea_bwd_bl(km, X, f, None)
        return Minv, jnp.stack(a, axis=1), jnp.stack(f, axis=1)

    return _pallas_batch_call(model, body, [q, qd, umc, v],
                              [(n, n), (6, n), (6, n)], blk, interpret,
                              lane_tile=lane)


def fd_staged(model: RobotModel, q, qd, u, gravity=-9.81, block_b=None,
              interpret=False):
    """Staged forward dynamics for large robots: q̈ (n, B)."""
    c, _ = bias_and_v_staged(model, q, qd, gravity, block_b, interpret)
    Minv = minv_staged(model, q, block_b=block_b, interpret=interpret)
    return blops.matvecN(Minv, u - c)


def fd_dense_staged(model: RobotModel, q, qd, u, gravity=-9.81,
                    block_b=None, interpret=False):
    """ONE-kernel large-robot FD: X → bias RNEA → CRBA → active-region
    Cholesky → single-rhs wide solve. Unlike every M⁻¹-based FD path this
    never forms the inverse — factor (n³/6 wide flops) + one forward/back
    substitution (n²) replace the articulated M⁻¹ recursion + matvec.
    The dense-M⁻¹ sibling is :func:`minv_qdd_dense_staged` (used by ∇FD,
    which needs the full inverse for the −M⁻¹·∂c finish)."""
    n = model.n
    blk, lane = _plan(block_b, 102.0 * n + 1.5 * n * n + 200.0)

    def body(km, q, qd, u):
        from .contact_fused import _chol_factor_act, _chol_solve_act

        X = blops.joint_transforms_bl(km, q)
        _, a0, f0 = blops.rnea_fwd_bl(km, X, qd, None, gravity)
        c, _ = blops.rnea_bwd_bl(km, X, f0, qd)
        cols = _chol_factor_act(blops.crba_bl(km, X), km.n)
        return (_chol_solve_act(cols, (u - c)[:, None])[:, 0],)

    (qdd,) = _pallas_batch_call(model, body, [q, qd, u], [(n,)], blk,
                                interpret, lane_tile=lane)
    return qdd


def id_grad_staged(model: RobotModel, q, qd, qdd, gravity=-9.81,
                   block_b=None, cb=None, interpret=False, stage_dtype=None,
                   merge_sides=True):
    """Staged ∂ID for large robots: (dc_dq, dc_dqd), each (n, n, B).

    Both sides of each column block come from ONE launch by default
    (``merge_sides`` — the sides run sequentially inside the body and
    share the launch's X recompute and HBM reads); ``merge_sides=False``
    keeps the per-side launches for A/B.

    ``stage_dtype`` (e.g. ``jnp.bfloat16``) stores the inter-kernel HBM
    tensors (v, a, f) at reduced precision — each K5 launch then reads
    half the bytes and upcasts in VMEM. Compute stays in ``q.dtype``.
    Parity cost is ~bf16 roundoff on the gradient (measured in
    BENCHLOG.md); default ``None`` keeps full precision."""
    n = model.n
    cb, plan = _side_plan(n, 0.0, cb, merge_sides)
    k1_block, k1_lane = _plan(block_b, 70.0 * n)
    k5_block, k5_lane = _plan(
        block_b, _k5_per_state(n, cb, 0.0, len(plan[0])))
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

    outs = {"q": [], "qd": []}
    for sides in plan:
        for c0, w in _split_cols(None, n, cb):
            def body_grad(km, q, qd, v, a, f, c0=c0, w=w, sides=sides):
                X = blops.joint_transforms_bl(km, q)
                vl, al, fl = (_as_list(t.astype(cdt), km.n)
                              for t in (v, a, f))
                dc = blops.rnea_grad_cols_bl(km, X, qd, vl, al, fl, gravity,
                                             c0=c0, cb=w, sides=sides)
                return tuple(dc[s] for s in sides)

            blks = _pallas_batch_call(model, body_grad, [q, qd, v, a, f],
                                      [(n, w)] * len(sides), k5_block,
                                      interpret, lane_tile=k5_lane)
            for s, blk in zip(sides, blks):
                outs[s].append(blk)
    return (jnp.concatenate(outs["q"], axis=1),
            jnp.concatenate(outs["qd"], axis=1))


def fd_grad_staged(model: RobotModel, q, qd, u, gravity=-9.81, block_b=None,
                   cb=None, interpret=False, fuse_finish=None,
                   stage_dtype=None, merge_sides=True, minv_impl="dense",
                   merge_af=False):
    """Staged ∇FD — the large-robot counterpart of
    :func:`..kernels.fused.fd_grad_fused`: returns (ddq, ddqd), each (n,n,B).

    Same dataflow as the single-tile kernel (X shared, v reused across the
    two RNEA sweeps, sides processed sequentially); the ∂-tensors never
    materialize wider than ``cb`` columns in VMEM. Both sides of each
    column block come from ONE launch by default (``merge_sides`` —
    halves the K5 launch count, sharing each launch's X recompute and its
    q/q̇/v/a/f and M⁻¹ HBM reads); ``merge_sides=False`` keeps per-side
    launches for A/B.

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
    precision; compute — including the q̈ solve — stays in ``q.dtype``.

    ``minv_impl`` selects the M⁻¹+q̈ stage: ``"dense"`` (default) is the
    single K2′ kernel (:func:`minv_qdd_dense_staged`, CRBA + active-region
    Cholesky); ``"recursion"`` the articulated K2/K3/densify path.

    ``merge_af`` (dense path only, measured-off): fold the K4 second
    sweep (a, f) into the K2′ kernel (:func:`minv_qdd_af_dense_staged`) —
    one launch and one X recompute fewer, q̈ never round-trips HBM.
    Hardware (v5e 2026-08-18, Atlas n=28, bench_dense_minv.py): **−6% at
    batch 16k** (4.04e6 vs 4.29e6 evals/s) and +1% (noise) at 262k — the
    saved launch does not pay for the merged body's worse Mosaic
    scheduling, so the default stays the two-launch K2′+K4 path; the
    merged kernel is kept as the measured A/B."""
    n = model.n
    cdt = q.dtype
    if fuse_finish is None or fuse_finish:
        cb_f = cb or _col_block(n, extra=float(n * n))
        if fuse_finish is None:
            fuse_finish = cb_f > 0
        elif cb_f <= 0:
            raise ValueError(
                f"fuse_finish: no VMEM-valid column block for n={n}")
    extra = float(n * n) if fuse_finish else 0.0
    cb, plan = _side_plan(n, extra, cb, merge_sides)
    k1_block, k1_lane = _plan(block_b, 70.0 * n)
    k5_block, k5_lane = _plan(
        block_b, _k5_per_state(n, cb, extra, len(plan[0])))

    c, v = bias_and_v_staged(model, q, qd, gravity, block_b, interpret)
    a = None
    if minv_impl == "dense":
        if merge_af and _plan(block_b, _MINV_AF_WS(n)) != (None, False):
            # K2″: M⁻¹ + in-kernel q̈ + the second sweep's (a, f) from ONE
            # launch (shared X; q̈ never staged through HBM)
            Minv, a, f = minv_qdd_af_dense_staged(
                model, q, qd, u - c, v, gravity, block_b=block_b,
                interpret=interpret)
        else:
            # K2′: one kernel for dense M⁻¹ AND q̈ (CRBA + active-region
            # Cholesky) instead of K2 + ⌈n/cb⌉ K3 + XLA densify/solve
            Minv, qdd = minv_qdd_dense_staged(model, q, u - c,
                                              block_b=block_b,
                                              interpret=interpret)
    else:
        Minv = minv_staged(model, q, block_b=block_b, interpret=interpret)
        qdd = blops.matvecN(Minv, u - c)
    if stage_dtype is not None:
        v = v.astype(stage_dtype)
        Minv = Minv.astype(stage_dtype)

    if a is None:
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

    outs = {"q": [], "qd": []}
    for sides in plan:
        for c0, w in _split_cols(None, n, cb):
            if fuse_finish:
                def body_grad(km, q, qd, v, a, f, Minv,
                              c0=c0, w=w, sides=sides):
                    X = blops.joint_transforms_bl(km, q)
                    vl, al, fl = (_as_list(t.astype(cdt), km.n)
                                  for t in (v, a, f))
                    Minv = Minv.astype(cdt)
                    res = []
                    # sides sequential: side 1's ∂-workset and row list
                    # free before side 2 traces; only the finished (n, w)
                    # contraction parks (the _k5_per_state n_sides term)
                    for side in sides:
                        rows = blops.rnea_grad_cols_bl(
                            km, X, qd, vl, al, fl, gravity,
                            c0=c0, cb=w, sides=(side,), as_rows=True)[side]
                        acc = None
                        for i, r in enumerate(rows):
                            if r is None:
                                continue
                            term = Minv[:, i][:, None] * r[None]
                            acc = term if acc is None else acc + term
                        res.append(-acc)
                    return tuple(res)

                blks = _pallas_batch_call(
                    model, body_grad, [q, qd, v, a, f, Minv],
                    [(n, w)] * len(sides), k5_block, interpret,
                    lane_tile=k5_lane)
            else:
                def body_grad(km, q, qd, v, a, f, c0=c0, w=w, sides=sides):
                    X = blops.joint_transforms_bl(km, q)
                    vl, al, fl = (_as_list(t.astype(cdt), km.n)
                                  for t in (v, a, f))
                    dc = blops.rnea_grad_cols_bl(km, X, qd, vl, al, fl,
                                                 gravity, c0=c0, cb=w,
                                                 sides=sides)
                    return tuple(dc[s] for s in sides)

                blks = _pallas_batch_call(
                    model, body_grad, [q, qd, v, a, f],
                    [(n, w)] * len(sides), k5_block, interpret,
                    lane_tile=k5_lane)
            for s, blk in zip(sides, blks):
                outs[s].append(blk)
    res = {}
    for side in ("q", "qd"):
        out = jnp.concatenate(outs[side], axis=1)
        res[side] = out if fuse_finish \
            else blops.matmatN(Minv.astype(cdt), out, negate=True)
    return res["q"], res["qd"]
