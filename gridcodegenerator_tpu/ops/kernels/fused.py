"""Fused Pallas TPU kernels for the hot algorithm paths.

The native-code obligation of the build (SURVEY.md §2 note): the reference's
only native component is the generated CUDA itself — one fused kernel per
algorithm that stages robot constants and state into shared memory and runs
the whole recursion on-chip (``_inverse_dynamics.py:354-421`` etc.). The TPU
equivalent: one ``pallas_call`` per algorithm whose grid tiles the batch;
each grid step loads a state tile plus the robot constants into VMEM and
executes the complete batch-last recursion from :mod:`..blops` on-chip —
VMEM plays the role of CUDA shared memory and Mosaic pipelines the HBM↔VMEM
tile transfers (the role of ``cgrps::memcpy_async`` double-buffering,
``_topology_helpers.py:121-124``).

Batch layout: the batch is shaped **(sublanes, lanes)** = (8·k, 128) inside
the kernel, so every scalar quantity of a state occupies exactly one vector
lane and every per-joint recursion step is a set of full-width (8, 128)
vector-register FMAs — the TPU analog of the reference's one-thread-per-
work-item mapping (``_code_generation_helpers.py:41-55``), with zero
sublane/lane padding waste.

All kernels share their compute bodies with the plain-XLA batch-last path
(:mod:`..blops`), so the two are equivalence-tested against each other and
against the golden model. Robot constants enter pre-batchified to the tile
shape: Mosaic miscompiles purely constant-derived value chains (see the
blops module notes), and real inputs carry ordinary tiled layouts.
"""

from __future__ import annotations

from types import SimpleNamespace

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...models.robot import RobotModel
from .. import blops

_LANES = 128
# model arrays passed into every kernel, in this order
_MODEL_FIELDS = ("Xb", "Xs", "Xc", "S", "inertia", "damping", "armature")


def _block_for(per_state_floats: float, cap: int = 2048):
    """Batch-tile size (whole (8,128) register rows, i.e. multiples of 1024
    states) for a kernel whose VMEM working set is ``per_state_floats``
    floats per state, or None when even one 1024-state tile cannot fit.
    Budget: a 16 MB VMEM core holds 4M f32; Mosaic double-buffers the
    HBM↔VMEM tiles, so keep the same empirical ceiling that round-1 sizing
    validated on hardware (n=7 ∇FD @2048 and n=12 ∇FD @1024 fit)."""
    budget = 3_400_000  # f32 VMEM floats usable by one kernel instance
    blk = int(budget // max(1.0, per_state_floats)) // 1024 * 1024
    return int(min(blk, cap)) or None


def _default_block(n: int, kind: str = "fd_grad"):
    """Per-kernel batch-tile sizing from working-set models (floats/state):

    * ``rnea``:    X (36n) + v,a,f (18n) + temps          ≈ 70n
    * ``minv``:    X + IA (36n each) + F (6n²) + rows (n²) ≈ 7n² + 90n
    * ``fd``:      minv + rnea live sets                   ≈ 7n² + 120n
    * ``fd_grad``: minv + one ∂-side (dv+da ≈ 6n², df 6n²) ≈ 16.6n² (the
      round-1 empirical rule n²·block ≤ 2.05e5·1024 restated per-state)

    A ``None`` means the single-tile fusion is impossible for this robot —
    callers fall back to the 1-D lane-tile kernel (8× smaller minimum tile,
    see :func:`_pallas_batch_call`), then the column-blocked staged pipeline
    (:mod:`.staged`), then the plain-XLA batch-last path.

    The gradient kernels are capped at 1024 states/tile: the n=7 ∇FD body
    at 2048 sits exactly on the 16 MB scoped-VMEM cliff — it fits when the
    batch arrives via on-device producers (how every round-1/2 bench
    measured it) but OOMs by 128 KB when the states are *runtime jit
    arguments* (XLA's boundary copy/bitcast fusions change the kernel's
    operand layouts — measured v5e 2026-08-18), which is the normal user
    call. 1024 measured equal-or-faster anyway (7.78e7 vs 7.69e7 evals/s
    headline, ``benchmarks/bench_dense_headline.py``)."""
    cap = 1024 if kind in ("fd_grad", "id_grad") else 2048
    return _block_for(_WORKSET[kind](n), cap)


_WORKSET = {
    "rnea": lambda n: 70.0 * n,
    "minv": lambda n: 7.0 * n * n + 90.0 * n,
    "fd": lambda n: 7.0 * n * n + 120.0 * n,
    "fd_grad": lambda n: 16.6 * n * n,
    "id_grad": lambda n: 16.6 * n * n,
    # ABA carries no O(n²) force matrix: X + IA (36n each) + v/ζ/pA (18n)
    # + U (6n) + temps ≈ 110n
    "aba": lambda n: 110.0 * n,
}


def _lane_tile_ok(n: int, kind: str) -> bool:
    """Whether the working set fits a 128-state lane tile.

    Hardware-calibrated (v5e, 2026-08-16): Mosaic's actual scoped-VMEM stack
    is ≈3.1× the analytic live-set model — the n=28 ∇FD body (13.0 k
    floats/state modeled) OOM'd at 20.21 MB against the 16 MB scoped limit
    (= 40.4 k floats/state real), while the n=28 M⁻¹ (8.0 k) and FD (9.0 k)
    bodies compiled and ran. The gap is sublane padding (6→8, n→⌈n/8⌉·8,
    ×1.52 at n=28) plus Mosaic stack temporaries for the stacked
    intermediates. Budget: 16 MB / 128 states / 4 B = 32.8 k floats/state;
    gate at 30 k estimated-real so the proven-working n=28 fd/minv kernels
    stay on the single-kernel path and the gradient kernels fall through to
    the column-blocked staged pipeline (:mod:`.staged`)."""
    return _WORKSET[kind](n) * 3.1 <= 30_000.0


def _kernel_model(model: RobotModel, refs) -> SimpleNamespace:
    """Duck-typed RobotModel over VMEM-resident constant refs (all
    pre-batchified to the tile shape; damping is (n, 1, 1))."""
    vals = {f: r[:] for f, r in zip(_MODEL_FIELDS, refs)}
    return SimpleNamespace(
        n=model.n, topology=model.topology, joint_types=model.joint_types,
        prismatic=None, accurate_trig=getattr(model, "accurate_trig", False),
        **vals)


def _pallas_batch_call(model: RobotModel, body, states, out_shapes, block_b,
                       interpret=False, lane_tile=False):
    """Run ``body(kmodel, *state_tiles) -> tuple`` over batch tiles.

    states: arrays (n, B); out_shapes: leading shapes without the batch.
    ``block_b`` = states per tile (rounded up to a multiple of 128 lanes).

    Two tile layouts:
    * default (2-D): the batch is shaped (8·k sublanes, 128 lanes) per tile —
      every scalar per-state quantity fills whole vector registers (minimum
      1024 states/tile, so per-state VMEM budget ≈ 4 M floats / tile states);
    * ``lane_tile`` (1-D): the batch occupies the 128 lanes only and array
      *structure* (spatial/joint indices) occupies the sublanes — 8× smaller
      minimum tile, so the per-state VMEM budget grows to ~31 k floats and
      Atlas-scale working sets (~16.6 n² ≈ 13 k at n = 28) fit one kernel.
      Costs some sublane padding (6→8, n→⌈n/8⌉·8) — the large-robot
      single-kernel alternative to the staged pipeline.
    """
    if lane_tile:
        return _pallas_lane_call(model, body, states, out_shapes, interpret)
    if block_b is None:
        # no VMEM-valid tile for this robot size: run the identical
        # batch-last bodies as plain XLA on the full batch
        return list(body(model, *states))
    n = model.n
    B = states[0].shape[-1]
    s_blk = max(1, -(-block_b // _LANES))
    if not interpret:
        s_blk = max(8, -(-s_blk // 8) * 8)  # whole (8,128) f32 tiles only
    tile = s_blk * _LANES
    pad = (-B) % tile
    if pad:
        states = [jnp.pad(s, ((0, 0),) * (s.ndim - 1) + ((0, pad),))
                  for s in states]
    Bp = B + pad
    S_tot = Bp // _LANES
    states = [s.reshape(s.shape[:-1] + (S_tot, _LANES)) for s in states]
    grid = (S_tot // s_blk,)

    btile = (s_blk, _LANES)
    model_args = []
    for fname in _MODEL_FIELDS:
        arr = getattr(model, fname)
        if fname in ("damping", "armature"):
            model_args.append(arr[:, None, None])
        else:
            model_args.append(jnp.broadcast_to(
                arr[..., None, None], arr.shape + btile))
    n_model = len(model_args)

    def kernel(*refs):
        mrefs = refs[:n_model]
        srefs = refs[n_model:n_model + len(states)]
        orefs = refs[n_model + len(states):]
        km = _kernel_model(model, mrefs)
        outs = body(km, *[r[:] for r in srefs])
        for o_ref, o in zip(orefs, outs):
            o_ref[:] = o

    in_specs = (
        [pl.BlockSpec(memory_space=pltpu.VMEM)] * n_model
        + [pl.BlockSpec(s.shape[:-2] + btile,
                        (lambda i, nd=s.ndim: (0,) * (nd - 2) + (i, 0)),
                        memory_space=pltpu.VMEM) for s in states]
    )
    out_specs = [
        pl.BlockSpec(shp + btile,
                     (lambda i, nd=len(shp): (0,) * nd + (i, 0)),
                     memory_space=pltpu.VMEM)
        for shp in out_shapes
    ]
    out_shape = [jax.ShapeDtypeStruct(shp + (S_tot, _LANES), states[0].dtype)
                 for shp in out_shapes]

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*model_args, *states)
    outs = [o.reshape(o.shape[:-2] + (Bp,)) for o in outs]
    if pad:
        outs = [o[..., :B] for o in outs]
    return outs


def _pallas_lane_call(model: RobotModel, body, states, out_shapes,
                      interpret=False):
    """1-D lane-tile dispatcher: 128 states per grid step, arrays (…, 128)."""
    B = states[0].shape[-1]
    pad = (-B) % _LANES
    if pad:
        states = [jnp.pad(s, ((0, 0),) * (s.ndim - 1) + ((0, pad),))
                  for s in states]
    Bp = B + pad
    grid = (Bp // _LANES,)

    model_args = []
    for fname in _MODEL_FIELDS:
        arr = getattr(model, fname)
        if fname in ("damping", "armature"):
            model_args.append(arr[:, None])
        else:
            model_args.append(jnp.broadcast_to(
                arr[..., None], arr.shape + (_LANES,)))
    n_model = len(model_args)

    def kernel(*refs):
        mrefs = refs[:n_model]
        srefs = refs[n_model:n_model + len(states)]
        orefs = refs[n_model + len(states):]
        km = _kernel_model(model, mrefs)
        outs = body(km, *[r[:] for r in srefs])
        for o_ref, o in zip(orefs, outs):
            o_ref[:] = o

    in_specs = (
        [pl.BlockSpec(memory_space=pltpu.VMEM)] * n_model
        + [pl.BlockSpec(s.shape[:-1] + (_LANES,),
                        (lambda i, nd=s.ndim: (0,) * (nd - 1) + (i,)),
                        memory_space=pltpu.VMEM) for s in states]
    )
    out_specs = [
        pl.BlockSpec(shp + (_LANES,),
                     (lambda i, nd=len(shp): (0,) * nd + (i,)),
                     memory_space=pltpu.VMEM)
        for shp in out_shapes
    ]
    out_shape = [jax.ShapeDtypeStruct(shp + (Bp,), states[0].dtype)
                 for shp in out_shapes]

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*model_args, *states)
    if pad:
        outs = [o[..., :B] for o in outs]
    return list(outs)


# --------------------------------------------------------------------------
# public fused kernels (batch-last signatures: state arrays are (n, B))
# --------------------------------------------------------------------------
def inverse_dynamics_fused(model: RobotModel, q, qd, qdd=None, gravity=-9.81,
                           block_b=None, interpret=False):
    """Fused RNEA: (n,B)³ → c (n,B)."""
    block_b = block_b or _default_block(model.n, "rnea")

    if qdd is None:
        def body(km, q, qd):
            c, *_ = blops.rnea_bl(km, q, qd, None, gravity)
            return (c,)
        states = [q, qd]
    else:
        def body(km, q, qd, qdd):
            c, *_ = blops.rnea_bl(km, q, qd, qdd, gravity)
            return (c,)
        states = [q, qd, qdd]
    (c,) = _pallas_batch_call(model, body, states, [(model.n,)], block_b,
                              interpret)
    return c


def minv_fused(model: RobotModel, q, gravity=-9.81, block_b=None,
               interpret=False):
    """Fused analytic M⁻¹: q (n,B) → dense symmetric (n,n,B)."""
    block_b = block_b or _default_block(model.n, "minv")
    if block_b is None:
        from .staged import _CAL, _LANE_BUDGET, minv_qdd_dense_staged, \
            minv_staged
        n = model.n
        # CRBA + active-region Cholesky + symmetric L⁻ᵀL⁻¹ in one lane-tile
        # kernel: measured 2.1×/1.1× the articulated lane-recursion kernel
        # on Atlas at 16k/262k (v5e 2026-08-18, benchmarks/
        # bench_dense_minv.py) — prefer it whenever its working set fits
        if (72.0 * n + 5.0 * n * n + 200.0) * _CAL <= _LANE_BUDGET:
            (M,) = minv_qdd_dense_staged(model, q, interpret=interpret)
            return M
        if _lane_tile_ok(model.n, "minv"):
            def body(km, q):
                X = blops.joint_transforms_bl(km, q)
                rows, _, _ = blops.minv_bl(km, X)
                return (blops.densify_rows(rows),)
            (M,) = _pallas_batch_call(model, body, [q],
                                      [(model.n, model.n)], None,
                                      interpret, lane_tile=True)
            return M
        return minv_staged(model, q, interpret=interpret)

    def body(km, q):
        X = blops.joint_transforms_bl(km, q)
        rows, _, _ = blops.minv_bl(km, X)
        return (blops.densify_rows(rows),)

    (M,) = _pallas_batch_call(model, body, [q], [(model.n, model.n)], block_b,
                              interpret)
    return M


def forward_dynamics_fused(model: RobotModel, q, qd, u, gravity=-9.81,
                           block_b=None, interpret=False):
    """Fused FD: (n,B)³ → q̈ (n,B)."""
    block_b = block_b or _default_block(model.n, "fd")
    if block_b is None:
        from .staged import _CAL, _LANE_BUDGET, fd_dense_staged, fd_staged
        n = model.n
        # CRBA + Cholesky factor + single-rhs solve (never forms M⁻¹):
        # prefer it on the lane tier whenever its working set fits — the
        # dense-M⁻¹ sibling measured 2.1× the articulated lane kernel on
        # Atlas (bench_dense_minv.py) and FD skips the inverse entirely
        if (102.0 * n + 1.5 * n * n + 200.0) * _CAL <= _LANE_BUDGET:
            return fd_dense_staged(model, q, qd, u, gravity,
                                   interpret=interpret)
        if _lane_tile_ok(model.n, "fd"):
            def body(km, q, qd, u):
                return (blops.fd_bl(km, q, qd, u, gravity),)
            (qdd,) = _pallas_batch_call(model, body, [q, qd, u],
                                        [(model.n,)], None, interpret,
                                        lane_tile=True)
            return qdd
        return fd_staged(model, q, qd, u, gravity, interpret=interpret)

    def body(km, q, qd, u):
        return (blops.fd_bl(km, q, qd, u, gravity),)

    (qdd,) = _pallas_batch_call(model, body, [q, qd, u], [(model.n,)], block_b,
                                interpret)
    return qdd


def forward_dynamics_aba_fused(model: RobotModel, q, qd, u, gravity=-9.81,
                               block_b=None, interpret=False):
    """Fused FD via the articulated-body algorithm (``ops/aba.py``):
    (n,B)³ → q̈ (n,B).

    O(n) per state — no (6, n) force matrix, no M⁻¹ — so its VMEM working
    set stays linear in n and even humanoid-scale robots fit the 2-D
    batch-tile layout that the M⁻¹-composition FD kernel outgrows at
    n ≈ 17. A/B'd against :func:`forward_dynamics_fused` on hardware; see
    BENCHMARKS.md."""
    from ..aba import aba_bl

    block_b = block_b or _default_block(model.n, "aba")

    def body(km, q, qd, u):
        return (aba_bl(km, q, qd, u, gravity),)

    if block_b is None:
        if _lane_tile_ok(model.n, "aba"):
            (qdd,) = _pallas_batch_call(model, body, [q, qd, u],
                                        [(model.n,)], None, interpret,
                                        lane_tile=True)
            return qdd
        return aba_bl(model, q, qd, u, gravity)

    (qdd,) = _pallas_batch_call(model, body, [q, qd, u], [(model.n,)],
                                block_b, interpret)
    return qdd


def _dense_minv_bl(km, X):
    """CRBA + active-region Cholesky + symmetric L⁻ᵀL⁻¹ dense M⁻¹ — the
    kernel-internal dense alternative to the articulated recursion."""
    from .contact_fused import _chol_factor_act, _chol_minv_sym
    return _chol_minv_sym(_chol_factor_act(blops.crba_bl(km, X), km.n), km.n)


def fd_grad_fused(model: RobotModel, q, qd, u, gravity=-9.81, block_b=None,
                  interpret=False, minv_impl="recursion"):
    """Fused ∇FD — the north-star kernel: the full pipeline
    (X → RNEA → M⁻¹ → q̈ → vaf → ∂ID → −M⁻¹·∂c) in ONE kernel launch per
    batch tile, everything VMEM-resident. For robots too large for a single
    tile, delegates to the column-blocked staged pipeline (:mod:`.staged`).
    Returns (ddq, ddqd), each (n,n,B).

    ``minv_impl="dense"`` swaps the articulated M⁻¹ recursion for CRBA +
    Cholesky inside the single-tile kernel: measured +14% on iiwa-14
    (8.89e7 vs 7.78e7 evals/s @262k) and +3% on HyQ, but with a 2.7×
    worse f32-vs-golden parity tail (max 1.49e-5 vs 5.5e-6 over 256
    states, v5e 2026-08-18, ``benchmarks/bench_dense_headline.py``) —
    opt-in because the ≤ ~5e-6 parity bound is the tighter north
    star."""
    minv_fn = _dense_minv_bl if minv_impl == "dense" else None
    block_b = block_b or _default_block(model.n, "fd_grad")
    if block_b is None:
        if _lane_tile_ok(model.n, "fd_grad"):
            def body(km, q, qd, u):
                return blops.fd_grad_bl(km, q, qd, u, gravity,
                                        minv_fn=minv_fn)
            n_ = model.n
            ddq, ddqd = _pallas_batch_call(model, body, [q, qd, u],
                                           [(n_, n_), (n_, n_)], None,
                                           interpret, lane_tile=True)
            return ddq, ddqd
        from .staged import fd_grad_staged
        return fd_grad_staged(model, q, qd, u, gravity, interpret=interpret)

    def body(km, q, qd, u):
        return blops.fd_grad_bl(km, q, qd, u, gravity, minv_fn=minv_fn)

    n = model.n
    ddq, ddqd = _pallas_batch_call(model, body, [q, qd, u],
                                   [(n, n), (n, n)], block_b, interpret)
    return ddq, ddqd


def id_grad_fused(model: RobotModel, q, qd, qdd=None, gravity=-9.81,
                  block_b=None, interpret=False):
    """Fused ∂ID: returns (dc_dq, dc_dqd), each (n,n,B)."""
    block_b = block_b or _default_block(model.n, "id_grad")
    if block_b is None:
        if qdd is None:
            qdd = jnp.zeros_like(q)
        if _lane_tile_ok(model.n, "id_grad"):
            def body(km, q, qd, qdd):
                X = blops.joint_transforms_bl(km, q)
                v, a, f = blops.rnea_fwd_bl(km, X, qd, qdd, gravity)
                _, f = blops.rnea_bwd_bl(km, X, f, None)
                dq = blops.rnea_grad_inner_bl(km, X, qd, v, a, f, gravity,
                                              sides=("q",))["q"]
                dqd = blops.rnea_grad_inner_bl(km, X, qd, v, a, f, gravity,
                                               sides=("qd",))["qd"]
                return dq, dqd
            n_ = model.n
            return tuple(_pallas_batch_call(model, body, [q, qd, qdd],
                                            [(n_, n_), (n_, n_)], None,
                                            interpret, lane_tile=True))
        from .staged import id_grad_staged
        return id_grad_staged(model, q, qd, qdd, gravity, interpret=interpret)

    def body(km, q, qd, qdd):
        X = blops.joint_transforms_bl(km, q)
        v, a, f = blops.rnea_fwd_bl(km, X, qd, qdd, gravity)
        _, f = blops.rnea_bwd_bl(km, X, f, None)
        dq = blops.rnea_grad_inner_bl(km, X, qd, v, a, f, gravity,
                                      sides=("q",))["q"]
        dqd = blops.rnea_grad_inner_bl(km, X, qd, v, a, f, gravity,
                                       sides=("qd",))["qd"]
        return dq, dqd

    n = model.n
    if qdd is None:
        qdd = jnp.zeros_like(q)  # S·0 ≡ absent q̈ term: numerically identical
    dq, dqd = _pallas_batch_call(model, body, [q, qd, qdd],
                                 [(n, n), (n, n)], block_b, interpret)
    return dq, dqd
