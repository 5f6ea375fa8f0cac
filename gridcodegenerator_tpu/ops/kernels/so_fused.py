"""Fused second-order (Hessian) kernels — forward-over-analytic in VMEM.

The reference stops at first-order analytic derivatives (its deepest kernel
is the ∇FD composition, ``/root/reference/algorithms/
_forward_dynamics_gradient.py:107-177``); the second-order path here is the
same ladder extended one rung (``ops/so.py``) and this module gives it the
same native treatment the first-order families got: ONE ``pallas_call``
per batch tile that runs the entire primal gradient pipeline *plus all 3n
forward-mode tangent sweeps* on-chip.

Why a kernel helps exactly here: the batch-last XLA path
(``so.forward_dynamics_hessian_bl``) linearizes the analytic gradient and
pushes 3n coordinate tangents through the linearized program — XLA stages
each tangent's (n, 3n, B)-scale intermediates through HBM between fusions,
and at 2¹⁴ states their sum already forces ``lax.map`` chunking in the api
adapter. Inside the kernel the primal residuals are computed once per tile,
every tangent sweep reads them from VMEM, and only the (3n, 3n, tile)
output block leaves the core.

Construction note: ``jax.jvp`` runs *inside* the kernel body — the body is
ordinary traceable JAX, so forward-mode happens at trace time and Mosaic
sees only the flat arithmetic of one primal + one tangent program. The
tangent **direction lives on the kernel grid**, not inside the body: a
first grid axis indexes the 3n coordinate directions and each instance
computes the primal pipeline plus that single direction's JVP, selected
with a ``broadcasted_iota == program_id`` one-hot. The all-directions-in-
one-body alternative (shared ``jax.linearize`` residuals, the obvious
op-count optimum) was measured to need an 88.7 MB Mosaic stack at the
1024-state tile — 5.5× the 16 MB scoped-VMEM limit (v5e 2026-08-19): the
three linearizations' residual sets plus 21 stacked output rows are all
live at once. Trading the shared residuals for a per-instance primal
recompute (~2× FLOPs) shrinks the stack to one tangent sweep — the same
recompute-vs-memory trade the column-blocked staged ∂ID pipeline makes
(``staged.py`` recomputes X per kernel).

The per-argument split (three pallas_calls — q-, q̇-, u-direction blocks —
so a non-perturbed argument's tangent is a symbolic zero JAX prunes from
the jvp program) carries over from ``so.forward_dynamics_hessian_bl``; the
u-block's tangent program, for instance, carries no X/M⁻¹ tangents at all.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...models.robot import RobotModel
from ..so import fd_grad_full_bl
from .fused import _LANES, _MODEL_FIELDS, _block_for, _kernel_model

# Per-state VMEM working-set models (f32 floats/state) for ONE kernel
# instance = primal gradient pipeline (16.6 n², the fd_grad calibration)
# + one jvp tangent sweep (≈ the same again) + the instance's output row
# ((3n)/state for λᵀ·H — one (3n, tile) row — or 3n² for a full-tensor
# (n, 3n, tile) row).
_WS_VP = lambda n: 34.0 * n * n + 3.0 * n
_WS_FULL = lambda n: 34.0 * n * n + 3.0 * n * n

# lane-tile gate, same 3.1× Mosaic-stack calibration as fused._lane_tile_ok
_LANE_REAL, _LANE_CAP = 3.1, 30_000.0


def vp_block(n: int):
    """2-D batch-tile size for the λᵀ·H kernel, or the sentinel ``"lane"``
    when only a 128-state lane tile fits, or None (no kernel — callers use
    the batch-last XLA path)."""
    blk = _block_for(_WS_VP(n))
    if blk:
        return blk
    return "lane" if _WS_VP(n) * _LANE_REAL <= _LANE_CAP else None


def full_block(n: int):
    """Tile size for the full-tensor kernel (same convention)."""
    blk = _block_for(_WS_FULL(n))
    if blk:
        return blk
    return "lane" if _WS_FULL(n) * _LANE_REAL <= _LANE_CAP else None


def _hess_row(km, d, q, qd, u, lam, which, gravity):
    """ONE tangent row of the (λ-contracted) Hessian on one tile: the JVP
    of the analytic gradient along coordinate direction ``d`` (traced, the
    grid index) of argument block ``which`` (static: 0=q, 1=q̇, 2=u).
    Returns (3n, *tile) contracted or (n, 3n, *tile) full."""
    n = km.n
    tile = q.shape[1:]

    def G(q_, qd_, u_):
        J = fd_grad_full_bl(km, q_, qd_, u_, gravity)      # (n, 3n, *tile)
        if lam is not None:
            # λ-contraction as multiply-reduce, NOT einsum: the dot_general
            # form carries 2 batch dims, which Mosaic's tpu.matmul rejects
            # ("Up to 1 batch dim supported", v5e 2026-08-19)
            J = jnp.sum(lam[:, None] * J, axis=0)          # (3n, *tile)
        return J

    args = (q, qd, u)

    def g_one(z):
        return G(*(z if j == which else args[j] for j in range(3)))

    iota = jax.lax.broadcasted_iota(jnp.int32, (n,) + tile, 0)
    e = (iota == d).astype(q.dtype)
    return jax.jvp(g_one, (args[which],), (e,))[1]


def _pallas_dir_call(model: RobotModel, body, states, n_dirs, row_shape,
                     block_b, interpret=False):
    """Direction-grid dispatcher: grid (batch_tiles, n_dirs) — directions
    iterate innermost so each state tile stays VMEM-resident across all its
    directions (Mosaic elides the re-fetch when the input index map is
    unchanged). ``body(km, d, *tiles) -> row`` of ``row_shape + tile``;
    returns (n_dirs,) + row_shape + (B,).

    ``block_b == "lane"`` uses 128-state lane tiles (structure on the
    sublanes) — the mid-size-robot tier, exactly as in
    ``fused._pallas_lane_call``."""
    lane = block_b == "lane"
    n = model.n
    B = states[0].shape[-1]
    if lane:
        btile = (_LANES,)
        tile_states = _LANES
    else:
        s_blk = max(1, -(-block_b // _LANES))
        if not interpret:
            s_blk = max(8, -(-s_blk // 8) * 8)
        btile = (s_blk, _LANES)
        tile_states = s_blk * _LANES
    pad = (-B) % tile_states
    if pad:
        states = [jnp.pad(s, ((0, 0),) * (s.ndim - 1) + ((0, pad),))
                  for s in states]
    Bp = B + pad
    if not lane:
        S_tot = Bp // _LANES
        states = [s.reshape(s.shape[:-1] + (S_tot, _LANES)) for s in states]
        n_tiles = S_tot // btile[0]
    else:
        n_tiles = Bp // _LANES
    grid = (n_tiles, n_dirs)

    model_args = []
    for fname in _MODEL_FIELDS:
        arr = getattr(model, fname)
        if fname in ("damping", "armature"):
            model_args.append(arr[(...,) + (None,) * len(btile)])
        else:
            model_args.append(jnp.broadcast_to(
                arr[(...,) + (None,) * len(btile)], arr.shape + btile))
    n_model = len(model_args)

    def kernel(*refs):
        mrefs = refs[:n_model]
        srefs = refs[n_model:n_model + len(states)]
        (o_ref,) = refs[n_model + len(states):]
        km = _kernel_model(model, mrefs)
        d = pl.program_id(1)
        row = body(km, d, *[r[:] for r in srefs])
        o_ref[:] = row[None]

    nb = len(btile)
    in_specs = (
        [pl.BlockSpec(memory_space=pltpu.VMEM)] * n_model
        + [pl.BlockSpec(s.shape[:-nb] + btile,
                        (lambda i, d, nd=s.ndim: (0,) * (nd - nb)
                         + (i,) + (0,) * (nb - 1)),
                        memory_space=pltpu.VMEM) for s in states]
    )
    out_specs = [pl.BlockSpec(
        (1,) + row_shape + btile,
        (lambda i, d, nr=len(row_shape): (d,) + (0,) * nr
         + (i,) + (0,) * (nb - 1)),
        memory_space=pltpu.VMEM)]
    out_tail = (S_tot, _LANES) if not lane else (Bp,)
    out_shape = [jax.ShapeDtypeStruct((n_dirs,) + row_shape + out_tail,
                                      states[0].dtype)]

    (out,) = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*model_args, *states)
    out = out.reshape(out.shape[:1 + len(row_shape)] + (Bp,))
    return out[..., :B] if pad else out


def fd_hessian_vp_fused(model: RobotModel, q, qd, u, lam, gravity=-9.81,
                        block_b=None, interpret=False):
    """Fused λᵀ·∂²q̈/∂x∂x — the DDP backward-pass curvature term: q/qd/u/lam
    (n, B) → (3n, 3n, B). Raises for robots with no VMEM-valid tile
    (callers gate on :func:`vp_block` and fall back to the batch-last XLA
    path)."""
    block_b = block_b or vp_block(model.n)
    if block_b is None:
        raise ValueError(f"no VMEM-valid Hessian tile for n={model.n}; "
                         "use the batch-last path (impl='bl')")

    n, n3 = model.n, 3 * model.n
    blocks = [
        _pallas_dir_call(
            model,
            (lambda km, d, q, qd, u, lam, _w=which:
             _hess_row(km, d, q, qd, u, lam, _w, gravity)),
            [q, qd, u, lam], n, (n3,), block_b, interpret)
        for which in range(3)
    ]
    H = jnp.concatenate(blocks, axis=0)
    # direction-major (k, j, B) → (j, k, B)
    return jnp.swapaxes(H, 0, 1)


def fd_hessian_fused(model: RobotModel, q, qd, u, gravity=-9.81,
                     block_b=None, interpret=False):
    """Fused full Hessian ∂²q̈/∂x∂x: q/qd/u (n, B) → (n, 3n, 3n, B)."""
    block_b = block_b or full_block(model.n)
    if block_b is None:
        raise ValueError(f"no VMEM-valid Hessian tile for n={model.n}; "
                         "use the batch-last path (impl='bl')")

    n, n3 = model.n, 3 * model.n
    blocks = [
        _pallas_dir_call(
            model,
            (lambda km, d, q, qd, u, _w=which:
             _hess_row(km, d, q, qd, u, None, _w, gravity)),
            [q, qd, u], n, (n, n3), block_b, interpret)
        for which in range(3)
    ]
    H = jnp.concatenate(blocks, axis=0)
    # (k, i, j, B) → (i, j, k, B): tangent axis after the Jacobian indices
    return jnp.moveaxis(H, 0, 2)
