"""Heightfield terrain for the unilateral contact steppers.

The reference engine has no contact layer at all (its scope ends at the
dynamics gradients — see SURVEY.md §2); the flat-plane steppers in
``ops/contact.py`` already exceed it. This module generalizes the ground
from ``z = ground_z`` to a bilinear heightfield ``z = h(x, y)`` — the
uneven-terrain setting every legged-RL workload actually trains on —
while keeping every property the steppers rely on:

* **jit/vmap/AD-friendly**: height, gradient, and contact frames are
  closed-form in the node heights and the query point. Gradients flow
  both ways — ∂(step)/∂(query x, y) for BPTT, and ∂(step)/∂(heights)
  for terrain identification / adaptation (4 gathered nodes per query).
* **batch-last native**: every function is elementwise in the query, so
  the (B,)-lane layout of the batched steppers passes straight through;
  the only non-elementwise ops are 4 small gathers per contact.
* **C⁰ surface with piecewise-C⁰ gradient**: bilinear per cell, LINEAR
  extrapolation outside the grid (the edge cell's form continues), so h
  and ∇h stay consistent everywhere — no clamped-height/nonzero-slope
  mismatch at the boundary.

Layout convention: ``heights[i, j]`` is the node at world
``(x0 + i·cell, y0 + j·cell)`` — x-major, matching ``meshgrid(...,
indexing='ij')``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class Terrain(NamedTuple):
    """A square-cell bilinear heightfield.

    heights: (Hx, Wy) node heights (array; differentiable leaf)
    origin:  (2,) world (x, y) of node [0, 0]
    cell:    node spacing in meters (static Python float)
    """
    heights: jnp.ndarray
    origin: jnp.ndarray
    cell: float


def make_terrain(heights, origin=(0.0, 0.0), cell: float = 0.1,
                 dtype=jnp.float32) -> Terrain:
    h = jnp.asarray(heights, dtype)
    if h.ndim != 2 or h.shape[0] < 2 or h.shape[1] < 2:
        raise ValueError(f"heights must be (Hx>=2, Wy>=2), got {h.shape}")
    return Terrain(h, jnp.asarray(origin, dtype), float(cell))


# -------------------------------------------------------------------------
# height + gradient + frames (elementwise in the query; any shape, incl.
# the batched steppers' (B,)-lane layout)
# -------------------------------------------------------------------------
def terrain_height_grad(terr: Terrain, x, y):
    """(h, ∂h/∂x, ∂h/∂y) of the bilinear surface at world (x, y).

    Inside a cell the surface is h = (1−fu)(1−fv)·h00 + fu(1−fv)·h10 +
    (1−fu)fv·h01 + fu·fv·h11 with fu, fv the in-cell fractions; outside
    the grid the nearest edge cell's bilinear form continues (fu/fv run
    past [0, 1] → linear extrapolation, gradient-consistent)."""
    H, W = terr.heights.shape
    cell = terr.cell
    u = (x - terr.origin[0]) / cell
    v = (y - terr.origin[1]) / cell
    iu = jnp.clip(jnp.floor(u), 0, H - 2).astype(jnp.int32)
    iv = jnp.clip(jnp.floor(v), 0, W - 2).astype(jnp.int32)
    fu = u - iu
    fv = v - iv
    flat = terr.heights.reshape(-1)
    idx = iu * W + iv
    h00 = jnp.take(flat, idx)
    h10 = jnp.take(flat, idx + W)
    h01 = jnp.take(flat, idx + 1)
    h11 = jnp.take(flat, idx + W + 1)
    h = ((1 - fu) * (1 - fv) * h00 + fu * (1 - fv) * h10
         + (1 - fu) * fv * h01 + fu * fv * h11)
    hx = ((1 - fv) * (h10 - h00) + fv * (h11 - h01)) / cell
    hy = ((1 - fu) * (h01 - h00) + fu * (h11 - h10)) / cell
    return h, hx, hy


def terrain_surface(terr: Terrain, x, y):
    """(h, n) at world (x, y): height and the unit upward surface normal
    n = [−hx, −hy, 1]/‖·‖, stacked on a LEADING axis of 3 (so the
    steppers' batch-last (B,) queries give n of shape (3, B))."""
    h, hx, hy = terrain_height_grad(terr, x, y)
    inv = 1.0 / jnp.sqrt(hx * hx + hy * hy + 1.0)
    return h, jnp.stack([-hx * inv, -hy * inv, inv])


def contact_frame(nrm):
    """Orthonormal right-handed contact frame rows C = [t1; t2; n] from a
    unit normal with n_z > 0 (always true for a heightfield): t1 ∝ e_y×n
    = [n_z, 0, −n_x] (degenerate only at n_z = 0), t2 = n × t1. ``nrm``
    is (3, ...) leading-axis; returns (3, 3, ...) with C[r] the r-th row
    — built so that for n = +e_z it is exactly the identity (the flat
    stepper's [x, y, z] rows)."""
    nx, ny, nz = nrm[0], nrm[1], nrm[2]
    it = 1.0 / jnp.sqrt(nz * nz + nx * nx)
    t1 = jnp.stack([nz * it, jnp.zeros_like(nz), -nx * it])
    # t2 = n × t1
    t2 = jnp.stack([ny * t1[2] - nz * t1[1],
                    nz * t1[0] - nx * t1[2],
                    nx * t1[1] - ny * t1[0]])
    return jnp.stack([t1, t2, nrm])


# -------------------------------------------------------------------------
# builders (tests / examples)
# -------------------------------------------------------------------------
def _grid(extent: float, cell: float):
    """Node axis over [−extent, extent] and the REALIZED spacing (the
    requested cell rounded so the span divides evenly — the Terrain must
    carry the spacing the nodes actually have)."""
    m = max(2, int(round(2 * extent / cell))) + 1
    ax = np.linspace(-extent, extent, m)
    return ax, 2 * extent / (m - 1)


def flat_terrain(height: float = 0.0, extent: float = 4.0,
                 cell: float = 0.5, dtype=jnp.float32) -> Terrain:
    ax, cell = _grid(extent, cell)
    m = ax.shape[0]
    return make_terrain(np.full((m, m), height), (-extent, -extent), cell,
                        dtype)


def slope_terrain(grade_x: float = 0.2, grade_y: float = 0.0,
                  extent: float = 4.0, cell: float = 0.5,
                  dtype=jnp.float32) -> Terrain:
    """Inclined plane z = grade_x·x + grade_y·y (exactly representable by
    the bilinear surface, so the normal is exact everywhere)."""
    ax, cell = _grid(extent, cell)
    X, Y = np.meshgrid(ax, ax, indexing="ij")
    return make_terrain(grade_x * X + grade_y * Y, (-extent, -extent),
                        cell, dtype)


def bumpy_terrain(amp: float = 0.05, wavelength: float = 0.8,
                  extent: float = 4.0, cell: float = 0.1, seed: int = 0,
                  rough: float = 0.0, dtype=jnp.float32) -> Terrain:
    """Sinusoidal egg-carton bumps plus optional uniform node noise."""
    ax, cell = _grid(extent, cell)
    X, Y = np.meshgrid(ax, ax, indexing="ij")
    w = 2 * np.pi / wavelength
    h = amp * np.sin(w * X) * np.sin(w * Y)
    if rough > 0.0:
        h = h + np.random.default_rng(seed).uniform(-rough, rough, h.shape)
    return make_terrain(h, (-extent, -extent), cell, dtype)
