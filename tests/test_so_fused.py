"""Fused second-order kernels (``ops/kernels/so_fused.py``): interpret-mode
equivalence against the batch-last XLA formulation (``ops/so.py``), which is
itself pinned to nested AD of the primal in ``test_so.py`` — the same
two-hop validation chain every first-order fused kernel uses
(kernel == XLA batch-last == golden/AD)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gridcodegenerator_tpu.ops import so
from gridcodegenerator_tpu.ops.kernels import so_fused

from conftest import get_setup

pytestmark = pytest.mark.mid


def _bl_states(n, B, seed):
    rng = np.random.default_rng(seed)
    return tuple(jnp.asarray(rng.uniform(-1, 1, (n, B)), jnp.float32)
                 for _ in range(4))


@pytest.mark.parametrize("name", ["iiwa14", "barm"])
def test_hessian_vp_fused_matches_bl(name):
    """λᵀ·H kernel (interpret) == batch-last linearize path, f32, on a
    serial and a repeated-moving-parent topology."""
    _, _, model = get_setup(name)
    m = model.astype(jnp.float32)
    q, qd, u, lam = _bl_states(m.n, 8, seed=7)
    H_bl = so.forward_dynamics_hessian_bl(m, q, qd, u, lam=lam)
    H_k = so_fused.fd_hessian_vp_fused(m, q, qd, u, lam, interpret=True)
    assert H_k.shape == H_bl.shape == (3 * m.n, 3 * m.n, 8)
    # scale-aware atol: the kernel recomputes the primal per direction
    # (jvp) where the bl path shares one linearize — different f32
    # rounding on near-cancellation elements, proportional to the
    # Hessian's magnitude (measured ~5e-8·scale; 10x headroom)
    scale = float(np.abs(np.asarray(H_bl)).max())
    np.testing.assert_allclose(np.asarray(H_k), np.asarray(H_bl),
                               atol=5e-7 * scale, rtol=1e-4)


def test_hessian_full_fused_matches_bl():
    _, _, model = get_setup("iiwa14")
    m = model.astype(jnp.float32)
    q, qd, u, _ = _bl_states(m.n, 8, seed=9)
    H_bl = so.forward_dynamics_hessian_bl(m, q, qd, u)
    H_k = so_fused.fd_hessian_fused(m, q, qd, u, interpret=True)
    assert H_k.shape == H_bl.shape == (m.n, 3 * m.n, 3 * m.n, 8)
    scale = float(np.abs(np.asarray(H_bl)).max())
    np.testing.assert_allclose(np.asarray(H_k), np.asarray(H_bl),
                               atol=5e-7 * scale, rtol=1e-4)


def test_block_sizing_feasibility():
    """Routing gates: iiwa (n=7) gets a 2-D tile, n=12 falls to the lane
    tier, Atlas (n=28) has no kernel (batch-last path)."""
    assert isinstance(so_fused.vp_block(7), int)
    assert so_fused.vp_block(12) == "lane"
    assert so_fused.vp_block(28) is None
    assert so_fused.full_block(28) is None
