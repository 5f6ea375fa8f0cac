"""Staged large-robot Hessian pipeline (ops/kernels/so_staged.py) vs the
batch-last XLA second-order path — interpret-mode equivalence (the identical
kernel bodies the TPU lowers; Mosaic compilation is validated on hardware by
``-m tpu``).

The staged path's ∂²/∂q̇∂u and ∂²/∂u∂u blocks are EXACT zeros (analytically
zero — q̈ is affine in u and ∂ID/∂q̇ is q̈-independent); the jacfwd-based
paths carry only roundoff there, so comparisons are tolerance-based."""

import jax
import jax.numpy as jnp
import numpy as np

import gridcodegenerator_tpu as g
from gridcodegenerator_tpu.models import zoo
from gridcodegenerator_tpu.ops import so
from gridcodegenerator_tpu.ops.kernels import so_staged


def _states(n, B, seed=7, dtype=jnp.float64):
    rng = np.random.default_rng(seed)
    return tuple(jnp.asarray(rng.uniform(-1, 1, (n, B)), dtype)
                 for _ in range(4))


def _bl_ref(model, q, qd, u, lam):
    H = so.forward_dynamics_hessian_bl(model, q, qd, u, lam=lam)
    return np.asarray(H)


def test_vp_staged_matches_bl_serial():
    """Serial 7-dof (every stage exercised; fast interpret shapes)."""
    model = g.load_robot(zoo.iiwa14(damping=0.1), dtype=jnp.float64)
    q, qd, u, lam = _states(model.n, 8)
    H = np.asarray(so_staged.fd_hessian_vp_staged(model, q, qd, u, lam,
                                                  interpret=True))
    ref = _bl_ref(model, q, qd, u, lam)
    scale = max(1.0, np.abs(ref).max())
    assert np.abs(H - ref).max() / scale < 1e-11


def test_vp_staged_matches_bl_branched():
    """Branched topology (repeated moving parents): the CRBA-jvp mass
    tangent, the root-path matvec sparsity, and the column-blocked
    tangent-∂ID sparsity sets all differ from the serial case."""
    model = g.load_robot(zoo.branched_arm(), dtype=jnp.float64)
    q, qd, u, lam = _states(model.n, 8, seed=11)
    H = np.asarray(so_staged.fd_hessian_vp_staged(model, q, qd, u, lam,
                                                  interpret=True))
    ref = _bl_ref(model, q, qd, u, lam)
    scale = max(1.0, np.abs(ref).max())
    assert np.abs(H - ref).max() / scale < 1e-11


def test_vp_staged_symmetric_and_zero_blocks():
    model = g.load_robot(zoo.iiwa14(damping=0.1), dtype=jnp.float64)
    n = model.n
    q, qd, u, lam = _states(n, 4, seed=3)
    H = np.asarray(so_staged.fd_hessian_vp_staged(model, q, qd, u, lam,
                                                  interpret=True))
    scale = max(1.0, np.abs(H).max())
    assert np.abs(H - np.swapaxes(H, 0, 1)).max() / scale < 1e-11
    # exact zeros by construction (affine-in-u structure)
    assert np.abs(H[n:2 * n, 2 * n:]).max() == 0.0
    assert np.abs(H[2 * n:, n:]).max() == 0.0


def test_vp_staged_xla_fallback_matches():
    """The lax.map direction-loop fallback (working set past the lane
    budget) is the same math: force it by monkeypatching the tile plan."""
    import gridcodegenerator_tpu.ops.kernels.so_staged as mod
    model = g.load_robot(zoo.iiwa14(damping=0.1), dtype=jnp.float64)
    q, qd, u, lam = _states(model.n, 8, seed=5)
    ref = np.asarray(mod.fd_hessian_vp_staged(model, q, qd, u, lam,
                                              interpret=True))
    orig = mod._dir_stage_call

    def no_lane(model_, body, shared, per_dir, n_dirs, out_shapes,
                per_state, interpret=False):
        return orig(model_, body, shared, per_dir, n_dirs, out_shapes,
                    per_state=1e12, interpret=False)

    mod._dir_stage_call = no_lane
    try:
        # interpret=True keeps the primal stages on the interpreter;
        # the patched dir calls run the plain-XLA lax.map loop
        H = np.asarray(mod.fd_hessian_vp_staged(model, q, qd, u, lam,
                                                interpret=True))
    finally:
        mod._dir_stage_call = orig
    scale = max(1.0, np.abs(ref).max())
    assert np.abs(H - ref).max() / scale < 1e-11
