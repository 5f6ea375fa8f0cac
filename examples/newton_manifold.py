#!/usr/bin/env python
"""Example: Newton's method ON the configuration manifold with the
tangent-space Hessian family (``ops/so_md.py``).

Two demonstrations on a free-floating iiwa-14 (quaternion base, nv=13):

**Part 1 — the chart-composition correction is load-bearing.** The true
Hessian of the pullback h(δ) = λᵀ·q̈(q ⊕ δ) at δ=0 is what
``md_forward_dynamics_hessian_vp`` computes; the *naive* object — jacfwd
of the analytic tangent-space gradient re-evaluated at the retracted
point — differs at first order on the quaternion columns because the
charts at q and q ⊕ δ compose nonlinearly. Both are compared against a
central second-difference of the scalar pullback itself: the corrected
Hessian matches to the f64-FD floor; the naive object carries O(1)
errors and is asymmetric.

**Part 2 — full Newton beats Gauss-Newton when the residual does not
vanish.** Nonzero-residual acceleration shaping restricted to the base:
find the base pose (6 tangent coordinates) minimizing

    L(z) = ½ ‖q̈(q ⊕ E z, q̇, u) − q̈ᵗᵃʳ‖²            (13 residuals)

with q̈ᵗᵃʳ unreachable by base motion alone, so ‖r*‖ > 0 at the
minimizer. (The restriction is the point: with a square Jacobian any
target is locally reachable and the "nonzero residual" regime never
exists.) Gauss-Newton drops the curvature term Σᵢ rᵢ·∇²q̈ᵢ, which is
O(‖r‖) — bounding it to a linear rate exactly when the residual
survives — while full Newton (H = JᵀJ + the restricted q-block of
``md_forward_dynamics_hessian_vp`` with λ = r) converges quadratically.

Run:  python examples/newton_manifold.py --cpu [--iters 20]
"""

import argparse
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--cpu", action="store_true",
                   help="pin the CPU backend (this box's sitecustomize "
                        "forces jax_platforms='axon,cpu' at interpreter "
                        "start, so the env var alone cannot opt out)")
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)  # rate comparison needs f64
    import jax.numpy as jnp

    import gridcodegenerator_tpu as g
    from gridcodegenerator_tpu.models import zoo
    from gridcodegenerator_tpu.ops import multidof as md
    from gridcodegenerator_tpu.ops import so_md

    mdm = md.multidof_model_from_description(
        g.parse_urdf(zoo.with_free_joint(zoo.iiwa14(damping=0.1))),
        dtype=jnp.float64)
    nv, m = mdm.nv, 6          # optimize the 6 base tangent coordinates
    rng = np.random.default_rng(4)

    q0 = md.md_tangent_apply(mdm, md.neutral_q(mdm),
                             jnp.asarray(rng.uniform(-0.5, 0.5, nv)))
    qd = jnp.asarray(rng.uniform(-0.5, 0.5, nv))
    u = jnp.asarray(rng.uniform(-1.0, 1.0, nv))

    # ---- Part 1: corrected vs naive Hessian against finite differences
    lam = jnp.asarray(rng.normal(size=nv))

    def pullback(delta):
        return lam @ md.md_forward_dynamics(
            mdm, md.md_tangent_apply(mdm, q0, delta), qd, u)

    H_true = so_md.md_forward_dynamics_hessian_vp(
        mdm, q0, qd, u, lam)[:nv, :nv]

    def grad_naive_full(delta):
        qz = md.md_tangent_apply(mdm, q0, delta)
        Jq, _, _ = md.md_forward_dynamics_gradient(mdm, qz, qd, u)
        return lam @ Jq

    H_naive = jax.jacfwd(grad_naive_full)(jnp.zeros(nv, jnp.float64))

    eps = 1e-4
    eye = np.eye(nv)
    H_fd = np.zeros((nv, nv))
    for i in range(nv):
        for j in range(i + 1):
            hpp = pullback(jnp.asarray(eps * (eye[i] + eye[j])))
            hpm = pullback(jnp.asarray(eps * (eye[i] - eye[j])))
            hmp = pullback(jnp.asarray(eps * (-eye[i] + eye[j])))
            hmm = pullback(jnp.asarray(-eps * (eye[i] + eye[j])))
            H_fd[i, j] = H_fd[j, i] = float(
                (hpp - hpm - hmp + hmm) / (4 * eps * eps))
    scale = float(np.abs(H_fd).max())
    err_true = float(np.abs(np.asarray(H_true) - H_fd).max()) / scale
    err_naive = float(np.abs(np.asarray(H_naive) - H_fd).max()) / scale
    asym = float(np.abs(np.asarray(H_naive - H_naive.T)).max()) / scale
    print("Part 1 — pullback Hessian vs central finite differences "
          f"(free-iiwa, nv={nv}, rel to |H|max={scale:.3g}):")
    print(f"  so_md (chart-corrected): max rel err {err_true:.2e}")
    print(f"  naive jacfwd-of-gradient: max rel err {err_naive:.2e}, "
          f"asymmetry {asym:.2e}")
    assert err_true < 1e-6 and err_naive > 1e-3 * max(err_true, 1e-12), \
        "the chart correction should separate the two objects by decades"

    # ---- Part 2: Gauss-Newton vs full Newton, nonzero residual
    # unreachable target: acceleration at a nearby base pose plus an
    # offset that base motion alone cannot produce
    z_star = jnp.zeros(nv).at[:m].set(jnp.asarray(rng.uniform(-0.2, 0.2, m)))
    qdd_star = md.md_forward_dynamics(
        mdm, md.md_tangent_apply(mdm, q0, z_star), qd, u)
    qdd_star = qdd_star + jnp.asarray(rng.normal(0.0, 0.3, nv))

    @jax.jit
    def residual_and_grad(q):
        r = md.md_forward_dynamics(mdm, q, qd, u) - qdd_star
        Jq, _, _ = md.md_forward_dynamics_gradient(mdm, q, qd, u)
        return r, Jq[:, :m]

    @jax.jit
    def curvature(q, r):
        # λᵀ·∂²q̈/∂δ∂δ restricted to the base block, λ = r: the term
        # Gauss-Newton drops — O(‖r‖), so it matters exactly when the
        # residual does not vanish
        return so_md.md_forward_dynamics_hessian_vp(mdm, q, qd, u, r)[
            :m, :m]

    def loss(q):
        r = md.md_forward_dynamics(mdm, q, qd, u) - qdd_star
        return 0.5 * float(r @ r)

    def embed(z):
        return jnp.zeros(nv, jnp.float64).at[:m].set(z)

    def run(mode):
        q = q0
        gnorms = []
        for _ in range(args.iters):
            r, JE = residual_and_grad(q)
            grad = jnp.asarray(JE).T @ r
            gnorms.append(float(jnp.linalg.norm(grad)))
            H = jnp.asarray(JE).T @ JE
            if mode == "newton":
                H = H + curvature(q, r)
            # classical globalization: shift to PSD (trust the model only
            # where convex), then Armijo backtracking on L — both inactive
            # near the solution, so the asymptotic rate is the method's own
            ev_min = float(jnp.linalg.eigvalsh(H)[0])
            if ev_min < 1e-9:
                H = H + (1e-9 - ev_min) * jnp.eye(m)
            step = jnp.linalg.solve(H, -grad)
            L0 = 0.5 * float(r @ r)
            t = 1.0
            for _ls in range(30):
                q_try = md.md_tangent_apply(mdm, q, embed(t * step))
                if loss(q_try) <= L0 + 1e-4 * t * float(grad @ step):
                    break
                t *= 0.5
            q = q_try
        return gnorms

    runs = {mm: run(mm) for mm in ("gauss-newton", "newton")}
    print(f"\nPart 2 — base-pose acceleration shaping, nonzero residual "
          f"({m} vars / {nv} residuals), ‖∇L‖ per iteration:")
    print(f"{'iter':>4}  {'Gauss-Newton':>14}  {'Newton (so_md)':>14}")
    for k in range(args.iters):
        print(f"{k:>4}  {runs['gauss-newton'][k]:>14.3e}  "
              f"{runs['newton'][k]:>14.3e}")

    tol = 1e-11
    its = {mm: next((k for k, v in enumerate(h) if v < tol), args.iters)
           for mm, h in runs.items()}
    print(f"\niters to ‖∇L‖ < {tol:g}: Newton {its['newton']}, "
          f"Gauss-Newton {its['gauss-newton']}")
    assert its["newton"] < its["gauss-newton"], \
        "full Newton should beat Gauss-Newton on a nonzero-residual problem"
    print("quadratic tail confirmed: the so_md curvature term restores "
          "Newton's rate where Gauss-Newton is bound to a linear one")


if __name__ == "__main__":
    main()
