#!/usr/bin/env python
"""Example: inertial-parameter identification from joint-torque logs.

The classic system-ID workflow on the engine's regressor layer
(``ops/regressor.py``): a "real" robot (the zoo model with perturbed
inertias + damping) executes an excitation trajectory; we log (q, q̇, q̈, τ),
stack the regressor Y(q, q̇, q̈) over the log, least-squares for θ̂, and
check the identified model predicts held-out torques far better than the
nominal CAD model does.

Run:  python examples/system_id.py [--samples 120] [--cpu]
"""

import argparse
import dataclasses
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--samples", type=int, default=120)
    p.add_argument("--holdout", type=int, default=30)
    p.add_argument("--noise", type=float, default=1e-3,
                   help="torque-measurement noise std (Nm)")
    p.add_argument("--cpu", action="store_true",
                   help="pin the CPU backend (this box's sitecustomize "
                        "forces jax_platforms='axon,cpu' at interpreter "
                        "start, so the env var alone cannot opt out)")
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    import gridcodegenerator_tpu as g
    from gridcodegenerator_tpu.models import zoo
    from gridcodegenerator_tpu.ops import regressor as rg

    rng = np.random.default_rng(0)

    # nominal CAD model vs the "real" robot: +8% masses on even links,
    # CoM shifts via a first-moment perturbation, +50% damping
    nominal = g.load_robot(zoo.iiwa14(damping=0.1), dtype=jnp.float64)
    n = nominal.n
    scale = np.ones(n)
    scale[::2] = 1.08
    real_inertia = nominal.inertia * jnp.asarray(scale)[:, None, None]
    real = dataclasses.replace(nominal, inertia=real_inertia,
                               damping=nominal.damping * 1.5)

    # excitation log: random states; τ measured on the REAL robot (+noise)
    K, H = args.samples, args.holdout
    q = jnp.asarray(rng.uniform(-2.0, 2.0, (K + H, n)))
    qd = jnp.asarray(rng.uniform(-1.5, 1.5, (K + H, n)))
    qdd = jnp.asarray(rng.uniform(-6.0, 6.0, (K + H, n)))
    tau = jax.vmap(lambda a, b, c: g.inverse_dynamics(real, a, b, c))(
        q, qd, qdd)
    tau = tau + args.noise * jnp.asarray(
        rng.standard_normal(tau.shape))

    # stack the regressor over the training log (Y is model-inertia-free:
    # the NOMINAL model supplies only kinematics)
    Y = jax.vmap(lambda a, b, c: rg.joint_torque_regressor(
        nominal, a, b, c, with_damping=True))(q[:K], qd[:K], qdd[:K])
    A = Y.reshape(K * n, -1)
    b = tau[:K].reshape(K * n)
    theta_hat, *_ = jnp.linalg.lstsq(A, b)

    # held-out prediction: identified θ̂ vs the nominal CAD parameters
    theta_cad = jnp.concatenate([rg.inertial_params(nominal),
                                 nominal.damping])
    Yh = jax.vmap(lambda a, b_, c: rg.joint_torque_regressor(
        nominal, a, b_, c, with_damping=True))(q[K:], qd[K:], qdd[K:])
    pred_id = jnp.einsum("kij,j->ki", Yh, theta_hat)
    pred_cad = jnp.einsum("kij,j->ki", Yh, theta_cad)
    rms = lambda e: float(jnp.sqrt(jnp.mean(e ** 2)))
    e_id, e_cad = rms(pred_id - tau[K:]), rms(pred_cad - tau[K:])
    print(f"held-out torque RMS error: identified {e_id:.4f} Nm "
          f"vs nominal CAD {e_cad:.4f} Nm "
          f"({e_cad / max(e_id, 1e-12):.0f}x better)")
    assert e_id < 0.1 * e_cad, "identification failed to beat the CAD model"
    # identified damping is directly identifiable — compare element-wise
    d_hat = np.asarray(theta_hat[-n:])
    print("identified damping:", np.round(d_hat, 4),
          "(true 0.15, CAD 0.10)")


if __name__ == "__main__":
    main()
