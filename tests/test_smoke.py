"""Smoke tier: `pytest -m smoke` — under a minute on one CPU core.

The minimal independent health check of the whole stack (the analog of the
reference's "compile the header and eyeball one number" workflow): URDF
parsing, the float64 NumPy golden model's physics invariants, and one jitted
parity check per algorithm family on a tiny robot (double pendulum, n=2, so
the unrolled graphs compile in seconds even cold on one core).
"""

import numpy as np
import pytest

import gridcodegenerator_tpu as g
from gridcodegenerator_tpu.models import zoo

pytestmark = pytest.mark.smoke


@pytest.fixture(scope="module")
def dpend():
    import jax.numpy as jnp
    desc = g.parse_urdf(zoo.double_pendulum())
    return desc, g.GoldenDynamics(desc), g.robot_model_from_description(
        desc, dtype=jnp.float64)


def test_parser_smoke():
    desc = g.parse_urdf(zoo.iiwa14(damping=0.2))
    assert desc.n == 7 and desc.topology.is_serial_chain
    barm = g.parse_urdf(zoo.branched_arm())
    assert barm.n == 9 and not barm.topology.is_serial_chain
    assert barm.topology.level_has_repeated_parents(1)


def test_golden_physics_smoke():
    """Golden model invariants: M⁻¹·M_CRBA = I and ID∘FD round trip."""
    desc = g.parse_urdf(zoo.iiwa14(damping=0.1))
    gold = g.GoldenDynamics(desc)
    rng = np.random.default_rng(7)
    q = rng.uniform(-1.5, 1.5, 7)
    qd = rng.uniform(-1, 1, 7)
    u = rng.uniform(-5, 5, 7)
    np.testing.assert_allclose(gold.minv(q, True) @ gold.crba(q), np.eye(7),
                               atol=1e-9)
    qdd = gold.fd(q, qd, u)
    c, *_ = gold.rnea(q, qd, qdd)
    np.testing.assert_allclose(c, u, atol=1e-9)


def test_jitted_parity_per_algorithm(dpend):
    """One batched+jitted parity check per algorithm family (n=2, B=4)."""
    desc, gold, model = dpend
    rng = np.random.default_rng(3)
    B, n = 4, desc.n
    q = rng.uniform(-1, 1, (B, n))
    qd = rng.uniform(-1, 1, (B, n))
    u = rng.uniform(-2, 2, (B, n))
    qdd = rng.uniform(-1, 1, (B, n))

    checks = {
        "id": (np.asarray(g.inverse_dynamics(model, q, qd, qdd)),
               lambda k: gold.rnea(q[k], qd[k], qdd[k])[0]),
        "minv": (np.asarray(g.direct_minv(model, q, dense=True)),
                 lambda k: gold.minv(q[k], True)),
        "fd": (np.asarray(g.forward_dynamics(model, q, qd, u)),
               lambda k: gold.fd(q[k], qd[k], u[k])),
        "id_grad": (np.asarray(g.inverse_dynamics_gradient(model, q, qd, qdd)),
                    lambda k: np.hstack(gold.rnea_grad(q[k], qd[k], qdd[k]))),
        "fd_grad": (np.asarray(g.forward_dynamics_gradient(model, q, qd, u)),
                    lambda k: gold.fd_grad(q[k], qd[k], u[k])),
    }
    for name, (got, ref_fn) in checks.items():
        for k in range(B):
            np.testing.assert_allclose(got[k], ref_fn(k), atol=1e-9,
                                       err_msg=name)
