"""Implicit-function-theorem gradients through the frictional contact
solver — ops/contact.py ``implicit_diff`` / ``diff_mode="implicit"``.

The PGS cone solve converges to a fixed point p* = T(p*, θ); the IFT path
(``_pgs_implicit``) differentiates THAT equation instead of unrolling the
stored sweeps. Validation (float64, CPU):

1. forward values are bit-identical to the plain solver (same iteration);
2. gradients w.r.t. (G, b, μ) match the unrolled-AD gradients once both
   are converged — separately in the sticking regime (interior cone,
   μ-gradient structurally zero) and the sliding regime (saturated cone,
   μ-gradient nonzero), and against central finite differences;
3. the batch-last solver's implicit gradients match vmapped single-state;
4. a full ground-contact step with ``diff_mode="implicit"`` is end-to-end
   reverse-differentiable: ∂(next state)/∂(τ, μ) matches finite
   differences of the stepper on a standing quadruped (feet in contact,
   mixed stick/slide);
5. joint-limit impulse rows (m normal-only rows) differentiate too;
6. a multi-step BPTT rollout gradient matches the unrolled-mode gradient.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gridcodegenerator_tpu as g
from gridcodegenerator_tpu.models import zoo
from gridcodegenerator_tpu.ops import contact as ct
from gridcodegenerator_tpu.ops import freeflyer as ff

_FEET = (2, 5, 8, 11)
_FOOT_OFF = np.tile(np.array([0.35, 0.0, 0.0]), (4, 1))


def _spd(rng, rows, reg=4.0):
    A = rng.normal(size=(rows, rows))
    return jnp.asarray(A @ A.T + reg * np.eye(rows))


def _cone_problem(regime: str, k=3, seed=0):
    """A (G, b, mu, active) whose solution sits in the requested regime."""
    rng = np.random.default_rng(seed)
    G = _spd(rng, 3 * k)
    if regime == "sticking":
        # mild tangential, strong push into the ground: interior cone
        b = jnp.asarray(np.tile([0.3, -0.2, -4.0], k) * rng.uniform(
            0.8, 1.2, 3 * k))
        mu = jnp.asarray(rng.uniform(0.8, 1.2, k))
    else:
        # strong tangential pull, mild normal: saturated (sliding) cone
        b = jnp.asarray(np.tile([-5.0, 2.5, -0.8], k) * rng.uniform(
            0.8, 1.2, 3 * k))
        mu = jnp.asarray(rng.uniform(0.3, 0.5, k))
    return G, b, mu, jnp.ones(k)


@pytest.mark.parametrize("regime", ["sticking", "sliding"])
def test_pgs_implicit_forward_identical(regime):
    G, b, mu, active = _cone_problem(regime)
    p_u = ct.pgs_solve(G, b, mu, active, iters=150)
    p_i = ct.pgs_solve(G, b, mu, active, iters=150, implicit_diff=True)
    np.testing.assert_array_equal(np.asarray(p_u), np.asarray(p_i))
    # regime sanity: saturation ratio ‖p_t‖/(μ p_n)
    pn = p_i[2::3]
    sat = jnp.sqrt(p_i[0::3] ** 2 + p_i[1::3] ** 2) / (mu * pn)
    if regime == "sliding":
        assert float(jnp.min(sat)) > 0.999
    else:
        assert float(jnp.max(sat)) < 0.95


@pytest.mark.parametrize("regime", ["sticking", "sliding"])
def test_pgs_implicit_grad_matches_unroll_and_fd(regime):
    """IFT gradients == unrolled-AD gradients == finite differences, in
    both cone regimes (the sliding case exercises the μ-dependence)."""
    G, b, mu, active = _cone_problem(regime, seed=1)
    rng = np.random.default_rng(7)
    w = jnp.asarray(rng.normal(size=b.shape[0]))

    def loss(G_, b_, mu_, implicit):
        return w @ ct.pgs_solve(G_, b_, mu_, active, iters=300,
                                implicit_diff=implicit)

    gu = jax.grad(lambda *a: loss(*a, False), argnums=(0, 1, 2))(G, b, mu)
    gi = jax.grad(lambda *a: loss(*a, True), argnums=(0, 1, 2))(G, b, mu)
    for a, c in zip(gu, gi):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   atol=1e-12, rtol=1e-10)
    if regime == "sliding":
        assert float(jnp.max(jnp.abs(gi[2]))) > 1e-3  # μ matters here
    # spot finite differences on b and mu
    eps = 1e-6
    for j in (0, 4):
        fd = (loss(G, b.at[j].add(eps), mu, False)
              - loss(G, b.at[j].add(-eps), mu, False)) / (2 * eps)
        np.testing.assert_allclose(float(gi[1][j]), float(fd), atol=1e-6)
    for j in range(mu.shape[0]):
        fd = (loss(G, b, mu.at[j].add(eps), False)
              - loss(G, b, mu.at[j].add(-eps), False)) / (2 * eps)
        np.testing.assert_allclose(float(gi[2][j]), float(fd), atol=1e-6)


def test_pgs_bl_implicit_matches_single():
    """Batch-last implicit gradients == vmapped single-state implicit
    gradients (and forwards equal), on a mixed stick/slide batch."""
    k, B = 2, 5
    rng = np.random.default_rng(3)
    Gs = jnp.stack([_spd(rng, 3 * k) for _ in range(B)])       # (B,3k,3k)
    bs = jnp.asarray(rng.normal(size=(B, 3 * k)) * 3.0)
    mu = jnp.asarray(rng.uniform(0.3, 1.0, k))
    active = jnp.ones((k, B))
    w = jnp.asarray(rng.normal(size=3 * k))

    G_bl = jnp.moveaxis(Gs, 0, -1)
    b_bl = bs.T

    def loss_bl(G_, b_, mu_):
        p = ct.pgs_solve_bl(G_, b_, mu_, active, iters=200,
                            implicit_diff=True)
        return jnp.sum(w @ p)

    def loss_single(G_, b_, mu_):
        f = lambda Gi, bi: w @ ct.pgs_solve(Gi, bi, mu_, jnp.ones(k),
                                            iters=200, implicit_diff=True)
        return jnp.sum(jax.vmap(f)(G_, b_))

    p_bl = ct.pgs_solve_bl(G_bl, b_bl, mu, active, iters=200,
                           implicit_diff=True)
    p_single = jax.vmap(lambda Gi, bi: ct.pgs_solve(
        Gi, bi, mu, jnp.ones(k), iters=200))(Gs, bs)
    np.testing.assert_allclose(np.asarray(p_bl.T), np.asarray(p_single),
                               atol=1e-12)

    g_bl = jax.grad(loss_bl, argnums=(0, 1, 2))(G_bl, b_bl, mu)
    g_s = jax.grad(loss_single, argnums=(0, 1, 2))(Gs, bs, mu)
    np.testing.assert_allclose(np.asarray(jnp.moveaxis(g_bl[0], -1, 0)),
                               np.asarray(g_s[0]), atol=1e-11)
    np.testing.assert_allclose(np.asarray(g_bl[1].T), np.asarray(g_s[1]),
                               atol=1e-11)
    np.testing.assert_allclose(np.asarray(g_bl[2]), np.asarray(g_s[2]),
                               atol=1e-11)


def _standing_quadruped(lateral_v=0.3):
    """HyQ standing on the plane with a lateral push (mixed stick/slide)."""
    ffm = ff.free_flyer_model(g.parse_urdf(zoo.hyq(damping=0.2)),
                              dtype=jnp.float64)
    n = ffm.n
    quat0 = jnp.array([1.0, 0.0, 0.0, 0.0], jnp.float64)
    q0 = jnp.asarray(np.tile([-0.1, 0.7, -1.2], 4), jnp.float64)
    foot_z = min(
        float(ct._fb_point_base(ffm, q0, l, jnp.asarray(_FOOT_OFF[i]))[0][2])
        for i, l in enumerate(_FEET))
    pos0 = jnp.array([0.0, 0.0, -foot_z], jnp.float64)
    vb0 = jnp.zeros(6, jnp.float64).at[3].set(lateral_v)
    state = (quat0, pos0, q0, vb0, jnp.zeros(n, jnp.float64))
    return ffm, state


@pytest.mark.mid
def test_step_ground_implicit_grad_vs_fd():
    """One implicit-diff ground step on a standing HyQ: reverse-mode
    ∂loss/∂τ and ∂loss/∂μ match central finite differences of the
    stepper itself — the full chain (dynamics → Delassus → cone solve →
    integration) differentiates correctly, not just the PGS node."""
    ffm, state = _standing_quadruped()
    n = ffm.n
    dt = 2e-3
    tau0 = jnp.zeros(n, jnp.float64)
    mu0 = jnp.asarray(0.6, jnp.float64)
    rng = np.random.default_rng(5)
    w = {k_: jnp.asarray(rng.normal(size=s), jnp.float64)
         for k_, s in (("pos", 3), ("vb", 6), ("qd", n))}

    def loss(tau, mu):
        (quat2, pos2, q2, vb2, qd2), _ = ct.fb_step_ground(
            ffm, state, tau, dt, _FEET, _FOOT_OFF, mu=mu, iters=120,
            diff_mode="implicit")
        return w["pos"] @ pos2 + w["vb"] @ vb2 + w["qd"] @ qd2

    g_tau, g_mu = jax.grad(loss, argnums=(0, 1))(tau0, mu0)
    assert bool(jnp.all(jnp.isfinite(g_tau))) and bool(jnp.isfinite(g_mu))
    eps = 1e-6
    for j in (0, 5, 11):
        fd = (loss(tau0.at[j].add(eps), mu0)
              - loss(tau0.at[j].add(-eps), mu0)) / (2 * eps)
        np.testing.assert_allclose(float(g_tau[j]), float(fd),
                                   rtol=1e-5, atol=1e-8)
    fd_mu = (loss(tau0, mu0 + eps) - loss(tau0, mu0 - eps)) / (2 * eps)
    np.testing.assert_allclose(float(g_mu), float(fd_mu),
                               rtol=1e-5, atol=1e-8)
    # the lateral push makes friction load-bearing: μ must matter
    assert abs(float(g_mu)) > 1e-4


def test_step_ground_batched_implicit_matches_unroll():
    """Batched stepper: diff_mode='implicit' gradient == diff_mode='unroll'
    gradient (both converged), and the forward states agree."""
    ffm, state = _standing_quadruped()
    n = ffm.n
    B = 3
    rng = np.random.default_rng(11)
    batch = tuple(jnp.stack([s] * B) for s in state)
    taus = jnp.asarray(rng.normal(size=(B, n)) * 2.0, jnp.float64)
    w = jnp.asarray(rng.normal(size=(B, 3)), jnp.float64)

    def loss(tau, mode):
        (quat2, pos2, q2, vb2, qd2), _ = ct.fb_step_ground_batched(
            ffm, batch, tau, 2e-3, _FEET, _FOOT_OFF, mu=0.6, iters=100,
            impl="xla", diff_mode=mode)
        return jnp.sum(w * pos2) + jnp.sum(vb2 ** 2)

    lu, gu = jax.value_and_grad(lambda t: loss(t, "unroll"))(taus)
    li, gi = jax.value_and_grad(lambda t: loss(t, "implicit"))(taus)
    np.testing.assert_allclose(float(lu), float(li), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(gu), np.asarray(gi),
                               rtol=1e-8, atol=1e-10)


def test_limit_rows_implicit_grad():
    """Implicit diff through a (3k+m)-row system with trailing normal-only
    joint-limit rows: IFT gradients == unrolled gradients == finite
    differences, with some limit impulses active (λ > 0) and some clamped
    at zero."""
    k, m = 2, 3
    rows = 3 * k + m
    rng = np.random.default_rng(9)
    G = _spd(rng, rows)
    # contacts pushed into the ground; one limit row driven positive, one
    # driven hard negative (stays clamped at 0), one mild
    b = jnp.asarray(np.concatenate([np.tile([0.4, -0.3, -3.0], k),
                                    [-2.0, 3.0, -0.5]]))
    mu = jnp.asarray([0.6, 0.8])
    active = jnp.ones(k)
    lim_active = jnp.ones(m)
    w = jnp.asarray(rng.normal(size=rows))

    p = ct.pgs_solve(G, b, mu, active, iters=300, lim_active=lim_active)
    lam = np.asarray(p[3 * k:])
    assert lam.min() == 0.0 and lam.max() > 1e-2   # mixed active/clamped

    def loss(G_, b_, implicit):
        return w @ ct.pgs_solve(G_, b_, mu, active, iters=300,
                                lim_active=lim_active,
                                implicit_diff=implicit)

    gu = jax.grad(lambda *a: loss(*a, False), argnums=(0, 1))(G, b)
    gi = jax.grad(lambda *a: loss(*a, True), argnums=(0, 1))(G, b)
    np.testing.assert_allclose(np.asarray(gu[0]), np.asarray(gi[0]),
                               atol=1e-11)
    np.testing.assert_allclose(np.asarray(gu[1]), np.asarray(gi[1]),
                               atol=1e-11)
    eps = 1e-6
    for j in (3 * k, 3 * k + 1, 2):            # limit rows + a contact row
        fd = (loss(G, b.at[j].add(eps), False)
              - loss(G, b.at[j].add(-eps), False)) / (2 * eps)
        np.testing.assert_allclose(float(gi[1][j]), float(fd), atol=1e-6)


@pytest.mark.mid
def test_bptt_rollout_implicit_matches_unroll():
    """8-step BPTT through ground contact: scan + implicit-diff steps give
    the same ∂loss/∂(feed-forward τ) as the unrolled mode — the training
    gradient a policy-learning loop would consume."""
    ffm, state = _standing_quadruped(lateral_v=0.2)
    n = ffm.n
    T = 8

    def rollout_loss(tau_ff, mode):
        def step(s, _):
            nxt, _ = ct.fb_step_ground(ffm, s, tau_ff, 2e-3, _FEET,
                                       _FOOT_OFF, mu=0.7, iters=80,
                                       diff_mode=mode)
            return nxt, None
        (quatT, posT, qT, vbT, qdT), _ = jax.lax.scan(
            step, state, None, length=T)
        return jnp.sum(vbT ** 2) + 10.0 * (posT[2] - 0.6) ** 2

    gu = jax.grad(lambda t: rollout_loss(t, "unroll"))(jnp.zeros(n))
    gi = jax.grad(lambda t: rollout_loss(t, "implicit"))(jnp.zeros(n))
    assert bool(jnp.all(jnp.isfinite(gi)))
    np.testing.assert_allclose(np.asarray(gu), np.asarray(gi),
                               rtol=1e-6, atol=1e-9)
