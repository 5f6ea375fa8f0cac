"""Batch-last implementations and fused Pallas kernels (interpret mode) vs
the golden model — the 'Pallas-vs-pure-jnp equivalence' leg of the test
strategy (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import get_setup, random_state
from gridcodegenerator_tpu.ops import blops
from gridcodegenerator_tpu.ops.kernels import fused

ROBOTS = ["iiwa14", "hyq", "chain5p"]


@pytest.fixture(params=ROBOTS)
def bl_setup(request):
    desc, gold, model = get_setup(request.param)
    B = 5
    q, qd, u = random_state(desc.n, seed=71, batch=(B,))
    return desc, gold, model, q.T, qd.T, u.T  # batch-last (n, B)


def _check_cols(gold_fn, got, q, qd, u, tol):
    B = q.shape[-1]
    for k in range(B):
        ref = gold_fn(q[:, k], qd[:, k], u[:, k])
        np.testing.assert_allclose(np.asarray(got)[..., k], ref, atol=tol)


def test_blops_rnea(bl_setup):
    desc, gold, model, q, qd, u = bl_setup
    c, v, a, f = jax.jit(lambda *s: blops.rnea_bl(model, *s))(
        jnp.asarray(q), jnp.asarray(qd), jnp.asarray(u))
    _check_cols(lambda a_, b_, c_: gold.rnea(a_, b_, c_)[0], c, q, qd, u, 1e-9)


def test_blops_fd(bl_setup):
    desc, gold, model, q, qd, u = bl_setup
    qdd = jax.jit(lambda *s: blops.fd_bl(model, *s))(
        jnp.asarray(q), jnp.asarray(qd), jnp.asarray(u))
    _check_cols(gold.fd, qdd, q, qd, u, 1e-9)


def test_blops_minv(bl_setup):
    desc, gold, model, q, qd, u = bl_setup
    rows, _, _ = jax.jit(
        lambda qq: blops.minv_bl(model, blops.joint_transforms_bl(model, qq)))(
            jnp.asarray(q))
    M = blops.densify_rows(rows)
    for k in range(q.shape[-1]):
        np.testing.assert_allclose(np.asarray(M)[:, :, k], gold.minv(q[:, k], True),
                                   atol=1e-9)


@pytest.mark.mid
def test_blops_fd_grad(bl_setup):
    desc, gold, model, q, qd, u = bl_setup
    ddq, ddqd = jax.jit(lambda *s: blops.fd_grad_bl(model, *s))(
        jnp.asarray(q), jnp.asarray(qd), jnp.asarray(u))
    J = jnp.concatenate([ddq, ddqd], axis=1)
    _check_cols(gold.fd_grad, J, q, qd, u, 1e-8)


@pytest.mark.mid
def test_pallas_interpret_fd_grad(bl_setup):
    """Fused kernel (interpreter mode — same lowering path as TPU, runnable
    on CPU) matches the golden model, including batch padding."""
    desc, gold, model, q, qd, u = bl_setup
    model32 = model.astype(jnp.float32)
    qa, qda, ua = (jnp.asarray(x, jnp.float32) for x in (q, qd, u))
    ddq, ddqd = fused.fd_grad_fused(model32, qa, qda, ua, block_b=4,
                                    interpret=True)  # 5 states, block 4 → pad
    J = np.concatenate([np.asarray(ddq), np.asarray(ddqd)], axis=1)
    for k in range(q.shape[-1]):
        ref = gold.fd_grad(q[:, k], qd[:, k], u[:, k])
        np.testing.assert_allclose(J[..., k], ref,
                                   atol=2e-4 * max(1, np.abs(ref).max()))


@pytest.mark.mid
def test_pallas_interpret_fd_grad_dense_minv(bl_setup):
    """The opt-in ``minv_impl="dense"`` ∇FD (CRBA + Cholesky inside the
    single-tile kernel instead of the articulated M⁻¹ recursion) matches
    the golden model through the same interpret-mode lowering."""
    desc, gold, model, q, qd, u = bl_setup
    model32 = model.astype(jnp.float32)
    qa, qda, ua = (jnp.asarray(x, jnp.float32) for x in (q, qd, u))
    ddq, ddqd = fused.fd_grad_fused(model32, qa, qda, ua, block_b=4,
                                    interpret=True, minv_impl="dense")
    J = np.concatenate([np.asarray(ddq), np.asarray(ddqd)], axis=1)
    for k in range(q.shape[-1]):
        ref = gold.fd_grad(q[:, k], qd[:, k], u[:, k])
        np.testing.assert_allclose(J[..., k], ref,
                                   atol=2e-4 * max(1, np.abs(ref).max()))


@pytest.mark.mid
def test_pallas_interpret_rnea_and_minv(bl_setup):
    desc, gold, model, q, qd, u = bl_setup
    model32 = model.astype(jnp.float32)
    qa, qda = jnp.asarray(q, jnp.float32), jnp.asarray(qd, jnp.float32)
    c = fused.inverse_dynamics_fused(model32, qa, qda, None, block_b=4,
                                     interpret=True)
    M = fused.minv_fused(model32, qa, block_b=4, interpret=True)
    for k in range(q.shape[-1]):
        cr, *_ = gold.rnea(q[:, k], qd[:, k], None)
        np.testing.assert_allclose(np.asarray(c)[:, k], cr,
                                   atol=1e-4 * max(1, np.abs(cr).max()))
        Mr = gold.minv(q[:, k], True)
        np.testing.assert_allclose(np.asarray(M)[:, :, k], Mr, atol=1e-5)


def test_accurate_trig_parity(bl_setup):
    """`accurate_trig=True` (Cody-Waite sincos, ops/trig.py) must agree with
    the backend sincos at f64 tolerance on every path — vmap, batch-last,
    and the fused kernel in interpret mode — and improve f32 X accuracy."""
    import dataclasses

    desc, gold, model, q, qd, u = bl_setup
    model_at = dataclasses.replace(model, accurate_trig=True)
    # f64: both sincos implementations are ≥ f32-exact → identical physics
    ddq, ddqd = jax.jit(lambda *s: blops.fd_grad_bl(model_at, *s))(
        jnp.asarray(q), jnp.asarray(qd), jnp.asarray(u))
    J = jnp.concatenate([ddq, ddqd], axis=1)
    _check_cols(gold.fd_grad, J, q, qd, u, 1e-8)
    # fused interpret path honors the flag
    m32 = model_at.astype(jnp.float32)
    qa, qda, ua = (jnp.asarray(x, jnp.float32) for x in (q, qd, u))
    ddq32, ddqd32 = fused.fd_grad_fused(m32, qa, qda, ua, block_b=4,
                                        interpret=True)
    J32 = np.concatenate([np.asarray(ddq32), np.asarray(ddqd32)], axis=1)
    for k in range(q.shape[-1]):
        ref = gold.fd_grad(q[:, k], qd[:, k], u[:, k])
        np.testing.assert_allclose(J32[..., k], ref,
                                   atol=2e-4 * max(1, np.abs(ref).max()))
    # f32 X accuracy: accurate path at least as good as a 2-ulp bound
    qs = jnp.asarray(np.linspace(-3, 3, 4097, dtype=np.float32))
    from gridcodegenerator_tpu.ops.trig import sincos
    s, c = jax.jit(sincos)(qs)
    q64 = np.asarray(qs, np.float64)
    assert np.abs(np.asarray(s) - np.sin(q64)).max() < 2.5e-7
    assert np.abs(np.asarray(c) - np.cos(q64)).max() < 2.5e-7


def test_column_blocked_minv(bl_setup):
    """minv_UD_bl + minv_cols_bl over blocks == full minv_bl rows."""
    desc, gold, model, q, qd, u = bl_setup
    n = desc.n
    qa = jnp.asarray(q)
    X = blops.joint_transforms_bl(model, qa)
    rows_full, _, _ = blops.minv_bl(model, X)
    full = jnp.stack(rows_full)                      # (n, n, B)
    U, Dinv = blops.minv_UD_bl(model, X)
    cb = 3
    for c0 in range(0, n, cb):
        w = min(cb, n - c0)
        blk = blops.minv_cols_bl(model, X, U, Dinv, c0, w)
        np.testing.assert_allclose(np.asarray(blk),
                                   np.asarray(full[:, c0:c0 + w]),
                                   atol=1e-12, err_msg=f"c0={c0}")


def test_column_blocked_grad(bl_setup):
    """rnea_grad_cols_bl over blocks == full rnea_grad_inner_bl."""
    desc, gold, model, q, qd, u = bl_setup
    n = desc.n
    qa, qda, ua = (jnp.asarray(x) for x in (q, qd, u))
    X = blops.joint_transforms_bl(model, qa)
    v, a, f = blops.rnea_fwd_bl(model, X, qda, ua, -9.81)
    _, f = blops.rnea_bwd_bl(model, X, f, None)
    full = blops.rnea_grad_inner_bl(model, X, qda, v, a, f)
    for side in ("q", "qd"):
        cb = 2
        parts = []
        for c0 in range(0, n, cb):
            w = min(cb, n - c0)
            blk = blops.rnea_grad_cols_bl(model, X, qda, v, a, f,
                                          c0=c0, cb=w, sides=(side,))[side]
            parts.append(np.asarray(blk))
        got = np.concatenate(parts, axis=1)
        np.testing.assert_allclose(got, np.asarray(full[side]), atol=1e-11,
                                   err_msg=side)


def test_column_block_subtree_sparsity():
    """The column-blocked ∂ID must trace-time-skip joints outside the
    subtree of the block's columns (the reference's packed ancestor
    compression, ``_inverse_dynamics_gradient.py:55-96``): on a twin-branch
    robot, a block covering branch 1 must emit measurably fewer ops than the
    same-shaped block on a serial chain of identical n (where every joint
    ≥ c0 is genuinely live) — and stay exact."""
    import gridcodegenerator_tpu as g
    from gridcodegenerator_tpu.models import zoo as z

    # twin-branch: root joint 0, branch A = 1,2,3, branch B = 4,5,6
    rb = z.UrdfBuilder("twin")
    rb.link("base")
    rb.link("l0", mass=1.0, ixx=0.02, iyy=0.02, izz=0.02)
    rb.joint("j0", "base", "l0", xyz=(0, 0, 0.1), axis=(0, 0, 1))
    for br, start in (("a", 1), ("b", 4)):
        parent = "l0"
        for i in range(3):
            nm = f"l{start + i}"
            rb.link(nm, mass=0.5, ixx=0.01, iyy=0.01, izz=0.01)
            rb.joint(f"j{start + i}", parent, nm,
                     xyz=(0.2 if br == "a" else -0.2, 0.1, 0.05),
                     axis=(0, 1, 0))
            parent = nm
    branched = g.load_robot(rb.build(), dtype=jnp.float64)
    serial = g.load_robot(z.serial_chain(7), dtype=jnp.float64)

    def eqns(model, c0, cb):
        B = 4
        q = jnp.zeros((model.n, B))

        def run(q, qd, v, a, f):
            X = blops.joint_transforms_bl(model, q)
            return blops.rnea_grad_cols_bl(
                model, X, qd, [v[i] for i in range(model.n)],
                [a[i] for i in range(model.n)],
                [f[i] for i in range(model.n)], c0=c0, cb=cb)
        vaf = jnp.zeros((model.n, 6, B))
        jaxpr = jax.make_jaxpr(run)(q, q, vaf, vaf, vaf)
        return len(jaxpr.jaxpr.eqns)

    # block over branch A only: branch B (3 of 7 joints) must be skipped
    n_br = eqns(branched, c0=1, cb=3)
    n_se = eqns(serial, c0=1, cb=3)
    assert n_br < 0.8 * n_se, (n_br, n_se)

    # and the sparse path stays exact on the branched robot
    rng = np.random.default_rng(3)
    B = 4
    q, qd, qdd = (jnp.asarray(rng.uniform(-1, 1, (7, B))) for _ in range(3))
    X = blops.joint_transforms_bl(branched, q)
    v, a, f = blops.rnea_fwd_bl(branched, X, qd, qdd)
    _, f = blops.rnea_bwd_bl(branched, X, f, None)
    full = blops.rnea_grad_inner_bl(branched, X, qd, v, a, f)
    for c0 in (0, 1, 4):
        blk = blops.rnea_grad_cols_bl(branched, X, qd, v, a, f, c0=c0, cb=3)
        for side in ("q", "qd"):
            np.testing.assert_allclose(
                np.asarray(blk[side]), np.asarray(full[side][:, c0:c0 + 3]),
                atol=1e-12, err_msg=f"{side}@c0={c0}")


@pytest.mark.mid
def test_staged_pipeline_interpret(bl_setup):
    """The staged (column-blocked, multi-kernel) large-robot pipeline must
    match the golden model when forced on a small robot — interpret mode
    exercises the same kernel bodies as the TPU lowering."""
    from gridcodegenerator_tpu.ops.kernels import staged

    desc, gold, model, q, qd, u = bl_setup
    if desc.topology.is_serial_chain and desc.n == 5:
        pytest.skip("staged equivalence: one serial + one branched robot "
                    "suffice for the default tier (interpret mode is slow)")
    model32 = model.astype(jnp.float32)
    qa, qda, ua = (jnp.asarray(x, jnp.float32) for x in (q, qd, u))
    ddq, ddqd = staged.fd_grad_staged(model32, qa, qda, ua, block_b=4, cb=2,
                                      interpret=True)
    if not desc.topology.is_serial_chain:
        # fused −M⁻¹·∂c finish (default) vs the stage-then-einsum path on the
        # branched robot — the sparse-row contraction must be exact up to f32
        # reassociation, including the rows it skips as structural zeros
        dq2, dqd2 = staged.fd_grad_staged(model32, qa, qda, ua, block_b=4,
                                          cb=2, interpret=True,
                                          fuse_finish=False)
        np.testing.assert_allclose(np.asarray(ddq), np.asarray(dq2),
                                   atol=2e-5)
        np.testing.assert_allclose(np.asarray(ddqd), np.asarray(dqd2),
                                   atol=2e-5)
        # merged both-sides K5 launches (default) vs per-side launches:
        # each side's body traces identically, so the results must agree
        # to f32 roundoff of the shared upstream stages
        dq4, dqd4 = staged.fd_grad_staged(model32, qa, qda, ua, block_b=4,
                                          cb=2, interpret=True,
                                          merge_sides=False)
        np.testing.assert_allclose(np.asarray(ddq), np.asarray(dq4),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(ddqd), np.asarray(dqd4),
                                   atol=1e-6)
        # K2″ merged M⁻¹+q̈+(a,f) kernel (measured-off A/B) vs the default
        # K2′+K4 two-launch path: identical math, only the staging
        # boundary moves
        dq5, dqd5 = staged.fd_grad_staged(model32, qa, qda, ua, block_b=4,
                                          cb=2, interpret=True,
                                          merge_af=True)
        np.testing.assert_allclose(np.asarray(ddq), np.asarray(dq5),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(ddqd), np.asarray(dqd5),
                                   atol=1e-6)
    J = np.concatenate([np.asarray(ddq), np.asarray(ddqd)], axis=1)
    M = staged.minv_staged(model32, qa, block_b=4, cb=3, interpret=True)
    qdd = staged.fd_staged(model32, qa, qda, ua, block_b=4, interpret=True)
    for k in range(q.shape[-1]):
        ref = gold.fd_grad(q[:, k], qd[:, k], u[:, k])
        np.testing.assert_allclose(J[..., k], ref,
                                   atol=2e-4 * max(1, np.abs(ref).max()))
        np.testing.assert_allclose(np.asarray(M)[:, :, k],
                                   gold.minv(q[:, k], True), atol=1e-5)
        np.testing.assert_allclose(np.asarray(qdd)[:, k],
                                   gold.fd(q[:, k], qd[:, k], u[:, k]),
                                   atol=2e-4)


@pytest.mark.mid
def test_crba_and_dense_minv_staged(bl_setup):
    """``blops.crba_bl`` (mass matrix, ancestor-sparse list-of-lists) and
    the K2′ single-kernel dense M⁻¹+q̈ (CRBA + active-region Cholesky +
    symmetric L⁻ᵀL⁻¹) vs the golden model and the articulated-recursion
    A/B path, at f64 where everything must match to roundoff."""
    from gridcodegenerator_tpu.ops.kernels import staged

    desc, gold, model, q, qd, u = bl_setup
    n = desc.n
    qa, qda, ua = (jnp.asarray(x) for x in (q, qd, u))
    X = blops.crba_bl(model, blops.joint_transforms_bl(model, qa))
    # ancestor sparsity: M[i][j] is None exactly off the root paths
    amask = desc.topology.ancestor_mask
    for i in range(n):
        for j in range(n):
            anc = i == j or amask[i, j] or amask[j, i]
            assert (X[i][j] is not None) == anc
    c, _ = staged.bias_and_v_staged(model, qa, qda, -9.81, 4, True)
    Minv, qdd = staged.minv_qdd_dense_staged(model, qa, ua - c,
                                             block_b=4, interpret=True)
    Minv2 = staged.minv_staged(model, qa, block_b=4, cb=2, interpret=True)
    np.testing.assert_allclose(np.asarray(Minv), np.asarray(Minv2),
                               atol=1e-9)
    for k in range(q.shape[-1]):
        Md = np.array([[np.asarray(X[i][j])[0, k]
                        if X[i][j] is not None else 0.0
                        for j in range(n)] for i in range(n)])
        np.testing.assert_allclose(Md @ np.asarray(Minv)[:, :, k],
                                   np.eye(n), atol=1e-10)
        np.testing.assert_allclose(
            np.asarray(Minv)[:, :, k], gold.minv(q[:, k], True), atol=1e-10)
        np.testing.assert_allclose(
            np.asarray(qdd)[:, k], gold.fd(q[:, k], qd[:, k], u[:, k]),
            atol=1e-9)
    # the factor+solve FD kernel (never forms M⁻¹) on the same states
    qdd2 = staged.fd_dense_staged(model, qa, qda, ua, block_b=4,
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(qdd2), np.asarray(qdd), atol=1e-9)
    # the fd_grad_staged minv_impl A/B: dense (default) vs recursion
    dq_d, dqd_d = staged.fd_grad_staged(model, qa, qda, ua, block_b=4,
                                        cb=2, interpret=True)
    dq_r, dqd_r = staged.fd_grad_staged(model, qa, qda, ua, block_b=4,
                                        cb=2, interpret=True,
                                        minv_impl="recursion")
    np.testing.assert_allclose(np.asarray(dq_d), np.asarray(dq_r), atol=1e-8)
    np.testing.assert_allclose(np.asarray(dqd_d), np.asarray(dqd_r),
                               atol=1e-8)


def test_staged_bf16_staging(bl_setup):
    """``stage_dtype=bfloat16`` (halved HBM traffic for the inter-kernel
    v/a/f/M⁻¹ tensors, f32 compute) must track the f32-staged result to
    bf16 roundoff — and the default must stay exactly the f32 path."""
    from gridcodegenerator_tpu.ops.kernels import staged

    desc, gold, model, q, qd, u = bl_setup
    if desc.topology.is_serial_chain:
        pytest.skip("one branched robot suffices (interpret mode is slow)")
    model32 = model.astype(jnp.float32)
    qa, qda, ua = (jnp.asarray(x, jnp.float32) for x in (q, qd, u))
    f32 = staged.fd_grad_staged(model32, qa, qda, ua, block_b=4, cb=2,
                                interpret=True)
    b16 = staged.fd_grad_staged(model32, qa, qda, ua, block_b=4, cb=2,
                                interpret=True, stage_dtype=jnp.bfloat16)
    for a, b in zip(f32, b16):
        a, b = np.asarray(a), np.asarray(b)
        assert b.dtype == np.float32          # outputs stay full precision
        rel = np.abs(a - b).max() / max(1.0, np.abs(a).max())
        assert rel < 2e-2, f"bf16 staging rel err {rel:.3e}"


@pytest.mark.slow
def test_staged_pipeline_atlas():
    """Atlas (n=28) routes to the staged pipeline (the VERDICT round-1 gap:
    no fused path for n≥15) and its staged FD + one ∂ID column block match
    the golden model. The full fd_grad_staged equivalence is covered by the
    forced small-robot test above (identical code, every block); compiling
    all 28 Atlas grad-block kernels in interpret mode on one CPU core takes
    tens of minutes, so this test checks one block of each kernel kind."""
    import gridcodegenerator_tpu as g
    from gridcodegenerator_tpu.models import zoo
    from gridcodegenerator_tpu.ops.kernels import staged
    from gridcodegenerator_tpu.ops.kernels.fused import _default_block

    n = 28
    assert _default_block(n, "fd_grad") is None   # single-tile impossible
    assert _default_block(n, "rnea") is not None  # plain RNEA still fuses
    assert staged._col_block(n) >= 1
    desc = g.parse_urdf(zoo.atlas(damping=0.05))
    gold = g.GoldenDynamics(desc)
    model32 = g.robot_model_from_description(desc, dtype=jnp.float32)
    B = 2
    q, qd, u = random_state(desc.n, seed=77, batch=(B,))
    qa, qda, ua = (jnp.asarray(x.T, jnp.float32) for x in (q, qd, u))

    # staged FD (K1 + K2 + K3 blocks + XLA finish)
    qdd = staged.fd_staged(model32, qa, qda, ua, block_b=2, interpret=True)
    for k in range(B):
        ref = gold.fd(q[k], qd[k], u[k])
        np.testing.assert_allclose(np.asarray(qdd)[:, k], ref,
                                   atol=5e-4 * max(1, np.abs(ref).max()))

    # one ∂ID column block (K4 + one K5 launch)
    cb = 4
    X = blops.joint_transforms_bl(model32, qa)
    v, a, f = blops.rnea_fwd_bl(model32, X, qda, jnp.asarray(qdd), -9.81)
    _, f = blops.rnea_bwd_bl(model32, X, f, None)
    blk = blops.rnea_grad_cols_bl(model32, X, qda, v, a, f,
                                  c0=8, cb=cb, sides=("q",))["q"]
    for k in range(B):
        dq_ref, _ = gold.rnea_grad(q[k], qd[k],
                                   np.asarray(qdd)[:, k].astype(np.float64))
        np.testing.assert_allclose(np.asarray(blk)[..., k],
                                   dq_ref[:, 8:8 + cb],
                                   atol=5e-4 * max(1, np.abs(dq_ref).max()))


def test_lane_tile_kernels_interpret(bl_setup):
    """The 1-D lane-tile kernel layout (batch in lanes only — the Atlas-scale
    single-kernel path) must match golden, forced on small robots."""
    from gridcodegenerator_tpu.ops.kernels.fused import _pallas_batch_call

    desc, gold, model, q, qd, u = bl_setup
    if desc.topology.is_serial_chain and desc.n == 5:
        pytest.skip("one serial + one branched robot suffice (interpret slow)")
    model32 = model.astype(jnp.float32)
    qa, qda, ua = (jnp.asarray(x, jnp.float32) for x in (q, qd, u))
    n = desc.n

    def body(km, q, qd, u):
        return blops.fd_grad_bl(km, q, qd, u, -9.81)

    ddq, ddqd = _pallas_batch_call(model32, body, [qa, qda, ua],
                                   [(n, n), (n, n)], None, interpret=True,
                                   lane_tile=True)
    J = np.concatenate([np.asarray(ddq), np.asarray(ddqd)], axis=1)
    for k in range(q.shape[-1]):
        ref = gold.fd_grad(q[:, k], qd[:, k], u[:, k])
        np.testing.assert_allclose(J[..., k], ref,
                                   atol=2e-4 * max(1, np.abs(ref).max()))


def test_lane_tile_gate_calibration():
    """The hardware-calibrated VMEM gate (v5e, 2026-08-16): at n=28 the
    gradient lane-tile bodies OOM'd the 16 MB scoped VMEM (20.21 MB) while
    M⁻¹/FD compiled and ran — the gate must reproduce exactly that split."""
    from gridcodegenerator_tpu.ops.kernels import fused

    n = 28
    assert fused._default_block(n, "id_grad") is None
    assert not fused._lane_tile_ok(n, "id_grad")   # → staged (measured OOM)
    assert not fused._lane_tile_ok(n, "fd_grad")
    assert fused._lane_tile_ok(n, "minv")          # proven on hardware
    assert fused._lane_tile_ok(n, "fd")


@pytest.mark.slow
def test_gradient_dispatch_falls_through_to_staged():
    """The fused-kernel dispatchers must route robots whose gradient bodies
    exceed the (hardware-calibrated) lane-tile VMEM gate to the staged
    pipeline — regression test for the round-2 NameError on exactly this
    path (id_grad_fused's staged fallback was never imported, which only an
    Atlas-sized robot could reach). Asserts golden parity of the ∂ID
    dispatcher through the full staged pipeline (interpret mode; slow: one
    kernel compile per column block per side)."""
    import gridcodegenerator_tpu as g
    from gridcodegenerator_tpu.models import zoo
    from gridcodegenerator_tpu.ops.kernels import fused

    desc = g.parse_urdf(zoo.atlas(damping=0.05))
    gold = g.GoldenDynamics(desc)
    model32 = g.robot_model_from_description(desc, dtype=jnp.float32)
    B = 2
    q, qd, u = random_state(desc.n, seed=13, batch=(B,))
    qa, qda, ua = (jnp.asarray(x.T, jnp.float32) for x in (q, qd, u))

    qdd = fused.forward_dynamics_fused(model32, qa, qda, ua, interpret=True)
    dq, dqd = fused.id_grad_fused(model32, qa, qda, jnp.asarray(qdd),
                                  interpret=True)
    for k in range(B):
        ref_q, ref_qd = gold.rnea_grad(q[k], qd[k],
                                       np.asarray(qdd)[:, k].astype(np.float64))
        np.testing.assert_allclose(np.asarray(dq)[..., k], ref_q,
                                   atol=5e-4 * max(1, np.abs(ref_q).max()))
        np.testing.assert_allclose(np.asarray(dqd)[..., k], ref_qd,
                                   atol=5e-4 * max(1, np.abs(ref_qd).max()))
