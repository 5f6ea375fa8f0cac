"""Real-TPU fused-kernel validation tier.

Run with::

    GRID_TPU_TESTS=1 python -m pytest tests/ -m tpu -q

Interpret-mode equivalence (tests/test_blops.py) checks the kernel *math*;
this tier checks the *Mosaic compilation* of the fused kernels on the real
chip against the float64 golden model — the miscompile class interpret mode
cannot catch (see the layout-inference notes at the top of ops/blops.py).

The module is excluded from default runs (pyproject addopts) and, like every
TPU-touching entry point in this repo, bounds its wall clock: if the TPU
tunnel wedges during backend init, the watchdog turns a hang into a fast
failure instead of stalling the whole session.
"""

import os
import threading
import time

import numpy as np
import pytest

pytestmark = pytest.mark.tpu

if os.environ.get("GRID_TPU_TESTS") != "1":
    pytest.skip("TPU tier: set GRID_TPU_TESTS=1 and run -m tpu",
                allow_module_level=True)


@pytest.fixture(scope="module")
def tpu_setup():
    # 1800 s default: the tier carries 14+ tests (fixed-base x3, staged
    # atlas, contact kernels, terrain kernel, collision kernel,
    # ground-geom kernel, loop kernel, multi-dof fused + staged,
    # SO Hessian kernels, pallas-vs-vmap, trig A/B);
    # measured 1077 s with
    # fresh md-kernel compiles (2026-08-17) BEFORE the SO kernel, whose
    # cold compile alone is ~11 min (BENCHLOG r3s8) — raise
    # GRID_TPU_TEST_BUDGET_S further for fully cold caches
    budget = float(os.environ.get("GRID_TPU_TEST_BUDGET_S", "1800"))
    done = threading.Event()

    def watchdog():
        if not done.wait(budget):
            print(f"\nTPU-tier watchdog: exceeded {budget:.0f}s "
                  "(tunnel wedged?) — aborting", flush=True)
            os._exit(4)

    threading.Thread(target=watchdog, daemon=True).start()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    import gridcodegenerator_tpu as g
    from gridcodegenerator_tpu.models import zoo

    dev = jax.devices()[0]
    if dev.platform != "tpu":
        done.set()
        pytest.skip(f"not a TPU backend: {dev.platform}")
    models = {}
    for name, urdf in (("iiwa14", zoo.iiwa14(damping=0.1)),
                       ("barm", zoo.branched_arm(damping=0.12)),
                       ("rand12", zoo.random_tree(12, seed=3)),
                       ("atlas", zoo.atlas(damping=0.05))):
        desc = g.parse_urdf(urdf)
        models[name] = (desc, g.GoldenDynamics(desc),
                        g.robot_model_from_description(desc, dtype=jnp.float32))
    yield g, jnp, models
    done.set()


def _state(n, B, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.uniform(-2, 2, (B, n)).astype(np.float32),
            rng.uniform(-1, 1, (B, n)).astype(np.float32),
            rng.uniform(-8, 8, (B, n)).astype(np.float32))


@pytest.mark.parametrize("robot", ["iiwa14", "barm", "rand12"])
def test_fused_kernels_vs_golden_on_tpu(tpu_setup, robot):
    """Every fused kernel (impl='pallas', real Mosaic lowering) vs the f64
    golden model at f32 tolerance, on a batch spanning multiple tiles."""
    g, jnp, models = tpu_setup
    desc, gold, model = models[robot]
    n = desc.n
    B = 2048
    qh, qdh, uh = _state(n, B, seed=11)
    q, qd, u = jnp.asarray(qh), jnp.asarray(qdh), jnp.asarray(uh)

    outs = {
        "id": np.asarray(g.inverse_dynamics(model, q, qd, u, impl="pallas")),
        "minv": np.asarray(g.direct_minv(model, q, impl="pallas")),
        "fd": np.asarray(g.forward_dynamics(model, q, qd, u, impl="pallas")),
        "fd_grad": np.asarray(
            g.forward_dynamics_gradient(model, q, qd, u, impl="pallas")),
    }
    # spot-check states across distinct batch tiles (tile = 1024+ states)
    for k in (0, 1, B // 2, B - 1):
        q64, qd64, u64 = (qh[k].astype(np.float64), qdh[k].astype(np.float64),
                          uh[k].astype(np.float64))
        refs = {
            "id": gold.rnea(q64, qd64, u64)[0],
            "minv": gold.minv(q64, True),
            "fd": gold.fd(q64, qd64, u64),
            "fd_grad": gold.fd_grad(q64, qd64, u64),
        }
        for name, ref in refs.items():
            scale = max(1.0, np.abs(ref).max())
            err = np.abs(outs[name][k].astype(np.float64) - ref).max() / scale
            # 4.5e-6: measured hardware maxima are 2.7e-6 (1024 states,
            # r2 seed, PARITY.md) and 3.58e-6 (this tier's seed, r3) — the
            # f32 tail sits just under 4e-6; 25% headroom, no more 5e-6
            # slack — VERDICT r2 weak #1
            assert err < 4.5e-6, f"{robot}/{name}@state{k}: rel err {err:.3e}"


def test_staged_pipeline_vs_golden_on_tpu(tpu_setup):
    """Atlas (n=28) through the production ``impl='pallas'`` route — which
    for this size resolves to the 1-D lane-tile kernels (minv, fd) and the
    column-blocked staged pipeline (∇FD) — validated against the f64 golden
    model on the real chip (VERDICT r2 weak #7: the trickiest Mosaic surface
    previously had no repeatable hardware test)."""
    g, jnp, models = tpu_setup
    desc, gold, model = models["atlas"]
    n = desc.n
    B = 1024
    qh, qdh, uh = _state(n, B, seed=31)
    q, qd, u = jnp.asarray(qh), jnp.asarray(qdh), jnp.asarray(uh)

    outs = {
        "minv": np.asarray(g.direct_minv(model, q, impl="pallas")),
        "fd": np.asarray(g.forward_dynamics(model, q, qd, u, impl="pallas")),
        "fd_grad": np.asarray(
            g.forward_dynamics_gradient(model, q, qd, u, impl="pallas")),
    }
    for k in (0, B // 2, B - 1):
        q64, qd64, u64 = (qh[k].astype(np.float64), qdh[k].astype(np.float64),
                          uh[k].astype(np.float64))
        refs = {
            "minv": gold.minv(q64, True),
            "fd": gold.fd(q64, qd64, u64),
            "fd_grad": gold.fd_grad(q64, qd64, u64),
        }
        for name, ref in refs.items():
            scale = max(1.0, np.abs(ref).max())
            err = np.abs(outs[name][k].astype(np.float64) - ref).max() / scale
            # deeper tree + n=28 column recursions accumulate more f32
            # rounding than the n≤14 single-tile kernels; 1e-5 is ~3× the
            # iiwa bound, same floor-scaling as the CPU-side measurement
            assert err < 1e-5, f"atlas/{name}@state{k}: rel err {err:.3e}"


def test_contact_fused_kernels_on_tpu(tpu_setup):
    """The fused floating-base contact kernels (stance FD + frictional
    ground step, ops/kernels/contact_fused.py) through real Mosaic lowering
    vs the independent single-state CPU path (jax.default_device) on
    sampled states — an f32 cross-implementation check (this tier runs
    without x64; exact math equivalence vs the batch-last XLA pipeline is
    pinned at f64 by tests/test_contact_fused.py, and a Mosaic miscompile
    shows up as O(1) disagreement, not rounding). The batch-last XLA
    program itself is NOT compiled here — its ~20k-op remote compile would
    eat the tier budget."""
    import jax
    g, jnp, models = tpu_setup
    import numpy as np_
    from gridcodegenerator_tpu.models import zoo
    from gridcodegenerator_tpu.ops import contact as ct
    from gridcodegenerator_tpu.ops import freeflyer as ff

    desc = g.parse_urdf(zoo.hyq(damping=0.2))
    ffm32 = ff.free_flyer_model(desc, dtype=jnp.float32)
    ffm64 = ff.free_flyer_model(desc, dtype=jnp.float32)  # CPU ref (no x64)
    n = ffm32.n
    feet = (2, 5, 8, 11)
    foff = np_.tile([0.35, 0.0, 0.0], (4, 1))
    rng = np_.random.default_rng(41)
    B = 256                                     # two lane tiles
    quat = np_.tile([1.0, 0, 0, 0], (B, 1)) + 0.1 * rng.normal(size=(B, 4))
    quat /= np_.linalg.norm(quat, axis=1, keepdims=True)
    pos = rng.uniform(-0.1, 0.1, (B, 3)) + [0, 0, 0.5]
    q = np_.tile([-0.1, 0.7, -1.2], (B, 4)) + rng.uniform(-0.05, 0.05, (B, n))
    vb = rng.uniform(-0.6, 0.6, (B, 6))
    qd = rng.uniform(-0.5, 0.5, (B, n))
    tau = rng.uniform(-10, 10, (B, n))
    push = rng.uniform(-40, 40, (B, 6))        # per-env base perturbation
    f32 = lambda a: jnp.asarray(a, jnp.float32)

    # TPU fused kernels (the impl="pallas" routed production path); the
    # step carries the f_base push operand (r3s14) through Mosaic
    dvb, qdd, lam = ct.fb_constrained_fd_batched(
        ffm32, f32(quat), f32(pos), f32(q), f32(vb), f32(qd), f32(tau),
        feet, foff, impl="pallas")
    nxt, imp = ct.fb_step_ground_batched(
        ffm32, tuple(f32(s) for s in (quat, pos, q, vb, qd)), f32(tau),
        1e-3, feet, foff, mu=0.8, impl="pallas", f_base=f32(push))
    got = dict(dvb=np_.asarray(dvb), qdd=np_.asarray(qdd),
               lam=np_.asarray(lam), q2=np_.asarray(nxt[2]),
               vb2=np_.asarray(nxt[3]), imp=np_.asarray(imp))

    # f64 single-state reference on the host CPU
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        for k in (0, 127, 128, B - 1):          # states across both tiles
            st64 = tuple(jnp.asarray(a[k], jnp.float32)
                         for a in (quat, pos, q, vb, qd))
            dvb_r, qdd_r, lam_r = ct.fb_constrained_forward_dynamics(
                ffm64, *st64, jnp.asarray(tau[k], jnp.float32), feet,
                jnp.asarray(foff, jnp.float32))
            s_r, imp_r = ct.fb_step_ground(
                ffm64, st64, jnp.asarray(tau[k], jnp.float32), 1e-3, feet,
                jnp.asarray(foff, jnp.float32), mu=0.8,
                f_base=jnp.asarray(push[k], jnp.float32))
            refs = dict(dvb=dvb_r, qdd=qdd_r, lam=lam_r, q2=s_r[2],
                        vb2=s_r[3], imp=imp_r)
            for name, ref in refs.items():
                ref = np_.asarray(ref)
                scale = max(1.0, np_.abs(ref).max())
                err = np_.abs(got[name][k] - ref).max() / scale
                # contact pipeline depth (mass chol + Delassus/PGS over an
                # 18-dof model) ≈ 3-10× the plain-dynamics f32 floor
                assert err < 3e-5, f"{name}@state{k}: rel err {err:.3e}"


def test_terrain_fused_kernel_on_tpu(tpu_setup):
    """The fused HEIGHTFIELD ground-step kernel (step_ground_terrain_fused:
    MXU one-hot bilinear gather + per-foot contact frames) through real
    Mosaic lowering vs the single-state CPU terrain path — the gather
    mask, the (4, HWp) corner matmul, and the frame rotation are Mosaic
    surfaces interpret mode cannot validate."""
    import jax
    g, jnp, models = tpu_setup
    import numpy as np_
    from gridcodegenerator_tpu.models import zoo
    from gridcodegenerator_tpu.ops import contact as ct
    from gridcodegenerator_tpu.ops import freeflyer as ff
    from gridcodegenerator_tpu.ops import terrain as tr
    from gridcodegenerator_tpu.ops.kernels import contact_fused as cf

    desc = g.parse_urdf(zoo.hyq(damping=0.2))
    ffm = ff.free_flyer_model(desc, dtype=jnp.float32)
    n = ffm.n
    feet = (2, 5, 8, 11)
    foff = np_.tile([0.35, 0.0, 0.0], (4, 1))
    terr = tr.bumpy_terrain(amp=0.05, wavelength=0.9, extent=2.0,
                            cell=0.25, rough=0.02, dtype=jnp.float32)
    assert cf.terrain_fused_ok(ffm, terr, 4)
    rng = np_.random.default_rng(47)
    B = 256
    quat = np_.tile([1.0, 0, 0, 0], (B, 1)) + 0.1 * rng.normal(size=(B, 4))
    quat /= np_.linalg.norm(quat, axis=1, keepdims=True)
    pos = rng.uniform(-0.1, 0.1, (B, 3)) + [0, 0, 0.5]
    q = np_.tile([-0.1, 0.7, -1.2], (B, 4)) + rng.uniform(-0.05, 0.05,
                                                          (B, n))
    vb = rng.uniform(-0.6, 0.6, (B, 6))
    qd = rng.uniform(-0.5, 0.5, (B, n))
    tau = rng.uniform(-10, 10, (B, n))
    f32 = lambda a: jnp.asarray(a, jnp.float32)

    nxt, imp = ct.fb_step_ground_batched(
        ffm, tuple(f32(s) for s in (quat, pos, q, vb, qd)), f32(tau),
        1e-3, feet, foff, mu=0.8, impl="pallas", terrain=terr)
    got = dict(q2=np_.asarray(nxt[2]), vb2=np_.asarray(nxt[3]),
               imp=np_.asarray(imp))
    assert (got["imp"][..., 2] > 0).any(), "no active contacts"

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        for k in (0, 127, 128, B - 1):
            st = tuple(jnp.asarray(a[k], jnp.float32)
                       for a in (quat, pos, q, vb, qd))
            s_r, imp_r = ct.fb_step_ground(
                ffm, st, jnp.asarray(tau[k], jnp.float32), 1e-3, feet,
                jnp.asarray(foff, jnp.float32), mu=0.8, terrain=terr)
            for name, ref in (("q2", s_r[2]), ("vb2", s_r[3]),
                              ("imp", imp_r)):
                ref = np_.asarray(ref)
                scale = max(1.0, np_.abs(ref).max())
                err = np_.abs(got[name][k] - ref).max() / scale
                assert err < 3e-5, f"{name}@state{k}: rel err {err:.3e}"


def test_multidof_fused_kernels_on_tpu(tpu_setup):
    """The fused multi-dof kernels (generalized FD + tangent-space ∇FD,
    ops/kernels/multidof_fused.py) through real Mosaic lowering vs the
    per-state vmap recursions computed on the host CPU — ball joints
    (quaternion per joint, nq ≠ nv) and an in-tree 6-dof floating joint."""
    import jax
    g, jnp, models = tpu_setup
    import numpy as np_
    from gridcodegenerator_tpu.models import zoo
    from gridcodegenerator_tpu.ops import multidof as md

    for urdf in (zoo.ball_arm(damping=0.1),
                 zoo.with_free_joint(zoo.iiwa14(damping=0.1))):
        model = md.multidof_model_from_description(g.parse_urdf(urdf),
                                                   dtype=jnp.float32)
        B = 256
        rng = np_.random.default_rng(47)
        q0 = np_.tile(np_.asarray(md.neutral_q(model)), (B, 1))
        dq = rng.uniform(-0.5, 0.5, (B, model.nv))
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            q = jnp.asarray(np_.stack([
                np_.asarray(md.md_tangent_apply(
                    model, jnp.asarray(q0[k], jnp.float32),
                    jnp.asarray(dq[k], jnp.float32)))
                for k in range(B)]))
        qd = jnp.asarray(rng.uniform(-0.8, 0.8, (B, model.nv)), jnp.float32)
        u = jnp.asarray(rng.uniform(-5, 5, (B, model.nv)), jnp.float32)

        qdd = np_.asarray(md.md_forward_dynamics_batched(
            model, q, qd, u, impl="pallas"))
        Fq, Fqd, Fu = (np_.asarray(x)
                       for x in md.md_forward_dynamics_gradient_batched(
                           model, q, qd, u, impl="pallas"))
        with jax.default_device(cpu):
            for k in (0, 127, B - 1):
                ref = np_.asarray(md.md_forward_dynamics(
                    model, q[k], qd[k], u[k]))
                scale = max(1.0, np_.abs(ref).max())
                err = np_.abs(qdd[k] - ref).max() / scale
                assert err < 1e-5, f"{model.name}/fd@{k}: {err:.3e}"
                gq, gqd, gu = md.md_forward_dynamics_gradient(
                    model, q[k], qd[k], u[k])
                for nm, got, r in (("dq", Fq[k], gq), ("dqd", Fqd[k], gqd),
                                   ("du", Fu[k], gu)):
                    r = np_.asarray(r)
                    scale = max(1.0, np_.abs(r).max())
                    err = np_.abs(got - r).max() / scale
                    assert err < 3e-5, \
                        f"{model.name}/fd_grad {nm}@{k}: {err:.3e}"


def test_multidof_staged_kernels_on_tpu(tpu_setup):
    """The column-blocked staged md gradient pipeline (ops/kernels/
    multidof_staged.py) through real Mosaic lowering at the humanoid
    free-flyer scale it exists for (Atlas + floating base: n=29, nv=34 —
    past the single-tile ``md_grad_workset_ok`` gate, so the public
    batched entries route here) vs per-state analytic tangent-space
    gradients computed on the host CPU."""
    import jax
    g, jnp, models = tpu_setup
    import numpy as np_
    from gridcodegenerator_tpu.models import zoo
    from gridcodegenerator_tpu.ops import multidof as md
    from gridcodegenerator_tpu.ops.kernels import multidof_fused as mf
    from gridcodegenerator_tpu.ops.kernels import multidof_staged as ms

    model = md.multidof_model_from_description(
        g.parse_urdf(zoo.with_free_joint(zoo.atlas(damping=0.05))),
        dtype=jnp.float32)
    assert not mf.md_grad_workset_ok(model.n_joints, model.nv)
    assert ms.md_staged_ok(model.n_joints, model.nv)
    B = 256
    rng = np_.random.default_rng(53)
    cpu = jax.devices("cpu")[0]
    q0 = np_.tile(np_.asarray(md.neutral_q(model)), (B, 1))
    dq = rng.uniform(-0.4, 0.4, (B, model.nv))
    with jax.default_device(cpu):
        q = jnp.asarray(np_.stack([
            np_.asarray(md.md_tangent_apply(
                model, jnp.asarray(q0[k], jnp.float32),
                jnp.asarray(dq[k], jnp.float32)))
            for k in range(B)]))
    qd = jnp.asarray(rng.uniform(-0.6, 0.6, (B, model.nv)), jnp.float32)
    u = jnp.asarray(rng.uniform(-5, 5, (B, model.nv)), jnp.float32)

    Dq, Dqd = (np_.asarray(x) for x in md.md_id_grad_batched(
        model, q, qd, u, impl="pallas"))
    Fq, Fqd, Fu = (np_.asarray(x)
                   for x in md.md_forward_dynamics_gradient_batched(
                       model, q, qd, u, impl="pallas"))
    with jax.default_device(cpu):
        for k in (0, 127, B - 1):
            rq, rqd = (np_.asarray(x) for x in md.md_id_grad(
                model, q[k], qd[k], u[k]))
            for nm, got, r in (("id_dq", Dq[k], rq), ("id_dqd", Dqd[k], rqd)):
                scale = max(1.0, np_.abs(r).max())
                err = np_.abs(got - r).max() / scale
                assert err < 3e-5, f"staged {nm}@{k}: {err:.3e}"
            gq, gqd, gu = md.md_forward_dynamics_gradient(
                model, q[k], qd[k], u[k])
            for nm, got, r in (("dq", Fq[k], gq), ("dqd", Fqd[k], gqd),
                               ("du", Fu[k], gu)):
                r = np_.asarray(r)
                scale = max(1.0, np_.abs(r).max())
                err = np_.abs(got - r).max() / scale
                assert err < 3e-5, f"staged fd_grad {nm}@{k}: {err:.3e}"


def test_collision_fused_kernel_on_tpu(tpu_setup):
    """The collision cone rows inside the fused ground-step kernel
    (contact_fused._collision_rows_s: in-kernel segment-segment closest
    points, branchless tangent frames, traced-point Jacobian columns)
    through real Mosaic lowering vs the single-state CPU path. Sphere
    obstacle — generic normals, away from the tangent-basis sign
    boundary (see tests/test_contact_fused.py geometry note)."""
    import jax
    g, jnp, models = tpu_setup
    import numpy as np_
    from gridcodegenerator_tpu.models import zoo
    from gridcodegenerator_tpu.ops import collision as col
    from gridcodegenerator_tpu.ops import contact as ct
    from gridcodegenerator_tpu.ops import freeflyer as ff

    desc = g.parse_urdf(zoo.hyq(damping=0.2))
    ffm = ff.free_flyer_model(desc, dtype=jnp.float32)
    n = ffm.n
    feet = (2, 5, 8, 11)
    foff = np_.tile([0.35, 0.0, 0.0], (4, 1))
    geoms = col.make_geoms(feet, a=np_.zeros((4, 3)),
                           b=np_.tile([0.3, 0, 0], (4, 1)), r=0.24)
    ball = col.make_obstacles(a=[[0.25, 0.05, 0.1]], r=0.35)
    cm = col.make_collision_model(geoms, topology=ffm.arm.topology,
                                  obstacles=ball, min_separation=2)
    rng = np_.random.default_rng(53)
    B = 256
    quat = np_.tile([1.0, 0, 0, 0], (B, 1)) + 0.1 * rng.normal(size=(B, 4))
    quat /= np_.linalg.norm(quat, axis=1, keepdims=True)
    pos = rng.uniform(-0.1, 0.1, (B, 3)) + [0, 0, 0.5]
    q = np_.tile([-0.1, 0.7, -1.2], (B, 4)) + rng.uniform(-0.05, 0.05,
                                                          (B, n))
    vb = rng.uniform(-0.6, 0.6, (B, 6))
    qd = rng.uniform(-0.5, 0.5, (B, n))
    tau = rng.uniform(-10, 10, (B, n))
    f32 = lambda a: jnp.asarray(a, jnp.float32)

    nxt, imp = ct.fb_step_ground_batched(
        ffm, tuple(f32(s) for s in (quat, pos, q, vb, qd)), f32(tau),
        1e-3, feet, foff, mu=0.8, collision=cm, mu_collision=0.45,
        impl="pallas")
    got = dict(q2=np_.asarray(nxt[2]), vb2=np_.asarray(nxt[3]),
               imp=np_.asarray(imp))
    assert got["imp"].shape == (B, 4 + cm.n_contacts, 3)
    assert (got["imp"][:, 4:, 2] > 0).any(), "no active collision contacts"

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        for k in (0, 127, 128, B - 1):
            st = tuple(jnp.asarray(a[k], jnp.float32)
                       for a in (quat, pos, q, vb, qd))
            s_r, imp_r = ct.fb_step_ground(
                ffm, st, jnp.asarray(tau[k], jnp.float32), 1e-3, feet,
                jnp.asarray(foff, jnp.float32), mu=0.8, collision=cm,
                mu_collision=0.45)
            for name, ref in (("q2", s_r[2]), ("vb2", s_r[3]),
                              ("imp", imp_r)):
                ref = np_.asarray(ref)
                scale = max(1.0, np_.abs(ref).max())
                err = np_.abs(got[name][k] - ref).max() / scale
                assert err < 3e-5, f"{name}@state{k}: rel err {err:.3e}"


def test_ground_geom_fused_kernel_on_tpu(tpu_setup):
    """Geom-vs-ground cone rows inside the fused ground-step kernel
    (contact_fused._ground_geom_rows_s: endpoint-sphere gaps, material
    points at the surface, base-geom zero arm columns) through real
    Mosaic lowering vs the single-state CPU path — the capsule-feet /
    fallen-torso pattern. Low drop heights keep the rows active."""
    import jax
    g, jnp, models = tpu_setup
    import numpy as np_
    from gridcodegenerator_tpu.models import zoo
    from gridcodegenerator_tpu.ops import collision as col
    from gridcodegenerator_tpu.ops import contact as ct
    from gridcodegenerator_tpu.ops import freeflyer as ff

    desc = g.parse_urdf(zoo.hyq(damping=0.2))
    ffm = ff.free_flyer_model(desc, dtype=jnp.float32)
    n = ffm.n
    feet = (2, 5, 8, 11)
    foff = np_.tile([0.35, 0.0, 0.0], (4, 1))
    gg = col.make_geoms((-1, 2, 7),
                        a=[[-0.3, 0, -0.02], [0, 0, 0], [0.1, 0, 0.05]],
                        b=[[0.3, 0, -0.02], [0.3, 0, 0], [0.1, 0, 0.05]],
                        r=[0.25, 0.08, 0.06])
    kg = col.n_ground_contacts(gg)
    rng = np_.random.default_rng(61)
    B = 256
    quat = np_.tile([1.0, 0, 0, 0], (B, 1)) + 0.05 * rng.normal(size=(B, 4))
    quat /= np_.linalg.norm(quat, axis=1, keepdims=True)
    pos = rng.uniform(-0.1, 0.1, (B, 3)) + [0, 0, 0.30]
    q = np_.tile([-0.1, 0.7, -1.2], (B, 4)) + rng.uniform(-0.05, 0.05,
                                                          (B, n))
    vb = rng.uniform(-0.6, 0.6, (B, 6))
    qd = rng.uniform(-0.5, 0.5, (B, n))
    tau = rng.uniform(-10, 10, (B, n))
    f32 = lambda a: jnp.asarray(a, jnp.float32)

    nxt, imp = ct.fb_step_ground_batched(
        ffm, tuple(f32(s) for s in (quat, pos, q, vb, qd)), f32(tau),
        1e-3, feet, foff, mu=0.8, ground_geoms=gg, mu_ground=0.55,
        impl="pallas")
    got = dict(q2=np_.asarray(nxt[2]), vb2=np_.asarray(nxt[3]),
               imp=np_.asarray(imp))
    assert got["imp"].shape == (B, 4 + kg, 3)
    assert (got["imp"][:, 4:, 2] > 0).any(), "no active geom-ground rows"

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        for k in (0, 127, 128, B - 1):
            st = tuple(jnp.asarray(a[k], jnp.float32)
                       for a in (quat, pos, q, vb, qd))
            s_r, imp_r = ct.fb_step_ground(
                ffm, st, jnp.asarray(tau[k], jnp.float32), 1e-3, feet,
                jnp.asarray(foff, jnp.float32), mu=0.8, ground_geoms=gg,
                mu_ground=0.55)
            for name, ref in (("q2", s_r[2]), ("vb2", s_r[3]),
                              ("imp", imp_r)):
                ref = np_.asarray(ref)
                scale = max(1.0, np_.abs(ref).max())
                err = np_.abs(got[name][k] - ref).max() / scale
                assert err < 3e-5, f"{name}@state{k}: rel err {err:.3e}"


def test_md_step_ground_fused_kernel_on_tpu(tpu_setup):
    """The multi-dof frictional ground-step kernel
    (md_contact_fused._md_step_ground_body: generalized transforms/RNEA/
    CRBA, merged multi-rhs active-region Cholesky, PGS, quaternion
    retraction) through real Mosaic lowering vs the single-state CPU
    path, on a freejoint + ball-hip quadruped."""
    import jax
    g, jnp, models = tpu_setup
    import numpy as np_
    from gridcodegenerator_tpu.ops import collision as col
    from gridcodegenerator_tpu.ops import md_contact as mc
    from gridcodegenerator_tpu.ops import multidof as md

    legs = []
    for kk in range(4):
        ang = 45 + 90 * kk
        legs.append(f"""
      <body name="hip{kk}" pos="0.18 0 0" euler="0 0 {ang}">
        <joint name="hip{kk}_j" type="ball" damping="1.2"/>
        <geom type="capsule" size="0.04" fromto="0 0 0 0.22 0 0"/>
        <body name="shin{kk}" pos="0.22 0 0">
          <joint name="knee{kk}_j" axis="0 1 0" damping="1.2"/>
          <geom type="capsule" size="0.04" fromto="0 0 0 0.3 0 0"/>
          <site name="foot{kk}" pos="0.3 0 0"/>
        </body>
      </body>""")
    src_mj = f"""
<mujoco model="ball_ant"><compiler angle="degree"/>
  <default><geom density="800"/></default>
  <worldbody><body name="torso"><freejoint/>
    <geom type="sphere" size="0.18" density="500"/>
    {''.join(legs)}
  </body></worldbody></mujoco>"""
    desc = g.parse_mjcf(src_mj)
    mdm = md.multidof_model_from_description(desc, dtype=jnp.float32)
    sites = g.mjcf_sites(src_mj)
    feet = tuple(sites[f"foot{kk}"].link for kk in range(4))
    offs = np_.stack([sites[f"foot{kk}"].pos for kk in range(4)])
    gg = col.make_geoms([0], a=[[0, 0, 0]], r=0.18)

    rng = np_.random.default_rng(71)
    B = 256
    q0 = np_.array(md.neutral_q(mdm), np_.float64)
    qs, qds, taus = [], [], []
    for e in range(B):
        d = rng.uniform(-0.25, 0.25, mdm.nv)
        qe = np_.array(md.md_tangent_apply(
            mdm, jnp.asarray(q0, jnp.float32),
            jnp.asarray(d, jnp.float32)), np_.float64)
        qe[6] = rng.uniform(0.0, 0.15)
        qs.append(qe)
        qds.append(rng.uniform(-0.4, 0.4, mdm.nv))
        taus.append(rng.uniform(-3, 3, mdm.nv))
    f32 = lambda a: jnp.asarray(np_.stack(a), jnp.float32)
    qs, qds, taus = f32(qs), f32(qds), f32(taus)

    (q2, v2), imp = mc.md_step_ground_batched(
        mdm, qs, qds, taus, 2e-3, feet, offs, mu=0.7, ground_geoms=gg,
        mu_ground=0.6, impl="pallas")
    got = dict(q2=np_.asarray(q2), v2=np_.asarray(v2),
               imp=np_.asarray(imp))
    assert got["imp"].shape == (B, 5, 3)
    assert (got["imp"][..., 2] > 0).any(), "no active contacts"

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        for k in (0, 127, 128, B - 1):
            (q1, v1), i1 = mc.md_step_ground(
                mdm, qs[k], qds[k], taus[k], 2e-3, feet,
                jnp.asarray(offs, jnp.float32), mu=0.7, ground_geoms=gg,
                mu_ground=0.6)
            for name, ref in (("q2", q1), ("v2", v1), ("imp", i1)):
                ref = np_.asarray(ref)
                scale = max(1.0, np_.abs(ref).max())
                err = np_.abs(got[name][k] - ref).max() / scale
                assert err < 3e-5, f"{name}@state{k}: rel err {err:.3e}"


def test_loop_fused_kernel_on_tpu(tpu_setup):
    """Loop-closure bilateral rows inside the fused ground-step kernel
    (contact_fused._loop_rows_s + the eq rows of _pgs_rows) through real
    Mosaic lowering vs the single-state CPU path: the floating four-bar
    standing on frictional ground — cone and eq rows exchanging impulse
    in one VMEM-resident PGS solve."""
    import jax
    g, jnp, models = tpu_setup
    import numpy as np_
    from gridcodegenerator_tpu.models import zoo
    from gridcodegenerator_tpu.ops import contact as ct
    from gridcodegenerator_tpu.ops import freeflyer as ff

    desc = g.parse_urdf(zoo.four_bar())
    ffm = ff.free_flyer_model(desc, dtype=jnp.float32)
    n = ffm.n
    names = desc.topology.link_names
    pairs = ((names.index("coupler"), names.index("rocker")),)
    oa = np_.array([[0.8, 0.0, 0.0]])
    ob = np_.array([[0.0, 0.0, -0.5]])
    links = (names.index("rocker"), names.index("crank"))
    offs = np_.array([[0.0, 0.0, -0.25], [0.0, 0.0, -0.25]])

    rng = np_.random.default_rng(59)
    B = 256
    quat = np_.tile([1.0, 0, 0, 0], (B, 1)) + 0.1 * rng.normal(size=(B, 4))
    quat /= np_.linalg.norm(quat, axis=1, keepdims=True)
    pos = np_.concatenate([rng.uniform(-0.2, 0.2, (B, 2)),
                           rng.uniform(0.2, 0.3, (B, 1))], axis=1)
    q = rng.uniform(-0.2, 0.2, (B, n))
    vb = rng.uniform(-1, 1, (B, 6))
    qd = rng.uniform(-1, 1, (B, n))
    tau = rng.uniform(-1, 1, (B, n))
    f32 = lambda a: jnp.asarray(a, jnp.float32)

    nxt, imp = ct.fb_step_ground_batched(
        ffm, tuple(f32(s) for s in (quat, pos, q, vb, qd)), f32(tau),
        1e-3, links, offs, mu=0.8, iters=60, loops=(pairs, oa, ob),
        impl="pallas")
    got = dict(q2=np_.asarray(nxt[2]), vb2=np_.asarray(nxt[3]),
               imp=np_.asarray(imp))
    assert (got["imp"][..., 2] > 0).any(), "no active ground contacts"

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        for k in (0, 127, 128, B - 1):
            st = tuple(jnp.asarray(a[k], jnp.float32)
                       for a in (quat, pos, q, vb, qd))
            s_r, imp_r = ct.fb_step_ground(
                ffm, st, jnp.asarray(tau[k], jnp.float32), 1e-3, links,
                jnp.asarray(offs, jnp.float32), mu=0.8, iters=60,
                loops=(pairs, oa, ob))
            for name, ref in (("q2", s_r[2]), ("vb2", s_r[3]),
                              ("imp", imp_r)):
                ref = np_.asarray(ref)
                scale = max(1.0, np_.abs(ref).max())
                err = np_.abs(got[name][k] - ref).max() / scale
                assert err < 3e-5, f"{name}@state{k}: rel err {err:.3e}"


def test_so_fused_kernel_on_tpu(tpu_setup):
    """The fused second-order kernel (ops/kernels/so_fused.py: primal
    gradient pipeline + per-direction tangent sweep, direction on the
    kernel grid) through real Mosaic lowering vs the CPU vmap Hessian on
    sampled states. NOTE the compile bill: 3 per-argument pallas_calls ×
    n directions each trace a gradient+JVP program (~11 min cold on the
    tunnel for iiwa-14, BENCHLOG r3s8) — warm runs ride the persistent
    cache. λᵀ·H only (the DDP production shape; the full-tensor kernel
    shares the body modulo the contraction)."""
    import jax
    g, jnp, models = tpu_setup
    desc, _, model = models["iiwa14"]
    n = desc.n
    B = 1024                                    # one 2-D batch tile
    rng = np.random.default_rng(31)
    qh, qdh, uh, lamh = (rng.uniform(-1, 1, (B, n)).astype(np.float32)
                         for _ in range(4))
    H = np.asarray(g.forward_dynamics_hessian_vp(
        model, jnp.asarray(qh), jnp.asarray(qdh), jnp.asarray(uh),
        jnp.asarray(lamh), impl="pallas"))
    assert H.shape == (B, 3 * n, 3 * n)

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        for k in (0, 511, B - 1):
            ref = np.asarray(g.forward_dynamics_hessian_vp(
                model, jnp.asarray(qh[k]), jnp.asarray(qdh[k]),
                jnp.asarray(uh[k]), jnp.asarray(lamh[k])))
            scale = max(1.0, np.abs(ref).max())
            err = np.abs(H[k] - ref).max() / scale
            # forward-over-analytic depth ≈ 2× the ∇FD pipeline floor
            assert err < 5e-5, f"state {k}: rel err {err:.3e}"


def test_so_staged_pipeline_on_tpu(tpu_setup):
    """The staged large-robot Hessian pipeline (ops/kernels/so_staged.py:
    direction-gridded T1/T2/T4/T5 tangent kernels + symmetry assembly) on
    Atlas through real Mosaic lowering vs the CPU vmap Hessian on sampled
    states — validates the lane-tier tangent bodies (jvp-of-CRBA, jvp of
    the column-blocked ∂ID) that interpret mode cannot."""
    import jax
    g, jnp, models = tpu_setup
    from gridcodegenerator_tpu.models import zoo
    model = g.load_robot(zoo.atlas(damping=0.1), dtype=jnp.float32)
    n = model.n
    B = 256
    rng = np.random.default_rng(37)
    qh, qdh, uh, lamh = (rng.uniform(-1, 1, (B, n)).astype(np.float32)
                         for _ in range(4))
    H = np.asarray(g.forward_dynamics_hessian_vp(
        model, jnp.asarray(qh), jnp.asarray(qdh), jnp.asarray(uh),
        jnp.asarray(lamh), impl="pallas"))
    assert H.shape == (B, 3 * n, 3 * n)

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        for k in (0, B - 1):
            ref = np.asarray(g.forward_dynamics_hessian_vp(
                model, jnp.asarray(qh[k]), jnp.asarray(qdh[k]),
                jnp.asarray(uh[k]), jnp.asarray(lamh[k])))
            scale = max(1.0, np.abs(ref).max())
            err = np.abs(H[k] - ref).max() / scale
            # n=28 recursion depth ≈ 4× the iiwa pipeline floor
            assert err < 2e-4, f"state {k}: rel err {err:.3e}"


def test_pallas_vs_vmap_on_tpu(tpu_setup):
    """The two production paths must agree to the f32 accumulation floor
    (both f32, same device) — catches Mosaic miscompiles without any golden
    transfer. They do NOT share accumulation order (the fused kernel stages
    batch-last tiles; the vmap path lets XLA fuse per-state graphs), so the
    bound is ~2× each path's own rounding floor vs golden (~2.7e-6 measured,
    PARITY.md), not bit-for-bit: measured 3.8e-6 on v5e (2026-08). A real
    miscompile produces O(1) disagreement."""
    g, jnp, models = tpu_setup
    desc, _, model = models["iiwa14"]
    q, qd, u = map(jnp.asarray, _state(desc.n, 1536, seed=5))
    a = np.asarray(g.forward_dynamics_gradient(model, q, qd, u, impl="pallas"))
    b = np.asarray(g.forward_dynamics_gradient(model, q, qd, u, impl="vmap"))
    scale = max(1.0, np.abs(b).max())
    assert np.abs(a - b).max() / scale < 1e-5


def test_accurate_trig_ab_on_tpu(tpu_setup):
    """A/B the Cody-Waite sincos (ops/trig.py) against the TPU's stock f32
    sin/cos, end-to-end on ∇FD vs the f64 golden model. Records which one
    wins so bench.py's default can follow the hardware evidence."""
    import dataclasses
    g, jnp, models = tpu_setup
    desc, gold, model = models["iiwa14"]
    n = desc.n
    B = 1024
    qh, qdh, uh = _state(n, B, seed=23)
    q, qd, u = jnp.asarray(qh), jnp.asarray(qdh), jnp.asarray(uh)

    # raw sincos accuracy on hardware
    s_hw = np.asarray(jnp.ravel(jnp.sin(q)))
    from gridcodegenerator_tpu.ops.trig import sincos
    s_cw = np.asarray(np.ravel(np.asarray(sincos(q)[0])))
    s_ref = np.sin(qh.astype(np.float64)).ravel()
    e_hw, e_cw = np.abs(s_hw - s_ref).max(), np.abs(s_cw - s_ref).max()
    print(f"\nTPU sin abs err: stock={e_hw:.2e} cody-waite={e_cw:.2e}")

    errs = {}
    for label, m in (("stock", model),
                     ("accurate", dataclasses.replace(model, accurate_trig=True))):
        out = np.asarray(
            g.forward_dynamics_gradient(m, q, qd, u, impl="pallas"))
        es = []
        for k in range(16):
            ref = gold.fd_grad(qh[k].astype(np.float64),
                               qdh[k].astype(np.float64),
                               uh[k].astype(np.float64))
            es.append(np.abs(out[k].astype(np.float64) - ref).max()
                      / max(1.0, np.abs(ref).max()))
        errs[label] = max(es)
        print(f"∇FD rel err ({label} sincos): {errs[label]:.3e}")
    # Hardware verdict (v5e, 2026-08): the stock f32 sin/cos is already
    # ~1e-7 accurate and WINS end-to-end (stock 2.7e-6 vs cody-waite 5.1e-6
    # — the CW path's extra arithmetic just reorders f32 rounding), so the
    # library default accurate_trig=False follows the evidence (PARITY.md).
    # Assert both paths sit at the f32 floor and the default path is the
    # better one. 4.5e-6 = measured hardware max (~3.6e-6) + headroom.
    assert errs["stock"] < 4.5e-6
    assert errs["accurate"] < 2e-5
    assert errs["stock"] <= errs["accurate"] * 1.1
