#!/usr/bin/env python
"""Stage-level breakdown of the staged Atlas ∇FD pipeline (VERDICT r4 #5).

Times each kernel stage of ``kernels/staged.fd_grad_staged`` separately at
the headline batch, plus the composed pipeline, so the three candidate
costs named in BENCHMARKS.md (mask/predication arithmetic, sublane padding
on the lane tile, stage-launch bubbles) get attributed instead of guessed:

  K1   bias+v          K2'  CRBA+Chol M⁻¹+q̈      K4   vaf at true q̈
  K5×k column-blocked ∂ID (+fused −M⁻¹·∂c finish)

``sum(stages) ≈ total`` ⇒ no launch bubbles; the dominant stage is the
optimization target. (The static-``at[].add`` sow alternative was A/B'd
here r5 and is rejected by Mosaic — scatter-add unimplemented — so the
mask-FMA insertion is the only expressible form.) One JSON line on
stdout.
"""

import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BUDGET_S = float(os.environ.get("PROBE_BUDGET_S", "1500"))
T0 = time.monotonic()


def log(*a):
    print(f"[{time.monotonic()-T0:6.1f}s]", *a, file=sys.stderr, flush=True)


def watchdog():
    time.sleep(BUDGET_S)
    log("watchdog: budget exhausted")
    os._exit(3)


def main():
    threading.Thread(target=watchdog, daemon=True).start()
    import jax
    if os.environ.get("PROBE_CPU"):
        jax.config.update("jax_platforms", "cpu")
        from gridcodegenerator_tpu.utils.cache import cpu_cache_dir
        jax.config.update("jax_compilation_cache_dir", cpu_cache_dir())
    else:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    import gridcodegenerator_tpu as g
    from gridcodegenerator_tpu.models import zoo
    from gridcodegenerator_tpu.ops.kernels import staged

    log("backend", jax.default_backend())
    desc = g.parse_urdf(zoo.atlas(damping=0.05))
    model = g.robot_model_from_description(desc, dtype=jnp.float32)
    n = desc.n
    shift = int(os.environ.get("PROBE_SHIFT", "0"))
    B = 1 << (18 - shift)
    log(f"atlas n={n} B={B}")

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.uniform(-1, 1, (n, B)), jnp.float32)
    qd = jnp.asarray(rng.uniform(-1, 1, (n, B)), jnp.float32)
    u = jnp.asarray(rng.uniform(-5, 5, (n, B)), jnp.float32)

    def slope(fn, args, reps=12, trials=4):
        jax.block_until_ready(fn(*args))              # compile

        def enq(k):
            t0 = time.perf_counter()
            out = None
            for _ in range(k):
                out = fn(*args)
            leaf = jax.tree_util.tree_leaves(out)[0]
            np.asarray(leaf[(0,) * leaf.ndim])
            return time.perf_counter() - t0

        lo = max(1, reps // 4)
        ts = []
        for _ in range(trials):
            a, b = enq(lo), enq(reps)
            ts.append((b - a) / (reps - lo))
        good = [t for t in ts if t > 0]
        # min = least-contended trial (this box shares one CPU core with
        # background work; the device time is the floor)
        return float(np.min(good)) if good else enq(reps) / reps

    rows = {}

    # whole pipeline
    pipe = jax.jit(lambda q, qd, u: staged.fd_grad_staged(model, q, qd, u))
    rows["total"] = slope(pipe, (q, qd, u))
    log("total", rows["total"])

    # K1
    k1 = jax.jit(lambda q, qd: tuple(staged.bias_and_v_staged(
        model, q, qd, -9.81, None, False)))
    rows["K1_bias_v"] = slope(k1, (q, qd))
    c, v = k1(q, qd)

    # K2' (dense M^-1 + qdd)
    k2 = jax.jit(lambda q, r: tuple(staged.minv_qdd_dense_staged(
        model, q, r)))
    rows["K2_minv_qdd"] = slope(k2, (q, u - c))
    Minv, qdd = k2(q, u - c)

    # K4 (vaf at true qdd) — reuse the pipeline's body via id_grad's K1'
    from gridcodegenerator_tpu.ops import blops
    from gridcodegenerator_tpu.ops.kernels.fused import _pallas_batch_call
    from gridcodegenerator_tpu.ops.kernels.staged import _plan

    k1_block, k1_lane = _plan(None, 70.0 * n)

    def body_af(km, q, qd, qdd, v):
        X = blops.joint_transforms_bl(km, q)
        vl = [v[:, i] for i in range(km.n)]
        _, a, f = blops.rnea_fwd_bl(km, X, qd, qdd, -9.81, v_known=vl)
        _, f = blops.rnea_bwd_bl(km, X, f, None)
        return jnp.stack(a, axis=1), jnp.stack(f, axis=1)

    k4 = jax.jit(lambda q, qd, qdd, v: tuple(_pallas_batch_call(
        model, body_af, [q, qd, qdd, v], [(6, n)] * 2, k1_block, False,
        lane_tile=k1_lane)))
    rows["K4_vaf"] = slope(k4, (q, qd, qdd, v))
    a, f = k4(q, qd, qdd, v)

    # K5: one launch per (side, block) with the fused finish — time ONE
    # block per side and scale by the block count (uniform shapes)
    from gridcodegenerator_tpu.ops.kernels.staged import (_col_block,
                                                          _side_plan,
                                                          _k5_per_state,
                                                          _split_cols)
    extra = float(n * n)
    cb, plan = _side_plan(n, extra, None, True)
    blocks = _split_cols(None, n, cb)
    k5_block, k5_lane = _plan(None, _k5_per_state(n, cb, extra,
                                                  len(plan[0])))
    log(f"cb={cb} plan={plan} blocks={len(blocks)} lane={k5_lane}")

    c0, w = blocks[0]

    def body_grad(km, q, qd, v, a, f, Minv, sides=plan[0]):
        X = blops.joint_transforms_bl(km, q)
        vl = [v[:, i] for i in range(km.n)]
        al = [a[:, i] for i in range(km.n)]
        fl = [f[:, i] for i in range(km.n)]
        res = []
        for side in sides:
            rows_ = blops.rnea_grad_cols_bl(
                km, X, qd, vl, al, fl, -9.81, c0=c0, cb=w,
                sides=(side,), as_rows=True)[side]
            acc = None
            for i, r in enumerate(rows_):
                if r is None:
                    continue
                term = Minv[:, i][:, None] * r[None]
                acc = term if acc is None else acc + term
            res.append(-acc)
        return tuple(res)

    k5 = jax.jit(lambda *s: tuple(_pallas_batch_call(
        model, body_grad, list(s), [(n, w)] * len(plan[0]), k5_block,
        False, lane_tile=k5_lane)))
    t_k5_one = slope(k5, (q, qd, v, a, f, Minv))
    n_launches = len(blocks) * len(plan)
    rows["K5_one_launch"] = t_k5_one
    rows["K5_total_est"] = t_k5_one * len(blocks) * len(plan)

    # cb sweep (post fused-forward-loop restructure of rnea_grad_cols_bl:
    # the live set no longer scales with the old 19n·cb model, so wider
    # blocks may fit — measure instead of model). Also tries the merged
    # both-sides launch at each width. OOMs are data, not errors.
    sweep = {}
    for cb_try in (7, 14, 28):
        if n % cb_try:
            continue
        for merged in (False, True):
            sides_t = ("q", "qd") if merged else ("q",)
            tag = f"cb{cb_try}{'m' if merged else ''}"

            def mk(cb_t=cb_try, sides_t=sides_t):
                def body(km, q, qd, v, a, f, Minv):
                    X = blops.joint_transforms_bl(km, q)
                    vl = [v[:, i] for i in range(km.n)]
                    al = [a[:, i] for i in range(km.n)]
                    fl = [f[:, i] for i in range(km.n)]
                    res = []
                    for side in sides_t:
                        rows_ = blops.rnea_grad_cols_bl(
                            km, X, qd, vl, al, fl, -9.81, c0=0, cb=cb_t,
                            sides=(side,), as_rows=True)[side]
                        acc = None
                        for i, r in enumerate(rows_):
                            if r is None:
                                continue
                            term = Minv[:, i][:, None] * r[None]
                            acc = term if acc is None else acc + term
                        res.append(-acc)
                    return tuple(res)

                return jax.jit(lambda *s: tuple(_pallas_batch_call(
                    model, body, list(s), [(n, cb_t)] * len(sides_t),
                    None, False, lane_tile=True)))

            try:
                t1 = slope(mk(), (q, qd, v, a, f, Minv))
                launches = (n // cb_try) * (1 if merged else 2)
                sweep[tag] = {"one_launch_ms": t1 * 1e3,
                              "k5_total_est_ms": t1 * launches * 1e3}
                log(tag, sweep[tag])
            except Exception as e:
                sweep[tag] = {"error": f"{type(e).__name__}: {str(e)[:120]}"}
                log(tag, "failed:", type(e).__name__, str(e)[:160])

    total_est = (rows["K1_bias_v"] + rows["K2_minv_qdd"] + rows["K4_vaf"]
                 + rows["K5_total_est"])
    res = {"batch": B, "n": n, "cb": cb, "k5_launches": n_launches,
           "cb_sweep": sweep,
           "stages_ms": {k: (v * 1e3 if v is not None else None)
                         for k, v in rows.items()},
           "sum_stages_ms": total_est * 1e3,
           "bubble_ms": (rows["total"] - total_est) * 1e3,
           "evals_per_sec": B / rows["total"],
           "backend": jax.default_backend()}
    print(json.dumps(res), flush=True)
    os._exit(0)


if __name__ == "__main__":
    main()
