"""Worker process for tests/test_multihost.py: joins a 2-process CPU
jax.distributed cluster (2 virtual devices per process → a 4-device
global mesh), assembles a globally-sharded batch from process-local
states with ``host_local_batch`` (no cross-host data movement), runs the
sharded ∇FD compute path, and cross-checks its local rows against the
single-device answer. Not a test module (leading underscore) — invoked
by subprocess with ``<process_id> <num_processes> <port>``."""

import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=2")
    import jax
    jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import gridcodegenerator_tpu as g
    from gridcodegenerator_tpu.models import zoo
    from gridcodegenerator_tpu.parallel import mesh as pm
    from gridcodegenerator_tpu.parallel import multihost as mh

    mh.initialize(f"localhost:{port}", nproc, pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == 2 * nproc, jax.device_count()
    assert jax.local_device_count() == 2

    mesh = mh.global_mesh()                       # dp over all 4 devices
    assert mesh.devices.size == 2 * nproc

    desc = g.parse_urdf(zoo.iiwa14(damping=0.1))
    model = g.robot_model_from_description(desc)
    n = desc.n
    B_local = 4
    rng = np.random.default_rng(100 + pid)        # DIFFERENT data per host
    q, qd, u = (rng.uniform(-1.0, 1.0, (B_local, n)).astype(np.float32)
                for _ in range(3))

    qg, qdg, ug = mh.host_local_batch(mesh, q, qd, u)
    assert qg.shape == (B_local * nproc, n), qg.shape
    # no cross-host movement: this process's devices hold exactly its rows
    # (shard.index is GLOBAL; this host's block starts at pid*B_local)
    off = pid * B_local
    for shard in qg.addressable_shards:
        sl = shard.index[0]
        np.testing.assert_array_equal(
            np.asarray(shard.data), q[sl.start - off:sl.stop - off])

    fgrad = pm.sharded_fd_grad(pm.replicate_model(model, mesh), mesh)
    J = fgrad(qg, qdg, ug)
    assert J.shape == (B_local * nproc, n, 2 * n), J.shape

    # local rows == the single-device answer on this host's own states
    ref = np.asarray(g.forward_dynamics_gradient(model, q, qd, u,
                                                 impl="vmap"))
    got = np.concatenate([np.asarray(s.data) for s in
                          sorted(J.addressable_shards,
                                 key=lambda s: s.index[0].start or 0)])
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)
    print(f"worker {pid}: ok", flush=True)


if __name__ == "__main__":
    main()
