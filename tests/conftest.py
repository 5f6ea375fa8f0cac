"""Test configuration: CPU backend with 8 virtual devices (for mesh/sharding
tests) and float64 enabled so parity tolerances can be driven to ~1e-12."""

import os

# Hard-set (not setdefault): this box exports JAX_PLATFORMS=axon and its
# sitecustomize force-registers the axon TPU-tunnel plugin. The platform set
# must be pinned to CPU *before any backend initializes* — `jax.devices("cpu")`
# would initialize every registered plugin including axon, and a wedged tunnel
# then hangs the whole suite at collection time (round-1 postmortem).
# Exception: the real-TPU kernel tier (`GRID_TPU_TESTS=1 pytest -m tpu`)
# keeps the TPU backend and skips the CPU pinning/x64 below.
_TPU_TIER = os.environ.get("GRID_TPU_TESTS") == "1"
if not _TPU_TIER:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )

import jax  # noqa: E402

if not _TPU_TIER:
    jax.config.update("jax_platforms", "cpu")  # axon is never initialized
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_num_cpu_devices", 8)  # virtual mesh devices
# Persistent compilation cache. TPU tier: the shared TPU dir. CPU tier: a
# PER-HOST-CPU dir (gridcodegenerator_tpu.utils.cache — full postmortem
# there): foreign-host XLA:CPU AOT entries can crash on load, and — the
# reason the cache is load-bearing, not just a speedup — XLA:CPU
# compilation itself segfaults nondeterministically once one process has
# compiled O(hundreds) of programs (r4s1: repeatable at ~30% of a cold
# full-suite run). A warm cache keeps suite runs far below that horizon;
# a cold warm-up run that crashes mid-way keeps its written entries, so
# rerunning converges.
if _TPU_TIER:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
else:
    from gridcodegenerator_tpu.utils.cache import cpu_cache_dir
    jax.config.update("jax_compilation_cache_dir", cpu_cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

import gridcodegenerator_tpu as g  # noqa: E402
from gridcodegenerator_tpu.models import zoo  # noqa: E402

# robots used across the suite; AD cross-checks restrict to the smaller ones
# (jacfwd over the unrolled graphs is compile-heavy for n≳20)
ROBOTS = {
    "iiwa14": zoo.iiwa14(damping=0.1),
    "panda": zoo.panda(damping=0.15),
    "hyq": zoo.hyq(damping=0.2),
    "atlas": zoo.atlas(damping=0.05),
    "rand12": zoo.random_tree(12, seed=3),
    "chain5p": zoo.serial_chain(5, damping=0.1, prismatic_every=2),
    "dpend": zoo.double_pendulum(),
    # sibling joints fan out of a *moving* parent link: the backward-sweep
    # scatter-add (the reference's atomicAdd path) runs in the default suite
    "barm": zoo.branched_arm(damping=0.12),
}
# AD cross-checks (jacfwd of the whole unrolled pipeline) are compile-heavy;
# restrict them to small-n robots. GRAD_ROBOTS drops only atlas (n=28), whose
# analytic-gradient parity runs as a @slow test instead.
SMALL_ROBOTS = ["iiwa14", "chain5p", "dpend"]
GRAD_ROBOTS = ["iiwa14", "panda", "hyq", "rand12", "chain5p", "dpend", "barm"]

_cache: dict = {}


def get_setup(name: str):
    if name not in _cache:
        desc = g.parse_urdf(ROBOTS[name])
        _cache[name] = (
            desc,
            g.GoldenDynamics(desc),
            g.robot_model_from_description(desc, dtype=jnp.float64),
        )
    return _cache[name]


@pytest.fixture(params=list(ROBOTS))
def robot(request):
    return get_setup(request.param)


@pytest.fixture(params=SMALL_ROBOTS)
def small_robot(request):
    return get_setup(request.param)


@pytest.fixture(params=GRAD_ROBOTS)
def grad_robot(request):
    return get_setup(request.param)


@pytest.fixture
def iiwa():
    return get_setup("iiwa14")


def random_state(n, seed=0, batch=()):
    rng = np.random.default_rng(seed)
    shape = tuple(batch) + (n,)
    return (rng.uniform(-2.0, 2.0, shape), rng.uniform(-1.5, 1.5, shape),
            rng.uniform(-8.0, 8.0, shape))
