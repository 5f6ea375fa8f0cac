"""Execute every example script (VERDICT r3 weak #6 / next #5): the
16-script showcase layer (iLQR, DDP, BPTT, RL, identification, OSC,
Newton-on-manifold, loop closures …) regressed invisibly because nothing
ran it. This tier runs each script in a subprocess with ``--cpu`` and
reduced sizes — small enough for a 1-core host, large enough that each
example's OWN success assertions still hold (identification errors,
LQR contraction, OSC convergence, Newton residuals: those asserts are
the point of the examples, so they are kept active, not bypassed).

Opt-in marker (compile cost ≈ minutes/script on one core)::

    python -m pytest tests/test_examples.py -m examples -q
"""

import os
import subprocess
import sys

import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_EX = os.path.join(_ROOT, "examples")

# script → reduced-size args. Sizes are chosen per script: unasserted
# demos run at token sizes; scripts with convergence asserts keep the
# iteration counts those asserts need (measured r4s1, BENCHLOG).
_CASES = {
    "collision_envs.py": ["--envs", "8", "--steps", "40"],
    "ddp_full_newton.py": ["--steps", "10", "--iters", "3"],
    "four_bar.py": ["--iters", "15"],
    "freeflyer_detumble.py": ["--steps", "2000"],  # arm fold needs ~2 s
    "friction_id.py": ["--steps", "40", "--gd-iters", "12"],
    "humanoid_posture_lqr.py": ["--steps", "1200"],
    "mjcf_randomized_ant.py": ["--envs", "4", "--steps", "60",
                               "--rand-envs", "2"],
    "newton_manifold.py": ["--iters", "20"],
    "osc_reaching.py": ["--envs", "2", "--steps", "800"],
    "parallel_envs.py": ["--envs", "4", "--steps", "450"],  # must settle
    "policy_bptt.py": ["--envs", "4", "--steps", "24", "--iters", "3"],
    "quadruped_stance.py": ["--steps", "400"],
    "rl_locomotion.py": ["--pop", "4", "--envs", "8", "--steps", "20",
                         "--gens", "2", "--iters", "8"],
    "system_id.py": ["--samples", "60", "--holdout", "16"],
    "terrain_id.py": ["--steps", "30", "--gd-iters", "10"],
    "trajopt_ilqr.py": ["--steps", "12", "--iters", "4"],
}


def test_every_example_has_a_case():
    """The table can't silently rot: a new example must get a row."""
    scripts = sorted(f for f in os.listdir(_EX) if f.endswith(".py"))
    assert scripts == sorted(_CASES), (
        "examples/ and the _CASES table disagree — add reduced-size args "
        "for the new script(s)")


@pytest.mark.examples
@pytest.mark.parametrize("script", sorted(_CASES))
def test_example_runs(script):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # each script pins CPU itself via --cpu
    proc = subprocess.run(
        [sys.executable, os.path.join(_EX, script), "--cpu",
         *_CASES[script]],
        cwd=_ROOT, env=env, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, (
        f"{script} failed (rc={proc.returncode})\n"
        f"--- stdout ---\n{proc.stdout[-3000:]}\n"
        f"--- stderr ---\n{proc.stderr[-3000:]}")
