"""The examples/ showcase is a contract, not luck: every script must
run to completion (rc=0) and print its key result lines.

Each example runs in a subprocess with RAYOPT_TPU_FORCE_CPU=1 (never
touch a possibly-wedged accelerator tunnel) and
RAYOPT_TPU_EXAMPLE_QUICK=1 (fewer gradient steps / Monte-Carlo
samples).  These are the slowest tests in the suite and live in the
full tier (see conftest/Makefile)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXAMPLES = os.path.join(REPO, "examples")

#: script -> substrings that must appear in its stdout
KEY_LINES = {
    "design_workflow.py": ["EFL", "gradient steps", "tolerance MC"],
    "advanced_analysis.py": ["Seidel tolerancing",
                             "seq import", "html report"],
    "precision_and_scale.py": ["df32", "merit", "tolerancing"],
    "polarization_and_cylinders.py": ["diattenuation", "anamorphic"],
    "spectrograph_and_wideangle.py": ["blaze", "fisheye",
                                      "tolerancing farm"],
    "achromat_design.py": ["thin-lens achromat prediction",
                           "color improvement", "achromat designed"],
    "alignment_and_pose.py": ["pose sensitivity",
                              "pose tolerance MC",
                              "alignment compensation",
                              "compensator written back"],
}


def _run(name, tmp_path, timeout=1500):
    env = dict(os.environ)
    env["RAYOPT_TPU_FORCE_CPU"] = "1"
    env["RAYOPT_TPU_EXAMPLE_QUICK"] = "1"
    env["MPLBACKEND"] = "agg"
    script = os.path.join(EXAMPLES, name)
    args = [sys.executable, script]
    if name in ("design_workflow.py", "advanced_analysis.py"):
        args.append(str(tmp_path))
    r = subprocess.run(args, env=env, cwd=REPO, timeout=timeout,
                       capture_output=True, text=True)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    return r.stdout


@pytest.mark.slow
@pytest.mark.parametrize("name", sorted(KEY_LINES))
def test_example_runs(name, tmp_path):
    out = _run(name, tmp_path)
    lower = out.lower()
    for key in KEY_LINES[name]:
        assert key.lower() in lower, (name, key, out[-2000:])
