"""End-to-end smoke tests for the CLI apps (headless).

The reference's executables are driven by hand (SURVEY.md section 4 — no
test suite); here every shipped entry point must at least run a tiny
workload to completion on the CPU mesh.
"""

import json
import os

from tests.conftest import CONFIG_DIR

CFG = os.path.join(CONFIG_DIR, "scenario_two_straight.yaml")


def test_motion_planning_app_smoke(capsys):
    """The flagship closed-loop app (reference src/motion_planning.cpp
    main) runs headless for a couple of ticks."""
    from ilqr_tpu.apps.motion_planning import main

    assert main(["-c", CFG, "--no-viz", "--ticks", "2", "--f32"]) == 0


def test_sweep_app_smoke(capsys):
    """The batched sweep driver runs a step on the 8-virtual-device mesh
    (XLA engine; the kernel engine is covered by interpret tests)."""
    from ilqr_tpu.apps.sweep import main

    assert main(["-c", CFG, "--batch", "8", "--steps", "1",
                 "--engine", "xla"]) == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    result = json.loads(out)
    assert result["total_solves"] == 8
    assert 0.0 <= result["converged_frac"] <= 1.0


def test_sweep_app_checkpoint_resume(tmp_path, capsys):
    """Sweep cursor checkpointing: a resumed run skips completed steps."""
    from ilqr_tpu.apps.sweep import main

    ckpt = str(tmp_path / "ckpt")
    assert main(["-c", CFG, "--batch", "8", "--steps", "1",
                 "--engine", "xla", "--checkpoint-dir", ckpt]) == 0
    capsys.readouterr()
    # second run: step 0 already done -> zero new solves
    assert main(["-c", CFG, "--batch", "8", "--steps", "1",
                 "--engine", "xla", "--checkpoint-dir", ckpt]) == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    assert json.loads(out)["total_solves"] == 0
