"""Real-hardware validation (VERDICT r1 #10): runs tools/tpu_smoke.py — the
f32 smoke sweep over every model family incl. the Pallas compiled path — in
a subprocess against the REAL TPU backend, every suite run.

The main suite's conftest pins this process to the virtual CPU mesh, so the
sweep runs in a child process WITHOUT the platform override. Skips (never
fails) when no TPU is reachable or the tunnel is too congested to finish.
"""
import os
import pathlib
import subprocess
import sys

import pytest

pytestmark = pytest.mark.tpu

REPO = pathlib.Path(__file__).resolve().parent.parent.parent
TIMEOUT_S = 1500


def test_tpu_smoke_sweep():
    env = dict(os.environ)
    # undo the test-suite CPU override; let the sitecustomize pick the TPU
    env.pop("JAX_PLATFORMS", None)
    flags = (env.get("XLA_FLAGS", "")
             .replace("--xla_force_host_platform_device_count=8", "")).strip()
    if flags:
        env["XLA_FLAGS"] = flags
    else:
        env.pop("XLA_FLAGS", None)  # a whitespace-only value crashes XLA
    axon_site = "/root/.axon_site"
    pythonpath = str(REPO)
    if os.path.isdir(axon_site):
        pythonpath += os.pathsep + axon_site
    env["PYTHONPATH"] = pythonpath

    try:
        probe = subprocess.run(
            [sys.executable, "-c",
             "import jax; import sys; sys.exit(0 if jax.default_backend() == 'tpu' else 3)"],
            env=env, capture_output=True, text=True, timeout=300, cwd="/tmp",
        )
    except subprocess.TimeoutExpired:
        pytest.skip("TPU probe timed out (congested tunnel)")
    if probe.returncode != 0:
        pytest.skip(
            f"no TPU backend reachable (probe rc={probe.returncode}): "
            f"{probe.stderr[-300:]}"
        )

    try:
        proc = subprocess.run(
            [sys.executable, str(REPO / "tools" / "tpu_smoke.py")],
            env=env, capture_output=True, text=True, timeout=TIMEOUT_S, cwd="/tmp",
        )
    except subprocess.TimeoutExpired:
        pytest.skip(f"TPU smoke exceeded {TIMEOUT_S}s (congested tunnel)")
    sys.stdout.write(proc.stdout)
    assert proc.returncode == 0, (
        f"TPU smoke sweep failed (rc={proc.returncode}):\n"
        f"{proc.stdout[-3000:]}\n{proc.stderr[-3000:]}"
    )
    assert "TPU SMOKE: ALL OK" in proc.stdout
