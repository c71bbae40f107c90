"""Real-hardware assertion of the fast-path error envelopes (VERDICT r3 #9):
runs tools/envelope_fuzz.py — FAST_MATMUL precision tiers, INV_SOLVE f32
conditioning sweep, f32 cached-Qinv ceiling — in a subprocess against the
REAL TPU backend (the precision tiers don't exist on CPU). Skips (never
fails) when no TPU is reachable."""
import os
import pathlib
import subprocess
import sys

import pytest

pytestmark = pytest.mark.tpu

REPO = pathlib.Path(__file__).resolve().parent.parent.parent
TIMEOUT_S = 1200


def test_tpu_error_envelopes():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    flags = (env.get("XLA_FLAGS", "")
             .replace("--xla_force_host_platform_device_count=8", "")).strip()
    if flags:
        env["XLA_FLAGS"] = flags
    else:
        env.pop("XLA_FLAGS", None)
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
        pytest.skip(f"no TPU backend reachable (probe rc={probe.returncode})")

    try:
        proc = subprocess.run(
            [sys.executable, str(REPO / "tools" / "envelope_fuzz.py")],
            env=env, capture_output=True, text=True, timeout=TIMEOUT_S, cwd="/tmp",
        )
    except subprocess.TimeoutExpired:
        pytest.skip(f"envelope fuzz exceeded {TIMEOUT_S}s (congested tunnel)")
    sys.stdout.write(proc.stdout)
    assert proc.returncode == 0, proc.stdout + proc.stderr[-2000:]
