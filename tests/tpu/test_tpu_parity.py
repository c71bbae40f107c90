"""Real-hardware float64 parity (VERDICT r2 #1): runs tools/tpu_parity.py —
the five BASELINE.json configs trained in f64 ON THE TPU BACKEND, objectives
asserted against dense-NumPy oracles at rtol 1e-6 — in a subprocess, every
suite run. The committed artifact is /root/repo/PARITY_TPU.json.

The main suite's conftest pins this process to the virtual CPU mesh, so the
parity run goes in a child process WITHOUT the platform override. Skips
(never fails) when no TPU is reachable or the tunnel is too congested.
"""
import json
import os
import pathlib
import subprocess
import sys

import pytest

pytestmark = [pytest.mark.tpu, pytest.mark.slow]

REPO = pathlib.Path(__file__).resolve().parent.parent.parent
TIMEOUT_S = 2700


def _tpu_env():
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
    return env


def test_tpu_f64_parity(tmp_path):
    env = _tpu_env()
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

    out = tmp_path / "parity.json"
    try:
        proc = subprocess.run(
            [sys.executable, str(REPO / "tools" / "tpu_parity.py"), str(out)],
            env=env, capture_output=True, text=True, timeout=TIMEOUT_S, cwd="/tmp",
        )
    except subprocess.TimeoutExpired:
        pytest.skip(f"TPU parity exceeded {TIMEOUT_S}s (congested tunnel)")
    sys.stdout.write(proc.stdout)
    assert proc.returncode == 0, (
        f"TPU f64 parity failed (rc={proc.returncode}):\n"
        f"{proc.stdout[-3000:]}\n{proc.stderr[-3000:]}"
    )
    artifact = json.loads(out.read_text())
    assert artifact["ok"] and artifact["backend"] == "tpu"
    assert artifact["dtype"] == "float64" and len(artifact["results"]) >= 9
