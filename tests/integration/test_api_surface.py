"""The public API surface matches the reference: ``tools/api_diff.py``
statically walks every reference module (classes, methods, functions,
module-level names) and asserts gpflow_tpu exposes each one, modulo the
documented deviations listed in its EXCUSED table (PARITY.md)."""
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[2]
REF = Path("/root/reference/gpflow")


@pytest.mark.skipif(not REF.exists(), reason="reference checkout not present")
def test_api_surface_has_no_unexcused_gaps():
    proc = subprocess.run(
        [sys.executable, str(REPO / "tools" / "api_diff.py")],
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert proc.returncode == 0, f"API gaps vs reference:\n{proc.stdout}\n{proc.stderr}"
    assert "unexcused gaps: 0" in proc.stdout
