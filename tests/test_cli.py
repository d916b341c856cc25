"""CLI end-to-end: prove -> save -> verify -> statement file."""

import os
import subprocess
import sys


def test_cli_prove_verify(tmp_path):
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="")
    proof = str(tmp_path / "p.npz")
    stmt = str(tmp_path / "s.u32")
    r = subprocess.run(
        [sys.executable, "-m", "sipp_tpu.cli", "prove", "--n", "4",
         "--seed", "3", "--out", proof],
        env=env, capture_output=True, text=True, timeout=1200,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert proof in r.stdout
    r = subprocess.run(
        [sys.executable, "-m", "sipp_tpu.cli", "verify", "--proof", proof,
         "--statement", stmt],
        env=env, capture_output=True, text=True, timeout=1200,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "OK" in r.stdout
    # statement file has the exact wire size 48n+240 u32
    assert os.path.getsize(stmt) == 4 * (48 * 4 + 240)
