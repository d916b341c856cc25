"""SIPP_POSEIDON_RC_FILE hook round-trip (VERDICT r2 item 5).

plonky2's 360 Poseidon round constants are not obtainable offline; the hook
makes the eventual swap a file drop.  This test proves the swap path WORKS:
load an external table in a fresh interpreter and check that (a) all three
engines — host Python, device kernel, native C++ transcript chain — agree
under the swapped table, and (b) a full prove/verify roundtrip stays green.
Constants bind at import, so the child runs in a subprocess.
"""

import json
import os
import subprocess
import sys

_CHILD = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from sipp_tpu.fields import FGL, poseidon

# (a) the external table was actually loaded
ext = [int(tok, 0) for tok in open(sys.argv[1]).read().split()]
flat = [v for row in poseidon.ROUND_CONSTANTS for v in row]
assert flat == [v % poseidon.P for v in ext], "table not loaded"
assert flat[0] != 0xB585F766F2144405 or True  # arbitrary table, no claim

# (b) three-engine agreement under the swapped table
inp = list(range(1, 9))
host = poseidon.hash_no_pad(inp)
dev = FGL.decode(
    poseidon.hash_no_pad_device(np.asarray(FGL.encode(inp))[None])[0])
assert host == list(dev), (host, dev)
from sipp_tpu import native
if native.get_lib() is not None:
    assert native.hash_no_pad(inp) == host, "C++ chain disagrees"

# (c) full protocol roundtrip with the swapped transcript
from sipp_tpu.protocol import sipp_prove, sipp_verify
from sipp_tpu.utils.testing import random_instance
a, b = random_instance(2, seed=11)
sipp_verify(a, b, sipp_prove(a, b))
print("RC-HOOK OK", flush=True)
"""


def test_rc_file_hook_roundtrip(tmp_path):
    # an alternate deterministic table (NOT the default), mixed formats
    alt = [(0x9E3779B97F4A7C15 * (i + 1)) % 2**64 for i in range(360)]
    rc_file = tmp_path / "rc.txt"
    rc_file.write_text(" ".join(
        hex(v) if i % 2 else str(v) for i, v in enumerate(alt)))
    script = tmp_path / "child.py"
    script.write_text(_CHILD)
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("PALLAS_AXON", "AXON"))}
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo
    env["SIPP_POSEIDON_RC_FILE"] = str(rc_file)
    r = subprocess.run([sys.executable, str(script), str(rc_file)],
                       capture_output=True, text=True, timeout=600, env=env,
                       cwd=repo)
    assert r.returncode == 0, r.stderr[-3000:]
    assert "RC-HOOK OK" in r.stdout


def test_rc_file_validation(tmp_path):
    from sipp_tpu.fields import poseidon

    bad = tmp_path / "short.json"
    bad.write_text(json.dumps(list(range(10))))
    try:
        poseidon._load_round_constants(str(bad))
        raise AssertionError("short table accepted")
    except ValueError as e:
        assert "expected 360" in str(e)
    good = tmp_path / "ok.json"
    good.write_text(json.dumps(list(range(360))))
    tbl = poseidon._load_round_constants(str(good))
    assert len(tbl) == 30 and len(tbl[0]) == 12 and tbl[0][5] == 5
