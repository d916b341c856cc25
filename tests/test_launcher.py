"""P5 coverage: the multi-process launcher actually wires a cluster.

Two local CPU processes (2 virtual devices each) join via
launcher.initialize, build the global mesh, and run a cross-process
collective — the transport the multi-host SIPP prover rides
(SURVEY.md §2.3 P5; reference has no distributed layer at all)."""

import os
import socket
import subprocess
import sys

_CHILD = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
from sipp_tpu.parallel.launcher import initialize
initialize(coordinator=sys.argv[1], num_hosts=2, host_id=int(sys.argv[2]))
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map
from sipp_tpu.parallel import make_mesh
assert jax.process_count() == 2, jax.process_count()
mesh = make_mesh()  # spans both processes' devices
assert mesh.devices.size == 4, mesh.devices
x = jnp.arange(4.0)

def f(x):
    return jax.lax.psum(x, "i")

y = jax.jit(shard_map(f, mesh=mesh, in_specs=P("i"), out_specs=P()))(x)
assert float(y[0]) == 6.0, y
print(f"proc {jax.process_index()} OK", flush=True)
"""


def test_two_process_cluster(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    script = tmp_path / "child.py"
    script.write_text(_CHILD)
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("PALLAS_AXON", "AXON"))}
    # repo root only: keeps the axon plugin off the cluster while letting
    # child scripts (which run from tmp_path) import sipp_tpu on hosts where
    # the package is not pip-installed
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), coord, str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env)
        for i in range(2)
    ]
    outs = []
    for i, p in enumerate(procs):
        try:
            out, err = p.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"proc {i} rc={p.returncode}\n{err[-2000:]}"
        outs.append(out)
    assert "proc 0 OK" in outs[0] and "proc 1 OK" in outs[1]
