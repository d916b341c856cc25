"""Cross-host SPMD launcher (SURVEY.md P5).

The reference is single-process; scaling across hosts here uses JAX's
standard distributed runtime: every host runs the same program,
`jax.distributed.initialize` wires the cluster (XLA provides transport over
ICI/DCN — no external NCCL/MPI), and the global mesh spans all hosts'
devices.  The SIPP prover is stateless per round, so a failed run restarts
from the (replicated) inputs — the failure-handling philosophy of the
reference (SURVEY.md §5) carried to multi-host.

Usage (each host):
    python -m sipp_tpu.parallel.launcher --n 65536 \
        --coordinator host0:1234 --num-hosts 4 --host-id $ID

Single-host multi-chip needs no launcher: make_mesh() spans local devices.
"""

import argparse
import sys
import time


def initialize(coordinator: str = None, num_hosts: int = None,
               host_id: int = None):
    import jax

    if coordinator is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_hosts,
            process_id=host_id,
        )
    return jax


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=128)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--coordinator", type=str, default=None)
    ap.add_argument("--num-hosts", type=int, default=None)
    ap.add_argument("--host-id", type=int, default=None)
    args = ap.parse_args(argv)

    jax = initialize(args.coordinator, args.num_hosts, args.host_id)
    from . import make_mesh, sipp_prove_sharded
    from ..protocol import sipp_verify
    from ..utils.testing import random_instance

    mesh = make_mesh()  # all devices across all hosts
    print(f"host {jax.process_index()}/{jax.process_count()}: "
          f"{len(jax.devices())} global devices", file=sys.stderr)
    a, b = random_instance(args.n, seed=args.seed)
    t0 = time.time()
    proof = sipp_prove_sharded(a, b, mesh)
    proof.block_until_ready()
    dt = time.time() - t0
    if jax.process_index() == 0:
        print(f"n={args.n} sharded prove: {dt:.2f}s "
              f"({args.n/dt:.1f} pairings/s aggregate)")
        sipp_verify(a, b, proof)
        print("verify OK")


if __name__ == "__main__":
    main()
