"""Config-5 proxy: scaling-efficiency measurement for the sharded prover.

Real multi-host TPU hardware is unavailable in this environment (BASELINE.md
config 5), so this measures what CAN be measured and models the rest:

  * the cross-products round program (the sharded prover's only per-round
    device program with a collective, parallel/sharded.py) at d = 1/2/4/8 on
    the virtual CPU mesh, fixed TOTAL n — strong scaling;
  * the same program with the all_gather + replicated tail tree REMOVED
    (per-shard partials returned sharded), isolating the collective +
    replicated-tail cost from per-shard compute on this host;
  * the collective payload, counted exactly from the program: ONE all_gather
    of 2 Fq12 = 2*2*3*2*16 u32 = 1.5 KiB per device per round, plus the
    log2(d)-depth replicated 2d-leaf Fq12 tree.

Model for a real v5e ICI mesh (applied in RESULTS.md): all_gather of S bytes
over a d-device ring costs ~ (d-1)/d * S / BW_ici + hop latency * (d-1);
with S = 1.5 KiB the transfer is ~microseconds against a per-round compute
of milliseconds, so predicted efficiency stays >0.99 until the per-device
lane count (n/2d) drops under one Miller-kernel chunk — the measured
compute-vs-width curve below quantifies exactly that knee.

Run:  JAX_PLATFORMS=cpu PYTHONPATH= XLA_FLAGS=--xla_force_host_platform_device_count=8 \
          python tools/scaling_model.py [n_total] [reps]
Emits one JSON line per (d, variant) and a summary line; NOTE the virtual
mesh timeshares this host's cores (nproc), so wall-clock at d > nproc
under-reports a real mesh — the per-shard compute width, not the device
count, is the transferable signal.
"""

import functools
import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from sipp_tpu.pairing import miller_loop
from sipp_tpu.pairing.ate import _product_tree
from sipp_tpu.parallel import sharded as sh
from sipp_tpu.utils.testing import random_instance


@functools.lru_cache(maxsize=None)
def _nocollective_kernel(mesh):
    """cross_products minus the all_gather/replicated tail: per-shard Miller
    + local trees only, outputs left device-local (sharded).  The wall-clock
    delta vs the full program is the collective + tail cost on this host."""
    a_spec = P(None, "i", None, None)
    b_spec = P(None, "i", None, None, None)
    out_spec = P("i", None, None, None, None)

    def local_cross(a, b):
        a, b = a[:, 0], b[:, 0]
        m = a.shape[0] // 2
        aa = jnp.concatenate([a[m:], a[:m]], 0)
        bb = jnp.concatenate([b[:m], b[m:]], 0)
        f = miller_loop(aa, bb)
        return jnp.stack([_product_tree(f[:m]), _product_tree(f[m:])])[None]

    return jax.jit(shard_map(local_cross, mesh=mesh, check_vma=False,
                             in_specs=(a_spec, b_spec), out_specs=out_spec))


def _time(fn, args, reps):
    out = fn(*args)
    jax.block_until_ready(out)  # compile + warm
    t = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t) / reps


def main(n_total=128, reps=20):
    a_full, b_full = random_instance(n_total, seed=9)
    rows = []
    for d in (1, 2, 4, 8):
        if len(jax.devices()) < d:
            break
        mesh = sh.make_mesh(d)
        a = sh.shard_cyclic(a_full, mesh)
        b = sh.shard_cyclic(b_full, mesh)
        full = sh._round_kernels(mesh)["cross"]
        noc = _nocollective_kernel(mesh)
        t_full = _time(full, (a, b), reps)
        t_comp = _time(noc, (a, b), reps)
        row = {
            "d": d, "n_total": n_total, "lanes_per_device": n_total // d,
            "cross_full_ms": round(t_full * 1e3, 3),
            "compute_only_ms": round(t_comp * 1e3, 3),
            "collective_plus_tail_ms": round((t_full - t_comp) * 1e3, 3),
            "gather_bytes_per_device": 2 * 2 * 3 * 2 * 16 * 4,
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
    t1 = rows[0]["cross_full_ms"]
    summary = {
        "metric": "sharded_cross_round_strong_scaling",
        "host_cores": os.cpu_count(),
        "speedup_vs_d1": [round(t1 / r["cross_full_ms"], 3) for r in rows],
        "efficiency": [round(t1 / (r["d"] * r["cross_full_ms"]), 3)
                       for r in rows],
    }
    print(json.dumps(summary), flush=True)
    return rows, summary


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    r = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    main(n, r)
