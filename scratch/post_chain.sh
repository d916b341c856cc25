#!/bin/bash
# Waits for bench_chain to finish, then: kernel split timing + BLS e2e.
cd /root/repo
while pgrep -f scratch/bench_chain.sh > /dev/null; do sleep 20; done
echo "=== kernel split timing n=128 ==="
timeout 1500 python - <<'PY' 2>&1
import time, jax, jax.numpy as jnp
from sipp_tpu.ops.pallas_miller import miller_product_fused
from sipp_tpu.ops.pallas_fexp import final_exp_fused
from sipp_tpu.utils.testing import random_instance
a, b = random_instance(128, seed=1177)
f = miller_product_fused(a, b); f.block_until_ready()
t0=time.time()
for _ in range(10): f = miller_product_fused(a, b)
f.block_until_ready(); print("miller_product_fused:", (time.time()-t0)/10*1e3, "ms")
g1 = final_exp_fused(f[None]); g1.block_until_ready()
t0=time.time()
for _ in range(10): g = final_exp_fused(f[None])
g.block_until_ready(); print("final_exp_fused B=1:", (time.time()-t0)/10*1e3, "ms")
f2 = jnp.stack([f, f])
g2 = final_exp_fused(f2); g2.block_until_ready()
t0=time.time()
for _ in range(10): g = final_exp_fused(f2)
g.block_until_ready(); print("final_exp_fused B=2:", (time.time()-t0)/10*1e3, "ms")
PY
echo "=== BLS aggregation e2e n=128 ==="
timeout 3000 python -m sipp_tpu.apps.bls_aggregation 128 2>&1
echo "=== post_chain done ==="
