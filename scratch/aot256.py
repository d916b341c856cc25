import jax, jax.numpy as jnp
from jax.experimental import topologies
from jax.sharding import SingleDeviceSharding
topo = topologies.get_topology_desc("v5e:2x2", "tpu")
sh = SingleDeviceSharding(topo.devices[0])
from sipp_tpu.ops.pallas_miller import miller_product_fused, L
for B in (256, 512):
    a = jax.ShapeDtypeStruct((B, 2, L), jnp.uint32, sharding=sh)
    b = jax.ShapeDtypeStruct((B, 2, 2, L), jnp.uint32, sharding=sh)
    try:
        miller_product_fused.lower(a, b, False).compile()
        print(f"B={B}: AOT compile OK", flush=True)
    except Exception as e:
        print(f"B={B}: FAIL {str(e)[:2000]}", flush=True)
