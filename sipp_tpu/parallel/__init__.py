from .sharded import (  # noqa: F401
    make_mesh,
    shard_cyclic,
    sipp_prove_sharded,
    unshard,
)
