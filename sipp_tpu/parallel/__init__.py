"""Parallel layer: cyclic index sharding + cross-host launcher.

Re-exports are LAZY (module __getattr__): `sharded` builds device constant
arrays at import, which initialises the XLA backend — and
`launcher.initialize` must run `jax.distributed.initialize` BEFORE any
backend initialisation.  Lazy loading keeps
`from sipp_tpu.parallel.launcher import initialize` backend-free.
"""

import importlib

_EXPORTS = ("make_mesh", "shard_cyclic", "sipp_prove_sharded", "unshard")
__all__ = list(_EXPORTS) + ["sharded", "launcher"]


def __getattr__(name):
    # importlib (not `from . import`): the latter's fromlist hasattr check
    # re-enters this __getattr__ mid-import and recurses
    if name in _EXPORTS or name == "sharded":
        sharded = importlib.import_module(".sharded", __name__)
        return sharded if name == "sharded" else getattr(sharded, name)
    if name == "launcher":
        return importlib.import_module(".launcher", __name__)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
