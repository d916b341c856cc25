"""sipp-tpu: TPU-native structured inner pairing product (SIPP) framework."""

from . import jaxcfg  # noqa: F401  (enables the persistent compile cache)
