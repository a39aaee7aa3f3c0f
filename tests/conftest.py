"""Test configuration: run JAX on a virtual 8-device CPU mesh with f64.

Real-TPU behaviour is exercised separately by bench.py and
__graft_entry__.py; unit tests validate numerics in double precision on CPU
where the reference (Haskell/LAPACK, all f64) semantics can be matched
exactly.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
