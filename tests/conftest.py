"""Test configuration.

Numerics run in double precision (f64) so the reference (Haskell/LAPACK,
all f64) semantics can be matched exactly.  We do NOT force
``JAX_PLATFORMS=cpu``: in the build environment the only PJRT backend is
the axon TPU tunnel, and requesting "cpu" routes compiles through a
pathologically slow remote-CPU path (~2 s per HLO op).  On a standard JAX
install these tests also pass on the CPU backend.

A persistent compilation cache keeps repeated test runs fast.
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
