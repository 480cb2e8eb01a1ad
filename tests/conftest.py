"""Test environment: 8 fake CPU devices.

The reference tests ensemble samplers under ``mpiexec -n 2..4`` on one node
(SURVEY.md §6). The JAX equivalent needs no cluster either: force the host
platform and 8 virtual CPU devices so the shard_map path runs real
collectives. Must run before jax is imported anywhere.
"""

import os

# BIPYMC_TPU_TESTS=1: leave the real backend in place so the
# TPU-hardware-gated tests (tests/test_tpu_hardware.py and the
# skipif(backend != "tpu") cases) actually run on the chip:
#   BIPYMC_TPU_TESTS=1 python -m pytest tests/test_tpu_hardware.py -q
# Round 3 found four bugs the CPU/interpret suite could not see
# (Mosaic-unsupported expm1 and batched vv-dot, HBM slice alignment,
# an f32 Cholesky cliff only the TPU's rounding fell off) — this hatch
# is how those paths get exercised without a separate harness
# (docs/ROUND3.md §§10, 17, 19).
_TPU_TESTS = os.environ.get("BIPYMC_TPU_TESTS") == "1"

if not _TPU_TESTS:
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if not _TPU_TESTS and "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU harness force-sets jax_platforms via sitecustomize; env vars
# alone don't win. Re-pin to CPU before any backend initialisation.
if not _TPU_TESTS:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# This box exposes ONE cpu: the XLA CPU client's async dispatch pool has a
# single thread, and interpret-mode Pallas calls occasionally deadlock
# waiting for the slot they occupy (probabilistic, load-0 hangs observed
# once enough kernels compile in one process). Synchronous dispatch
# removes the pool from the picture.
jax.config.update("jax_cpu_enable_async_dispatch", False)

