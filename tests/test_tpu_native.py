"""Pallas Mosaic lowering check on a REAL TPU backend.

The rest of the suite runs the Pallas kernel in interpret mode on the
forced-CPU mesh (tests/conftest.py), which validates semantics but not
the Mosaic lowering — a lowering regression would ship green (VERDICT
r1 weak#6). This test compiles and runs the kernel on the actual chip
whenever one is reachable, and skips loudly when it is not (tunnel
down, CPU-only box). It runs in a subprocess because the test process
is pinned to the CPU backend before jax ever loads.
"""

import json
import os
import subprocess
import sys
import time

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _record_gate(status: str, reason: str) -> None:
    """Persist the hardware-gate outcome where the driver can see it
    (VERDICT r2 item 10): a pytest skip is invisible in round artifacts,
    so a round could silently pass with zero hardware validation."""
    path = os.path.join(_REPO, "evidence", "tpu_gate_status.json")
    try:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            json.dump(
                {
                    "gate": "pallas_mosaic_lowering",
                    "status": status,
                    "reason": reason,
                    "time": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
                },
                f,
            )
    except OSError:
        pass


def _skip(reason: str):
    _record_gate("skipped", reason)
    pytest.skip(reason)

_INIT_PROBE = r"""
import jax
print("TPU" if [d for d in jax.devices() if d.platform != "cpu"]
      else "NO-TPU")
"""

_PROBE = r"""
import numpy as np, jax, jax.numpy as jnp
from kmertools_tpu.ops import pallas_histogram as ph
assert ph.use_pallas(), "pallas path not active on this backend"
ids = jnp.asarray(
    np.random.default_rng(0).integers(0, 136, (128, 125), np.int32)
)
valid = jnp.ones((128, 125), bool)
bv = jnp.arange(136, dtype=jnp.int32)
counts, totals = ph.per_read_histogram_tpu(ids, valid, bv, 136)
assert int(jnp.sum(counts)) == 128 * 125 == int(jnp.sum(totals))
print("PALLAS-TPU-OK")
"""


def test_pallas_mosaic_lowering_on_tpu():
    env = dict(os.environ)
    # undo the conftest's CPU pin; let the axon plugin register
    env.pop("JAX_PLATFORMS", None)
    env.pop("KMERTOOLS_PLATFORM", None)
    env.pop("XLA_FLAGS", None)
    # stage 1: cheap backend-init probe (a dead remote-TPU tunnel hangs
    # init forever — bail fast instead of stalling the whole suite)
    try:
        r = subprocess.run(
            [sys.executable, "-c", _INIT_PROBE],
            capture_output=True,
            timeout=int(os.environ.get("KMERTOOLS_TPU_INIT_TIMEOUT", "90")),
            env=env,
            text=True,
        )
    except subprocess.TimeoutExpired:
        _skip(
            "TPU backend init hung (tunnel down?); "
            "Mosaic lowering NOT validated"
        )
    if "TPU" not in r.stdout or "NO-TPU" in r.stdout:
        _skip("no TPU device visible; Mosaic lowering NOT validated")
    # stage 2: compile + run the kernel (first Mosaic compile goes
    # through the remote compile service — minutes; cached after)
    timeout = int(os.environ.get("KMERTOOLS_TPU_TEST_TIMEOUT", "900"))
    try:
        r = subprocess.run(
            [sys.executable, "-c", _PROBE],
            capture_output=True,
            timeout=timeout,
            env=env,
            text=True,
        )
    except subprocess.TimeoutExpired:
        _skip(
            "TPU reachable but kernel compile timed out "
            "(remote compile service starved); Mosaic lowering NOT validated"
        )
    assert r.returncode == 0, r.stdout + r.stderr
    assert "PALLAS-TPU-OK" in r.stdout, r.stdout + r.stderr
    _record_gate("passed", "Mosaic kernel compiled and ran on the chip")
