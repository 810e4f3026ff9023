"""Prover compute engines: host (pure-Python oracle) vs JAX/TPU.

The Groth16 proof assembly (prover.groth16_prove) is engine-agnostic; an
Engine supplies the four heavy primitives that dominate proving time
(SURVEY §3.3: MSM + NTT are ~95% of the reference's round latency):

  * msm_g1 / msm_g2 — multi-scalar multiplications over the proving key
  * matrix_evals    — sparse R1CS row evaluation (A.s, B.s, C.s)
  * compute_h       — QAP quotient coefficients via (i)NTT on a coset

HostEngine is the bit-exact reference; JaxEngine routes everything through
the batched limb kernels in zkfl_tpu.ops (TPU-resident, one jit per shape)
and caches the device-side sparse matrices per circuit structure.
"""

from __future__ import annotations

from typing import Dict

from . import qap


class HostEngine:
    """Pure-Python primitives (oracle + micro-circuit fallback)."""

    name = "host"

    @staticmethod
    def msm_g1(points, scalars):
        from .prover import pippenger_g1

        return pippenger_g1(points, scalars)

    @staticmethod
    def msm_g2(points, scalars):
        from .prover import msm_g2 as _msm_g2

        return _msm_g2(points, scalars)

    @staticmethod
    def matrix_evals(constraints, witness, domain):
        return qap.matrix_evals(constraints, witness, domain)

    @staticmethod
    def compute_h(a_evals, b_evals, c_evals):
        return qap.compute_h_coeffs(a_evals, b_evals, c_evals)


class JaxEngine:
    """TPU-path primitives over batched limb tensors.

    The production path is `fused_msms`: one jitted program per circuit
    with the proving key resident on device (groth16/device_prover.py) —
    witness in, five MSM results out.  The per-primitive methods remain as
    standalone entry points (Pallas Pippenger MSM, ops/msm_pallas.py)."""

    name = "jax"

    def __init__(self, profile=None):
        """`profile` (device_prover.PipelineProfile) pads every circuit
        proved through this engine to one canonical shape so they share a
        single compiled pipeline; None keeps per-circuit native shapes."""
        self._sparse_cache: Dict[tuple, object] = {}
        self.profile = profile

    def fused_msms(self, pk, structure, witness):
        from .device_prover import device_prover

        return device_prover(pk, structure, self.profile).msm_results(witness)

    @staticmethod
    def msm_g1(points, scalars):
        from ..ops.msm_pallas import msm_g1_host

        return msm_g1_host(points, scalars)

    @staticmethod
    def msm_g2(points, scalars):
        from ..ops.msm_pallas import msm_g2_host

        return msm_g2_host(points, scalars)

    def matrix_evals(self, constraints, witness, domain):
        """Host-int interface over the production limb-major pipeline
        (ops/qap_pallas.matrix_evals_lm — the same code the fused prover
        runs; the round-1 limb-last device path is gone)."""
        import jax.numpy as jnp

        from ..ops.limb_kernels import FRK
        from ..ops.qap_pallas import DeviceMatrices, matrix_evals_lm

        key = (id(constraints), domain)
        dm = self._sparse_cache.get(key)
        if dm is None:
            dm = DeviceMatrices(constraints, domain)
            self._sparse_cache[key] = dm
        import numpy as np

        w = jnp.asarray(FRK.pack(list(witness)))[:, None, :]  # [16, 1, m]
        evals = matrix_evals_lm(dm.rows, dm.cols, dm.coeffs, w, domain)
        arr = np.asarray(evals)  # [16, 1, 3, domain] Montgomery
        return tuple(FRK.unpack(arr[:, 0, i, :]) for i in range(3))

    @staticmethod
    def compute_h(a_evals, b_evals, c_evals):
        import jax.numpy as jnp
        import numpy as np

        from ..ops.limb_kernels import FRK
        from ..ops.qap_pallas import compute_h_lm

        n = len(a_evals)
        evals = jnp.asarray(
            np.stack(
                [FRK.pack(list(a_evals)), FRK.pack(list(b_evals)),
                 FRK.pack(list(c_evals))],
                axis=1,
            )
        )[:, None, :, :]  # [16, 1, 3, n]
        h = compute_h_lm(evals)  # [16, 1, n] standard form
        return FRK.unpack(np.asarray(h[:, 0, :]), mont=False)


_default_engine = None


def default_engine():
    """Process-wide default: JAX engine (host engine only on request)."""
    global _default_engine
    if _default_engine is None:
        _default_engine = JaxEngine()
    return _default_engine
