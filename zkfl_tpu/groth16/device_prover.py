"""Fused TPU Groth16 prover: device-resident proving key, O(1) transfers.

Round-1 proving re-uploaded the proving key per proof and bounced the
witness/QAP intermediates through host Python ints between every stage
(VERDICT.md "What's missing" #1-2).  This module is the round-2 answer:

  * The proving key's four G1 query families (A, B1, C, H) are uploaded
    ONCE as a single [3, 16, 4, n] Montgomery limb tensor (B2 likewise for
    G2), cached per (pk, structure).
  * One jitted program runs witness -> Montgomery form -> sparse R1CS
    evaluation -> NTT h(X) pipeline -> digit extraction -> batched Pippenger
    MSMs.  Per proof the host sends the packed witness (~1 MB) and receives
    five curve points.
  * Proof assembly (blinding terms alpha/beta/delta, r/s) happens on host —
    five single-point scalar multiplications.

Semantics identical to the pure-Python oracle (groth16/prover.py); the
snarkjs counterpart is `groth16 prove` (full_system_simulation.mjs:770-780).
Bit-exactness is pinned by tests/test_device_prover.py.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..field.bn254 import FR
from ..field.limbs import N_LIMBS
from ..ops import msm_pallas as mp
from ..ops import point_kernels as pk_ops
from ..ops.limb_kernels import FRK
from ..ops.qap_pallas import DeviceMatrices, compute_h_lm, matrix_evals_lm
from ..r1cs.builder import ConstraintSystem
from .setup import ProvingKey


@partial(jax.jit, static_argnums=(0,))
def _prove_msms(cfg, g1_pts, b2_pts, rows, cols, coeffs, w_std):
    """cfg = (n_pub, m_wires, domain, n_max, wc_g1, wc_g2).

    w_std: [16, m] standard-form witness limbs.
    Returns ([3,16,4] G1 results for A/B1/C/H, [3,2,16,1] G2 result for B2).
    """
    n_pub, m, domain, n_max, wc_g1, wc_g2, wbits = cfg

    w_mont = FRK.to_mont(w_std)
    evals = matrix_evals_lm(rows, cols, coeffs, w_mont, domain)  # [16,3,domain]
    h_std = compute_h_lm(evals)  # [16, domain] standard form

    def pad(x):
        return jnp.pad(x, ((0, 0), (0, n_max - x.shape[-1])))

    wit = pad(w_std)
    priv = pad(w_std[:, n_pub + 1 :])
    h_sc = pad(h_std[:, : domain - 1])
    scalars = jnp.stack([wit, wit, priv, h_sc], axis=0)  # [4, 16, n_max]

    g1_out = mp._msm_impl(g1_pts, scalars, mp._G1Ops, wc_g1, wbits)
    g2_out = mp._msm_impl(b2_pts, wit[None], mp._G2Ops, wc_g2, wbits)
    return g1_out, g2_out


class DeviceProver:
    """Per-circuit device proving context (proving key resident on device)."""

    def __init__(self, pk: ProvingKey, structure: ConstraintSystem):
        if not structure.constraints:
            raise ValueError("DeviceProver needs the structure-mode CS")
        self.pk = pk
        self.n_pub = pk.n_pub
        self.m_wires = structure.n_wires
        self.domain = pk.domain
        n_max = max(self.m_wires, self.domain - 1)
        self.n_max = n_max

        def pad_pts(pts):
            return list(pts) + [None] * (n_max - len(pts))

        self.g1_pts = jnp.stack(
            [
                pk_ops.g1_to_device(pad_pts(pk.a_query)),
                pk_ops.g1_to_device(pad_pts(pk.b1_query)),
                pk_ops.g1_to_device(pad_pts(pk.c_query)),
                pk_ops.g1_to_device(pad_pts(pk.h_query)),
            ],
            axis=2,
        )  # [3, 16, 4, n_max]
        self.b2_pts = pk_ops.g2_to_device(pad_pts(pk.b2_query))[:, :, :, None, :]
        dm = DeviceMatrices(structure.constraints, self.domain)
        self.rows, self.cols, self.coeffs = dm.rows, dm.cols, dm.coeffs
        self.cfg = (
            self.n_pub,
            self.m_wires,
            self.domain,
            n_max,
            mp._auto_chunk(4, n_max, False),
            mp._auto_chunk(1, n_max, True),
            mp._auto_wbits(n_max),
        )

    def msm_results(self, witness: Sequence[int]) -> Dict[str, object]:
        """Run the fused device pipeline; returns host affine MSM results
        keyed a/b1/c/h (G1) and b2 (G2) — the contract groth16_prove's
        assembly step expects."""
        if len(witness) != self.m_wires:
            raise ValueError(
                f"witness length {len(witness)} != wires {self.m_wires}"
            )
        w_std = jnp.asarray(FRK.pack(list(witness), mont=False))
        g1_out, g2_out = _prove_msms(
            self.cfg, self.g1_pts, self.b2_pts, self.rows, self.cols,
            self.coeffs, w_std,
        )
        g1_np = np.asarray(g1_out)
        return {
            "a": pk_ops.g1_from_device(g1_np[:, :, 0]),
            "b1": pk_ops.g1_from_device(g1_np[:, :, 1]),
            "c": pk_ops.g1_from_device(g1_np[:, :, 2]),
            "h": pk_ops.g1_from_device(g1_np[:, :, 3]),
            "b2": pk_ops.g2_from_device(np.asarray(g2_out)[:, :, :, 0]),
        }


_prover_cache: Dict[Tuple[int, int], DeviceProver] = {}


def device_prover(pk: ProvingKey, structure: ConstraintSystem) -> DeviceProver:
    key = (id(pk), id(structure))
    prover = _prover_cache.get(key)
    if prover is None:
        prover = DeviceProver(pk, structure)
        _prover_cache[key] = prover
    return prover
