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


def _prove_msms_impl(cfg, g1_pts, b2_pts, rows, cols, coeffs, w_std):
    """cfg = (n_pub, m_wires, domain, n_max, wc_g1, wc_g2, wbits).

    w_std: [B, 16, m] standard-form witness limbs (B = client batch; the
    whole pipeline is batched, per-client proofs are independent —
    full_system_simulation.mjs:1298-1343 semantics).
    Returns ([3,16,B,4] G1 results A/B1/C/H, [3,2,16,B] G2 results B2).
    """
    n_pub, m, domain, n_max, wc_g1, wc_g2, wbits = cfg
    B = w_std.shape[0]

    w_lm = jnp.moveaxis(w_std, 0, 1)  # [16, B, m]
    w_mont = FRK.to_mont(w_lm.reshape(16, B * m)).reshape(16, B, m)
    evals = matrix_evals_lm(rows, cols, coeffs, w_mont, domain)
    h_std = compute_h_lm(evals)  # [16, B, domain] standard form

    def pad(x):
        return jnp.pad(
            x, ((0, 0), (0, 0), (0, n_max - x.shape[-1]))
        )  # [16, B, n_max]

    wit = pad(w_lm)
    priv = pad(w_lm[:, :, n_pub + 1 :])
    h_sc = pad(h_std[:, :, : domain - 1])
    # scalar rows ordered (client, family): [B*4, 16, n_max]
    scalars = jnp.stack([wit, wit, priv, h_sc], axis=2)  # [16, B, 4, n]
    scalars = jnp.moveaxis(scalars, 0, 2).reshape(B * 4, 16, n_max)
    fam = jnp.tile(jnp.arange(4, dtype=jnp.int32), B)  # row -> point family

    g1_out = mp._msm_impl(
        g1_pts, scalars, mp._G1Ops, wc_g1, wbits, row_map=fam
    )  # [3, 16, B*4]
    g2_scalars = jnp.moveaxis(wit, 0, 1).reshape(B, 16, n_max)
    g2_out = mp._msm_impl(
        b2_pts, g2_scalars, mp._G2Ops, wc_g2, wbits,
        row_map=jnp.zeros((B,), jnp.int32),
    )  # [3, 2, 16, B]
    return g1_out.reshape(3, 16, B, 4), g2_out


_prove_msms = jax.jit(_prove_msms_impl, static_argnums=(0,))


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
        )  # [3, 16, 4, n_max]  (one family set, shared by every client row)
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

    def msm_results_many(
        self, witnesses: Sequence[Sequence[int]], mesh=None, axis: str = "clients"
    ) -> list:
        """Batched fused pipeline over B independent witnesses (client-batch
        data parallelism, SURVEY §2.4 row 1).  With `mesh`, the client batch
        shards over `axis` via shard_map — per-client proving is
        embarrassingly parallel, so no collectives are needed; B must be a
        multiple of the axis size.  Returns one a/b1/c/h/b2 dict per
        witness."""
        B = len(witnesses)
        for w in witnesses:
            if len(w) != self.m_wires:
                raise ValueError(
                    f"witness length {len(w)} != wires {self.m_wires}"
                )
        w_std = np.stack(
            [np.asarray(FRK.pack(list(w), mont=False)) for w in witnesses]
        )  # [B, 16, m]

        def cfg_for(batch):
            n_pub, m, domain, n_max, _, _, wbits = self.cfg
            return (
                n_pub, m, domain, n_max,
                mp._auto_chunk(4 * batch, n_max, False),
                mp._auto_chunk(batch, n_max, True),
                wbits,
            )

        if mesh is None:
            g1_out, g2_out = _prove_msms(
                cfg_for(B), self.g1_pts, self.b2_pts, self.rows, self.cols,
                self.coeffs, jnp.asarray(w_std),
            )
        else:
            from jax.sharding import PartitionSpec as P

            cfg = cfg_for(B // mesh.shape[axis])
            fn = jax.shard_map(
                lambda g1, b2, r, c, co, w: _prove_msms_impl(cfg, g1, b2, r, c, co, w),
                mesh=mesh,
                in_specs=(P(), P(), P(), P(), P(), P(axis)),
                out_specs=(P(None, None, axis), P(None, None, None, axis)),
                check_vma=False,  # zeros-init fori carries meet varying updates
            )
            g1_out, g2_out = jax.jit(fn)(
                self.g1_pts, self.b2_pts, self.rows, self.cols,
                self.coeffs, jnp.asarray(w_std),
            )

        g1_np = np.asarray(g1_out)   # [3, 16, B, 4]
        g2_np = np.asarray(g2_out)   # [3, 2, 16, B]
        out = []
        for b in range(B):
            out.append({
                "a": pk_ops.g1_from_device(g1_np[:, :, b, 0]),
                "b1": pk_ops.g1_from_device(g1_np[:, :, b, 1]),
                "c": pk_ops.g1_from_device(g1_np[:, :, b, 2]),
                "h": pk_ops.g1_from_device(g1_np[:, :, b, 3]),
                "b2": pk_ops.g2_from_device(g2_np[:, :, :, b]),
            })
        return out

    def msm_results(self, witness: Sequence[int]) -> Dict[str, object]:
        """Single-witness fused pipeline (batch of one)."""
        return self.msm_results_many([witness])[0]


_prover_cache: Dict[Tuple[int, int], DeviceProver] = {}


def device_prover(pk: ProvingKey, structure: ConstraintSystem) -> DeviceProver:
    key = (id(pk), id(structure))
    prover = _prover_cache.get(key)
    if prover is None:
        prover = DeviceProver(pk, structure)
        _prover_cache[key] = prover
    return prover
