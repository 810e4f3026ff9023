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
Bit-exactness is pinned by tests/test_client_batch.py (fused pipeline vs
the host oracle) and tests/test_pallas_kernels.py (per-stage kernels).
"""

from __future__ import annotations

from dataclasses import dataclass
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


@dataclass(frozen=True)
class PipelineProfile:
    """Canonical pipeline shape shared by several circuits.

    Padding every circuit of a protocol round to one (wires, domain, nnz)
    triple makes the fused prove pipeline compile ONCE for all of them —
    the reference pays per-circuit snarkjs key loads instead
    (full_system_simulation.mjs:698-739).  Requires setups built with
    `groth16_setup(..., domain=profile.domain)`.
    """

    m_pad: int    # padded wire count (>= every circuit's n_wires)
    domain: int   # shared NTT/setup domain (power of two)
    nnz_pad: int  # padded COO length of the R1CS matrices

    @staticmethod
    def cover(structures: Sequence[ConstraintSystem]) -> "PipelineProfile":
        """Smallest profile covering every given circuit structure."""
        from ..field.bn254 import domain_size_for

        def n_cons(cs):
            if getattr(cs, "is_compiled", False):
                return cs.n_constraints
            return len(cs.constraints)

        def nnz_of(cs):
            if getattr(cs, "is_compiled", False):
                return cs.nnz
            return sum(len(abc[k]) for abc in cs.constraints for k in range(3))

        m_pad = max(cs.n_wires for cs in structures)
        domain = max(domain_size_for(n_cons(cs) + 1) for cs in structures)
        nnz = max(nnz_of(cs) for cs in structures)
        return PipelineProfile(m_pad=m_pad, domain=domain, nnz_pad=nnz)


def _prove_msms_impl(cfg, n_pub, g1_pts, b2_pts, rows, cols, coeffs, w_std):
    """cfg = (domain, n_max, wc_g1, wc_g2, wbits); n_pub is a traced scalar
    so circuits sharing a PipelineProfile share ONE compiled program.

    w_std: [B, 16, m] standard-form witness limbs (B = client batch; the
    whole pipeline is batched, per-client proofs are independent —
    full_system_simulation.mjs:1298-1343 semantics).
    Returns ([3,16,B,4] G1 results A/B1/C/H, [3,2,16,B] B2 results).
    """
    domain, n_max, wc_g1, wc_g2, wbits = cfg
    B, _, m = w_std.shape

    w_lm = jnp.moveaxis(w_std, 0, 1)  # [16, B, m]
    w_mont = FRK.to_mont(w_lm.reshape(16, B * m)).reshape(16, B, m)
    evals = matrix_evals_lm(rows, cols, coeffs, w_mont, domain)
    h_std = compute_h_lm(evals)  # [16, B, domain] standard form

    def pad(x):
        return jnp.pad(
            x, ((0, 0), (0, 0), (0, n_max - x.shape[-1]))
        )  # [16, B, n_max]

    wit = pad(w_lm)
    # private-wire scalars stay wire-aligned (c_query is uploaded with
    # n_pub+1 identity points in front); public positions mask to zero,
    # which contributes nothing to the MSM.
    wire = jax.lax.broadcasted_iota(jnp.int32, w_lm.shape, 2)
    priv = pad(jnp.where(wire > n_pub, w_lm, 0))
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

# In-process compiled-executable cache for the fused pipeline + timing of
# the last cold build (trace vs backend compile) — bench.py reports these
# as the first-prove breakdown (VERDICT r4 #2).
_compiled_cache: Dict[tuple, object] = {}
LAST_COMPILE_STATS: Dict[str, float] = {}


def _compile_pipeline(cfg, args):
    """Explicitly lower + compile the fused pipeline for these arg shapes,
    recording stage times; cached per (cfg, shapes) in-process."""
    import time

    key = (cfg, tuple((tuple(a.shape), str(a.dtype)) for a in args))
    fn = _compiled_cache.get(key)
    if fn is not None:
        return fn
    t0 = time.time()
    lowered = jax.jit(partial(_prove_msms_impl, cfg)).lower(
        *(jax.ShapeDtypeStruct(a.shape, a.dtype) for a in args)
    )
    t1 = time.time()
    compiled = lowered.compile()
    t2 = time.time()
    LAST_COMPILE_STATS["trace_s"] = round(t1 - t0, 2)
    LAST_COMPILE_STATS["backend_compile_s"] = round(t2 - t1, 2)
    _compiled_cache[key] = compiled
    return compiled


class DeviceProver:
    """Per-circuit device proving context (proving key resident on device).

    With a `PipelineProfile`, point queries / witness / COO matrices pad to
    the profile's canonical shapes, so every circuit sharing the profile
    reuses one compiled fused pipeline (pk.domain must equal
    profile.domain — build setups with that domain override)."""

    def __init__(
        self,
        pk: ProvingKey,
        structure: ConstraintSystem,
        profile: Optional[PipelineProfile] = None,
    ):
        compiled = getattr(structure, "is_compiled", False)
        if not compiled and not structure.constraints:
            raise ValueError("DeviceProver needs the structure-mode CS")
        if profile is not None and pk.domain != profile.domain:
            raise ValueError(
                f"setup domain {pk.domain} != profile domain {profile.domain}"
                " (pass domain=profile.domain to groth16_setup)"
            )
        self.pk = pk
        self.n_pub = pk.n_pub
        self.m_wires = structure.n_wires
        self.m_pad = profile.m_pad if profile else structure.n_wires
        if self.m_pad < self.m_wires:
            raise ValueError(f"profile m_pad {self.m_pad} < wires {self.m_wires}")
        self.domain = pk.domain
        n_max = max(self.m_pad, self.domain - 1)
        self.n_max = n_max

        def pad_pts(pts, lead=0):
            out = [None] * lead + list(pts)
            return out + [None] * (n_max - len(out))

        self.g1_pts = jnp.stack(
            [
                pk_ops.g1_to_device(pad_pts(pk.a_query)),
                pk_ops.g1_to_device(pad_pts(pk.b1_query)),
                # wire-aligned: scalar i multiplies the C point of wire i
                pk_ops.g1_to_device(pad_pts(pk.c_query, lead=pk.n_pub + 1)),
                pk_ops.g1_to_device(pad_pts(pk.h_query)),
            ],
            axis=2,
        )  # [3, 16, 4, n_max]  (one family set, shared by every client row)
        self.b2_pts = pk_ops.g2_to_device(pad_pts(pk.b2_query))[:, :, :, None, :]
        if compiled:
            dm = DeviceMatrices.from_coo(
                structure, self.domain,
                nnz_pad=profile.nnz_pad if profile else None,
            )
        else:
            dm = DeviceMatrices(
                structure.constraints,
                self.domain,
                nnz_pad=profile.nnz_pad if profile else None,
            )
        self.rows, self.cols, self.coeffs = dm.rows, dm.cols, dm.coeffs
        self.cfg = (
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
        w_std = self.pack_witnesses(witnesses)
        n_pub = jnp.int32(self.n_pub)

        if mesh is None:
            from . import aot

            args = (n_pub, self.g1_pts, self.b2_pts, self.rows,
                    self.cols, self.coeffs, jnp.asarray(w_std))
            cfg = self.cfg_for(B)
            fn = aot.load(cfg, args)
            if fn is None:
                # explicit lower/compile: same dispatch as the jit wrapper
                # but with the cold-path stage times recorded
                fn = _compile_pipeline(cfg, args)
            g1_out, g2_out = fn(*args)
        else:
            fn = self.mesh_fn(mesh, B, axis)
            g1_out, g2_out = jax.jit(fn)(
                n_pub, self.g1_pts, self.b2_pts, self.rows, self.cols,
                self.coeffs, jnp.asarray(w_std),
            )

        return self.results_from_device(g1_out, g2_out)

    # -- building blocks (shared with __graft_entry__'s cached dryrun) ----
    def cfg_for(self, batch: int):
        """Pipeline cfg for a per-program client batch of `batch`."""
        domain, n_max, _, _, wbits = self.cfg
        return (
            domain, n_max,
            mp._auto_chunk(4 * batch, n_max, False),
            mp._auto_chunk(batch, n_max, True),
            wbits,
        )

    def pack_witnesses(self, witnesses: Sequence[Sequence[int]]) -> np.ndarray:
        w_std = np.zeros((len(witnesses), 16, self.m_pad), dtype=np.uint32)
        for b, w in enumerate(witnesses):
            w_std[b, :, : self.m_wires] = FRK.pack(list(w), mont=False)
        return w_std

    def mesh_fn(self, mesh, B: int, axis: str = "clients"):
        """Raw (unjitted) shard_map callable for a client batch of B over
        `axis` — per-client proving is embarrassingly parallel, no
        collectives needed."""
        from jax.sharding import PartitionSpec as P

        cfg = self.cfg_for(B // mesh.shape[axis])
        return jax.shard_map(
            lambda np_, g1, b2, r, c, co, w: _prove_msms_impl(
                cfg, np_, g1, b2, r, c, co, w
            ),
            mesh=mesh,
            in_specs=(P(), P(), P(), P(), P(), P(), P(axis)),
            out_specs=(P(None, None, axis), P(None, None, None, axis)),
            check_vma=False,  # zeros-init fori carries meet varying updates
        )

    @staticmethod
    def results_from_device(g1_out, g2_out) -> list:
        g1_np = np.asarray(g1_out)   # [3, 16, B, 4]
        g2_np = np.asarray(g2_out)   # [3, 2, 16, B]
        out = []
        for b in range(g1_np.shape[2]):
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

    def aot_prewarm(self, batch: int = 1):
        """Trace + compile + persist the fused pipeline executable for a
        client batch of `batch` (scripts/aot_prewarm.py); later processes
        then skip the ~minutes of tracing/compilation entirely."""
        from . import aot

        domain, n_max, _, _, wbits = self.cfg
        cfg = (
            domain, n_max,
            mp._auto_chunk(4 * batch, n_max, False),
            mp._auto_chunk(batch, n_max, True),
            wbits,
        )
        args = (
            jnp.int32(self.n_pub), self.g1_pts, self.b2_pts, self.rows,
            self.cols, self.coeffs,
            jnp.zeros((batch, 16, self.m_pad), jnp.uint32),
        )
        return aot.build_and_save(cfg, args)


_prover_cache: Dict[tuple, DeviceProver] = {}


def device_prover(
    pk: ProvingKey,
    structure: ConstraintSystem,
    profile: Optional[PipelineProfile] = None,
) -> DeviceProver:
    key = (id(pk), id(structure), profile)
    prover = _prover_cache.get(key)
    if prover is None:
        prover = DeviceProver(pk, structure, profile)
        _prover_cache[key] = prover
    return prover
