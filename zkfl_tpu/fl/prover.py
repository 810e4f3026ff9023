"""Round prover: one trusted setup per circuit, shared by all clients.

Mirrors the reference's artifact cache (compile/setup skipped when
.r1cs/.zkey exist, full_system_simulation.mjs:698-739) — setups are
deterministic and cached on disk under the config's artifacts_dir — and
replaces the `snarkjs groth16 prove` subprocess with in-process native
proving on the selected engine (TPU by default).
"""

from __future__ import annotations

import os
from typing import Optional

from ..groth16.prover import groth16_prove
from ..groth16.setup import setup_cached
from ..groth16.verifier import groth16_verify
from ..r1cs.circuits import build_structure
from .config import FLConfig


class RoundProver:
    """Holds the three circuit structures + proving/verifying keys.

    On the JAX engine the three circuits pad to one PipelineProfile
    (shared setup domain / wire / nnz shapes), so a round compiles ONE
    fused prove pipeline instead of three — first-round latency drops from
    ~13 min of per-circuit jit to the cost of a single compile."""

    def __init__(self, config: FLConfig, engine=None, cache_dir: Optional[str] = None):
        if engine is None:
            from ..groth16.engine import JaxEngine

            engine = JaxEngine()
        self.cfg = config
        self.engine = engine
        cache = cache_dir or config.artifacts_dir
        os.makedirs(cache, exist_ok=True)

        self.balance_cs = build_structure(config.balance_params)
        self.training_cs = build_structure(config.training_params)
        self.secagg_cs = build_structure(config.secagg_params)

        domain = None
        if getattr(engine, "name", "") == "jax":
            from ..groth16.device_prover import PipelineProfile

            profile = PipelineProfile.cover(
                [self.balance_cs, self.training_cs, self.secagg_cs]
            )
            if engine.profile is None:
                engine.profile = profile
            domain = engine.profile.domain

        self.balance_pk, self.balance_vk = setup_cached(
            self.balance_cs, cache, domain=domain
        )
        self.training_pk, self.training_vk = setup_cached(
            self.training_cs, cache, domain=domain
        )
        self.secagg_pk, self.secagg_vk = setup_cached(
            self.secagg_cs, cache, domain=domain
        )

    # -- proving ----------------------------------------------------------
    def prove_balance(self, witness):
        return groth16_prove(self.balance_pk, self.balance_cs, witness, engine=self.engine)

    def prove_training(self, witness):
        return groth16_prove(self.training_pk, self.training_cs, witness, engine=self.engine)

    def prove_secagg(self, witness):
        return groth16_prove(self.secagg_pk, self.secagg_cs, witness, engine=self.engine)

    # -- batched proving (client-batch data parallelism) ------------------
    @property
    def can_batch(self) -> bool:
        return hasattr(self.engine, "fused_msms")

    def prove_balance_many(self, witnesses, mesh=None):
        from ..groth16.prover import groth16_prove_many

        return groth16_prove_many(
            self.balance_pk, self.balance_cs, witnesses,
            engine=self.engine, mesh=mesh,
        )

    def prove_training_many(self, witnesses, mesh=None):
        from ..groth16.prover import groth16_prove_many

        return groth16_prove_many(
            self.training_pk, self.training_cs, witnesses,
            engine=self.engine, mesh=mesh,
        )

    def prove_secagg_many(self, witnesses, mesh=None):
        from ..groth16.prover import groth16_prove_many

        return groth16_prove_many(
            self.secagg_pk, self.secagg_cs, witnesses,
            engine=self.engine, mesh=mesh,
        )

    # -- verification (server side) --------------------------------------
    def verify_balance(self, proof) -> bool:
        return groth16_verify(self.balance_vk, proof)

    def verify_training(self, proof) -> bool:
        return groth16_verify(self.training_vk, proof)

    def verify_secagg(self, proof) -> bool:
        return groth16_verify(self.secagg_vk, proof)
