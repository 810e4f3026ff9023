"""Shared-PipelineProfile padded proving (ADVICE r3 #4).

Lives in its OWN file/suite batch: XLA's CPU backend segfaults inside
LLVM on roughly the third large fused-pipeline compile in one process
(reproduced repeatedly; standalone the same compile passes), so the
run_suite batches keep at most two big compiles per pytest process.
"""

from zkfl_tpu.field.bn254 import FR
from zkfl_tpu.groth16.prover import groth16_prove
from zkfl_tpu.groth16.setup import groth16_setup
from zkfl_tpu.groth16.verifier import groth16_verify
from zkfl_tpu.r1cs.builder import ConstraintSystem

from test_client_batch import _toy_circuit


def test_shared_profile_padded_proving():
    """Two circuits of different sizes proved through ONE PipelineProfile
    (padded wires/nnz, enlarged setup domain): proofs verify and equal the
    host-engine proofs byte-for-byte (deterministic blinding), and both
    circuits reuse a single compiled pipeline."""
    from zkfl_tpu.groth16.device_prover import PipelineProfile
    from zkfl_tpu.groth16.engine import HostEngine, JaxEngine

    def bigger_toy(x, y):
        cs = ConstraintSystem(name="toy_big")
        out = cs.public_input("out", (x * x % FR * y * y + 3 * x) % FR)
        xin = cs.private_input("x", x)
        yin = cs.private_input("y", y)
        x2 = cs.mul(xin, xin)
        y2 = cs.mul(yin, yin)
        x2y2 = cs.mul(x2, y2)
        cs.enforce_equal(x2y2 + 3 * xin, out)
        return cs

    a = _toy_circuit(3, 5)
    b = bigger_toy(2, 6)
    profile = PipelineProfile.cover([a, b])
    # enlarged shared domain: larger than either circuit's natural one
    profile = PipelineProfile(
        m_pad=profile.m_pad + 3, domain=profile.domain * 2,
        nnz_pad=profile.nnz_pad + 5,
    )
    engine = JaxEngine(profile)
    keys = {
        cs.name: groth16_setup(cs, seed="prof-seed", domain=profile.domain)
        for cs in (a, b)
    }
    for cs in (a, b):
        pk, vk = keys[cs.name]
        proof = groth16_prove(pk, cs, engine=engine)
        assert groth16_verify(vk, proof), cs.name
        # deterministic blinding (conftest): the padded fused proof must be
        # byte-identical to the pure-Python host-engine proof
        host = groth16_prove(pk, cs, engine=HostEngine())
        assert proof == host, cs.name
