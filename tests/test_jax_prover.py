"""End-to-end Groth16 proving through the JAX engine.

Exercises every TPU-path primitive once — device sparse matrix_evals,
device NTT h(X), device G1 + G2 MSMs — on a deliberately tiny R1CS so the
CPU test backend can execute the full bit-serial MSMs.  Real-circuit-sized
proving runs on TPU via bench.py; the primitives are shape-independent.
"""

import pytest

from zkfl_tpu.field.bn254 import FR
from zkfl_tpu.groth16.engine import HostEngine, JaxEngine
from zkfl_tpu.groth16.prover import groth16_prove
from zkfl_tpu.groth16.setup import groth16_setup
from zkfl_tpu.groth16.verifier import groth16_verify
from zkfl_tpu.r1cs.builder import ConstraintSystem


def _toy_circuit(x: int, y: int):
    """Prove knowledge of x, y with  out = x^2 * y + x + 7  (public out)."""
    cs = ConstraintSystem(name="toy")
    out_val = (x * x % FR * y + x + 7) % FR
    out = cs.public_input("out", out_val)
    xin = cs.private_input("x", x)
    yin = cs.private_input("y", y)
    x2 = cs.mul(xin, xin)
    x2y = cs.mul(x2, yin)
    cs.enforce_equal(x2y + xin + 7, out)
    return cs


@pytest.fixture(scope="module")
def toy():
    cs = _toy_circuit(3, 5)
    pk, vk = groth16_setup(cs, seed="toy-seed")
    return cs, pk, vk


def test_toy_satisfied(toy):
    cs, _, _ = toy
    assert cs.is_satisfied()


def test_jax_engine_proof_verifies(toy):
    cs, pk, vk = toy
    proof = groth16_prove(pk, cs, engine=JaxEngine())
    assert groth16_verify(vk, proof)


def test_jax_engine_matches_host_engine(toy):
    cs, pk, vk = toy
    p_host = groth16_prove(pk, cs, engine=HostEngine())
    p_jax = groth16_prove(pk, cs, engine=JaxEngine())
    # Deterministic blinding -> identical proofs bit for bit.
    assert p_host.pi_a == p_jax.pi_a
    assert p_host.pi_b == p_jax.pi_b
    assert p_host.pi_c == p_jax.pi_c
    assert p_host.public_signals == p_jax.public_signals


def test_jax_engine_rejects_bad_witness(toy):
    cs, pk, vk = toy
    bad = list(cs.witness)
    bad[-1] = (bad[-1] + 1) % FR
    proof = groth16_prove(pk, cs, bad, engine=JaxEngine())
    assert not groth16_verify(vk, proof)
