"""Native C++ host library vs the pure-Python oracle."""

import random

import pytest

from zkfl_tpu import native
from zkfl_tpu.commit.merkle import MerkleTree
from zkfl_tpu.commit.vector_hash import vector_hash, vector_hash_many
from zkfl_tpu.field.bn254 import FR
from zkfl_tpu.poseidon.reference import poseidon as poseidon_py

rng = random.Random(21)

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


@pytest.mark.parametrize("arity", [1, 2, 5, 16])
def test_poseidon_batch_matches(arity):
    rows = [[rng.randrange(FR) for _ in range(arity)] for _ in range(7)]
    assert native.poseidon_batch(rows) == [poseidon_py(r) for r in rows]


@pytest.mark.parametrize("dim", [4, 16, 17, 33])
def test_vector_hash_batch_matches(dim):
    rows = [[rng.randrange(FR) for _ in range(dim)] for _ in range(5)]
    assert native.vector_hash_batch(rows) == [vector_hash(r) for r in rows]
    assert vector_hash_many(rows) == [vector_hash(r) for r in rows]


def test_merkle_levels_match_python_tree():
    leaves = [rng.randrange(FR) for _ in range(8)]
    levels = native.merkle_levels(leaves)
    # Build reference tree WITHOUT the native path.
    zero_pad_tree = []
    cur = list(leaves)
    zero_pad_tree.append(cur)
    while len(cur) > 1:
        cur = [poseidon_py([cur[i], cur[i + 1]]) for i in range(0, len(cur), 2)]
        zero_pad_tree.append(cur)
    assert levels == zero_pad_tree


def test_merkle_tree_class_uses_native():
    leaves = [rng.randrange(FR) for _ in range(4)]
    t = MerkleTree(leaves, 2)
    # Root must match a hand-rolled Python computation.
    l01 = poseidon_py([leaves[0], leaves[1]])
    l23 = poseidon_py([leaves[2], leaves[3]])
    assert t.root == poseidon_py([l01, l23])
    sib, path = t.prove(2)
    from zkfl_tpu.commit.merkle import verify_merkle_path

    assert verify_merkle_path(leaves[2], sib, path, t.root)


# ---------------------------------------------------------------------------
# Native pairing (csrc/zkfl_pairing.cpp) vs the Python pairing oracle
# ---------------------------------------------------------------------------

pairing_native = pytest.mark.skipif(
    not native.pairing_available(), reason="pairing library not built"
)


@pairing_native
def test_native_pairing_check_matches_oracle():
    from zkfl_tpu.field.curve import (
        g1_generator, g1_mul, g1_neg, g2_generator, g2_mul,
    )
    from zkfl_tpu.field.pairing import pairing_check

    G1, G2 = g1_generator(), g2_generator()
    a, b = rng.randrange(1, 10**9), rng.randrange(1, 10**9)
    good = [(g1_mul(G1, a), g2_mul(G2, b)), (g1_neg(g1_mul(G1, a * b)), G2)]
    bad = [(g1_mul(G1, a), g2_mul(G2, b)),
           (g1_neg(g1_mul(G1, a * b + 1)), G2)]
    assert native.pairing_check_native(good) is True
    assert native.pairing_check_native(bad) is False
    assert pairing_check(good) and not pairing_check(bad)


@pairing_native
def test_native_pairing_identity_inputs():
    from zkfl_tpu.field.curve import g1_generator, g1_neg, g2_generator

    G1, G2 = g1_generator(), g2_generator()
    # identity factors contribute 1: e(G,Q) * 1 * e(-G,Q) == 1
    pairs = [(G1, G2), (None, G2), (g1_neg(G1), G2), (G1, None)]
    assert native.pairing_check_native(pairs) is True


@pairing_native
def test_groth16_verify_uses_native_pairing():
    """End-to-end: a real proof verifies through the native pairing, and a
    tampered proof is rejected (same algebra as the reference's
    `snarkjs groth16 verify`, full_system_simulation.mjs:865-868)."""
    from zkfl_tpu.field.bn254 import FR as _FR
    from zkfl_tpu.groth16.prover import groth16_prove
    from zkfl_tpu.groth16.setup import groth16_setup
    from zkfl_tpu.groth16.verifier import groth16_verify
    from zkfl_tpu.r1cs.builder import ConstraintSystem

    cs = ConstraintSystem(name="pairing_e2e")
    out = cs.public_input("out", (3 * 3 * 5 + 3 + 7) % _FR)
    x = cs.private_input("x", 3)
    y = cs.private_input("y", 5)
    x2 = cs.mul(x, x)
    x2y = cs.mul(x2, y)
    cs.enforce_equal(x2y + x + 7, out)
    pk, vk = groth16_setup(cs, seed="native-pairing-test", device=False)
    proof = groth16_prove(pk, cs)
    assert groth16_verify(vk, proof)
    proof.public_signals = [(proof.public_signals[0] + 1) % _FR]
    assert not groth16_verify(vk, proof)
