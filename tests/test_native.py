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
