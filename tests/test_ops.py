"""Batched device Poseidon / VectorHash / Merkle vs the pure-Python oracle.

The oracle (zkfl_tpu.poseidon.reference, zkfl_tpu.commit) is itself pinned
to circomlibjs behaviour by the committed reference vectors; these tests pin
the TPU batch kernels (zkfl_tpu.ops.poseidon) to the oracle bit-exactly.
"""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from zkfl_tpu.commit.merkle import MerkleTree
from zkfl_tpu.commit.vector_hash import vector_hash
from zkfl_tpu.field.bn254 import FR
from zkfl_tpu.field.limbs import FR_FIELD, N_LIMBS
from zkfl_tpu.ops.poseidon import (
    PoseidonKernel,
    merkle_root_device,
    poseidon_hash_ints,
    vector_hash_device,
)
from zkfl_tpu.poseidon.reference import poseidon

rng = random.Random(7)
F = FR_FIELD


def rand_rows(batch, arity):
    return [[rng.randrange(FR) for _ in range(arity)] for _ in range(batch)]


@pytest.mark.parametrize("arity", [1, 2, 3, 5, 16])
def test_poseidon_batch_matches_reference(arity):
    rows = rand_rows(9, arity)
    got = poseidon_hash_ints(rows)
    want = [poseidon(row) for row in rows]
    assert got == want


def test_poseidon_kernel_cached():
    assert PoseidonKernel(3) is PoseidonKernel(3)


def test_vector_hash_device_chunked():
    # dim > 16 exercises the 16-ary chunk-then-hash-of-hashes path
    # (vector_hash.circom:46-89), final short chunk unpadded.
    for dim in (4, 16, 17, 20, 33):
        rows = rand_rows(5, dim)
        limbs = F.to_mont([v for row in rows for v in row]).reshape(5, dim, N_LIMBS)
        out = vector_hash_device(jnp.asarray(limbs))
        got = F.from_mont_host(np.asarray(out))
        assert got == [vector_hash(row) for row in rows], f"dim={dim}"


def test_merkle_root_device_matches_host():
    depth = 4
    leaves_int = [rng.randrange(FR) for _ in range(1 << depth)]
    tree = MerkleTree(leaves_int, depth)
    limbs = jnp.asarray(F.to_mont(leaves_int).reshape(-1, N_LIMBS))
    root, levels = merkle_root_device(limbs, depth)
    got_root = F.from_mont_host(np.asarray(root)[None, :])[0]
    assert got_root == tree.root
    assert len(levels) == depth + 1
