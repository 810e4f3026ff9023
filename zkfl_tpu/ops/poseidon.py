"""Batched Poseidon permutation on TPU (limb arithmetic, JAX/XLA).

The reference computes Poseidon one hash at a time through circomlibjs WASM
(full_system_simulation.mjs:134-196).  Here the batch dimension carries
thousands of permutations per XLA op: dataset leaf hashing, Merkle level
reduction, PRF mask derivation and witness generation all become a handful
of device calls.

States are [batch, t, 16] uint32 limb tensors in Montgomery form over FR.
Outputs are bit-exact vs zkfl_tpu.poseidon.reference (same Grain constants),
pinned by tests/test_ops.py.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..field.bn254 import FR
from ..field.limbs import FR_FIELD, N_LIMBS
from ..poseidon.grain import R_F, partial_rounds, poseidon_params

F = FR_FIELD


@lru_cache(maxsize=32)
class PoseidonKernel:
    """Width-t Poseidon permutation, jitted, batched over leading dim."""

    def __init__(self, t: int):
        self.t = t
        self.rp = partial_rounds(t)
        C, M = poseidon_params(t)
        mont = F.mont_r
        # Round constants: [(R_F+rp), t, 16] in Montgomery form.
        # numpy, not jnp: device constants embedded in jitted code are
        # fetched back per call site at lowering (slow over the axon tunnel)
        self.C = np.stack(
            [F.to_mont(C[r * t : (r + 1) * t]) for r in range(R_F + self.rp)]
        )
        # MDS: [t, t, 16] Montgomery.
        self.M = np.stack([F.to_mont(row) for row in M])
        self._permute = jax.jit(self._permute_impl)

    def _sbox(self, x):
        x2 = F.mont_mul(x, x)
        x4 = F.mont_mul(x2, x2)
        return F.mont_mul(x4, x)

    def _mix(self, state):
        # out[b, i] = sum_j M[i][j] * state[b, j]: one batched Montgomery
        # multiply then a tree-reduced modular sum over j.
        prods = F.mont_mul(self.M[None, :, :, :], state[:, None, :, :])
        return F.sum_mod(prods)

    def _full_round(self, state, c):
        state = F.add(state, c[None, :, :])
        state = self._sbox(state)
        return self._mix(state), None

    def _partial_round(self, state, c):
        state = F.add(state, c[None, :, :])
        lane0 = self._sbox(state[:, 0:1, :])
        state = jnp.concatenate([lane0, state[:, 1:, :]], axis=1)
        return self._mix(state), None

    def _permute_impl(self, state):
        # Three scans (full | partial | full) keep the compiled graph one
        # round-body each instead of ~65 inlined rounds; partial rounds
        # S-box lane 0 only (circomlib round structure).
        rf_half = R_F // 2
        state, _ = jax.lax.scan(self._full_round, state, self.C[:rf_half])
        state, _ = jax.lax.scan(self._partial_round, state, self.C[rf_half : rf_half + self.rp])
        state, _ = jax.lax.scan(self._full_round, state, self.C[rf_half + self.rp :])
        return state

    def permute(self, state):
        """state: [batch, t, 16] mont limbs -> permuted state.

        On TPU the fused Pallas round kernels (ops/poseidon_pallas.py) run
        the whole permutation in VMEM (~100x the XLA limb path); off-TPU
        the oracle-tested XLA path below is used (Pallas interpret mode is
        far too slow for a 65-round scan).
        """
        from .limb_kernels import _interpret
        from .poseidon_pallas import permute_batch

        if not _interpret():
            return permute_batch(state)
        return self._permute(state)

    def hash(self, inputs):
        """inputs: [batch, t-1, 16] mont limbs -> [batch, 16] hash.

        Routes through `permute` so production hashing gets the fused
        Pallas round kernels on TPU (ADVICE r3: calling _permute directly
        left every hash path on the slow XLA limb formulation)."""
        batch = inputs.shape[0]
        zero = jnp.zeros((batch, 1, N_LIMBS), dtype=jnp.uint32)
        state = jnp.concatenate([zero, inputs], axis=1)
        return self.permute(state)[:, 0, :]


def poseidon_hash_device(inputs):
    """inputs: [batch, arity, 16] mont limbs; arity 1..16."""
    return PoseidonKernel(inputs.shape[1] + 1).hash(inputs)


def poseidon_hash_ints(rows):
    """Host convenience: list of equal-arity int rows -> list of int hashes."""
    arity = len(rows[0])
    flat = [v % FR for row in rows for v in row]
    limbs = F.to_mont(flat).reshape(len(rows), arity, N_LIMBS)
    out = poseidon_hash_device(jnp.asarray(limbs))
    return F.from_mont_host(np.asarray(out))


def vector_hash_device(values, chunk_size: int = 16):
    """Batched VectorHash: values [batch, dim, 16] mont limbs.

    Mirrors the chunked 16-ary scheme (vector_hash.circom:46-89): direct
    Poseidon for dim <= 16, else per-chunk hashes then a hash of hashes
    (final short chunk unpadded).
    """
    dim = values.shape[1]
    if dim <= chunk_size:
        return poseidon_hash_device(values)
    chunk_hashes = []
    for start in range(0, dim, chunk_size):
        chunk = values[:, start : start + chunk_size, :]
        chunk_hashes.append(poseidon_hash_device(chunk))
    stacked = jnp.stack(chunk_hashes, axis=1)
    return poseidon_hash_device(stacked)


def merkle_root_device(leaves, depth: int):
    """Batched Merkle tree build: leaves [n, 16] mont limbs (n = 2^depth
    after host-side padding) -> (root [16], levels list).

    Level-by-level reduction: each level is one batched Poseidon(2) call —
    the TPU analog of buildMerkleTree (full_system_simulation.mjs:198-223).
    """
    levels = [leaves]
    cur = leaves
    for _ in range(depth):
        pairs = cur.reshape(cur.shape[0] // 2, 2, N_LIMBS)
        cur = poseidon_hash_device(pairs)
        levels.append(cur)
    return cur[0], levels
