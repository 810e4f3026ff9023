"""Batched radix-2 NTT over BN254-Fr on TPU + the QAP h(X) pipeline.

Replaces the FFT stage inside `snarkjs groth16 prove`
(full_system_simulation.mjs:770-780; SURVEY §3.3: QAP polynomial NTTs over
domains 2^15..2^17).  Design:

  * Values are [batch, n, 16] uint32 limb tensors in Montgomery form.
  * Decimation-in-time with an up-front bit-reversal gather (one static
    gather, free on TPU), then log2(n) stages; stage s reshapes to
    [batch, n/L, L] blocks and does ONE batched Montgomery multiply by the
    stage twiddle vector — the butterfly is two whole-array adds/subs.
  * compute_h_coeffs_device fuses the whole coset pipeline (3 iNTT → coset
    scale → 3 NTT → pointwise (ab - c)/Z → coset iNTT) into one jit.
  * sparse_matvec evaluates the R1CS rows (A.s, B.s, C.s) as
    gather → mont_mul → per-limb segment_sum → Montgomery re-reduction,
    the TPU analog of the witness-to-QAP evaluation step.

Oracle: bit-exact vs groth16/qap.py (tests/test_ops_ntt.py).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from ..field.bn254 import FR, FR_GENERATOR, fr_inv, fr_nth_root
from ..field.limbs import FR_FIELD, N_LIMBS

F = FR_FIELD


@lru_cache(maxsize=16)
def _stage_twiddles(n: int, inverse: bool):
    """Host: per-stage twiddle tensors [log2(n)][half] in Montgomery form."""
    stages = []
    length = 2
    while length <= n:
        w_len = fr_nth_root(length)
        if inverse:
            w_len = fr_inv(w_len)
        half = length // 2
        ws = []
        w = 1
        for _ in range(half):
            ws.append(w)
            w = w * w_len % FR
        stages.append(jnp.asarray(F.to_mont(ws)))
        length <<= 1
    return stages


@lru_cache(maxsize=16)
def _bitrev_idx(n: int):
    bits = n.bit_length() - 1
    idx = np.zeros(n, dtype=np.int32)
    for i in range(n):
        idx[int(format(i, f"0{bits}b")[::-1], 2)] = i
    return jnp.asarray(idx)


@lru_cache(maxsize=16)
def _coset_powers(n: int, inverse: bool):
    """[n] powers of the coset shift (or its inverse), Montgomery form."""
    s = fr_inv(FR_GENERATOR) if inverse else FR_GENERATOR
    out = []
    acc = 1
    for _ in range(n):
        out.append(acc)
        acc = acc * s % FR
    return jnp.asarray(F.to_mont(out))


def ntt_device(x, inverse: bool = False):
    """x: [batch, n, 16] mont limbs -> NTT along axis 1 (in-order I/O)."""
    batch, n, _ = x.shape
    x = jnp.take(x, _bitrev_idx(n), axis=1)
    for s, tw in enumerate(_stage_twiddles(n, inverse)):
        half = 1 << s
        length = half * 2
        blocks = x.reshape(batch, n // length, length, N_LIMBS)
        u = blocks[:, :, :half, :]
        v = F.mont_mul(blocks[:, :, half:, :], tw[None, None, :, :])
        x = jnp.concatenate([F.add(u, v), F.sub(u, v)], axis=2).reshape(
            batch, n, N_LIMBS
        )
    if inverse:
        n_inv = jnp.asarray(F.to_mont([fr_inv(n)])[0])
        x = F.mont_mul(x, n_inv[None, None, :])
    return x


@partial(jax.jit, static_argnums=(3,))
def _h_coeffs_impl(a, b, c, n: int):
    abc = jnp.stack([a, b, c])  # [3, n, 16]
    coeffs = ntt_device(abc, inverse=True)
    shifted = F.mont_mul(coeffs, _coset_powers(n, False)[None, :, :])
    evals = ntt_device(shifted)
    z_inv = jnp.asarray(F.to_mont([fr_inv((pow(FR_GENERATOR, n, FR) - 1) % FR)])[0])
    h_s = F.mont_mul(
        F.sub(F.mont_mul(evals[0], evals[1]), evals[2]), z_inv[None, :]
    )
    h_c = ntt_device(h_s[None], inverse=True)[0]
    return F.mont_mul(h_c, _coset_powers(n, True))


def compute_h_coeffs_device(a_evals, b_evals, c_evals):
    """Host ints -> h(X) coefficients (host ints); same contract as
    qap.compute_h_coeffs but one fused device pipeline."""
    n = len(a_evals)
    a = jnp.asarray(F.to_mont(a_evals).reshape(n, N_LIMBS))
    b = jnp.asarray(F.to_mont(b_evals).reshape(n, N_LIMBS))
    c = jnp.asarray(F.to_mont(c_evals).reshape(n, N_LIMBS))
    out = _h_coeffs_impl(a, b, c, n)
    return F.from_mont_host(np.asarray(out))


class SparseMatrices:
    """Device-resident CSR-ish form of the three R1CS matrices.

    Rows of A, B, C are flattened into one COO stream each: (row, col,
    coeff).  Evaluation gathers witness limbs by col, Montgomery-multiplies
    by coeff, and segment-sums per limb — the sums stay exact in uint32
    (limb < 2^16, per-row nnz < 2^15) and one Montgomery reduction folds
    each row back below p.
    """

    def __init__(self, constraints, domain: int):
        self.domain = domain
        self.n_constraints = len(constraints)
        self.parts = []
        for which in range(3):
            rows, cols, coeffs = [], [], []
            for j, abc in enumerate(constraints):
                for w, coef in abc[which].items():
                    rows.append(j)
                    cols.append(w)
                    coeffs.append(coef % FR)
            self.parts.append(
                (
                    jnp.asarray(np.asarray(rows, dtype=np.int32)),
                    jnp.asarray(np.asarray(cols, dtype=np.int32)),
                    jnp.asarray(F.to_mont(coeffs).reshape(len(coeffs), N_LIMBS)),
                )
            )

    def eval_with(self, witness_mont):
        """witness_mont: [n_wires, 16] mont limbs -> 3 x [domain, 16] mont."""
        outs = []
        for rows, cols, coeffs in self.parts:
            outs.append(
                _sparse_eval(rows, cols, coeffs, witness_mont, self.domain)
            )
        return outs


@partial(jax.jit, static_argnums=(4,))
def _sparse_eval(rows, cols, coeffs, witness, domain: int):
    terms = F.mont_mul(jnp.take(witness, cols, axis=0), coeffs)  # [nnz, 16] < p
    sums = jax.ops.segment_sum(terms, rows, num_segments=domain)  # cols < 2^31
    # Row sums can reach nnz*p (~2^269): carry into 17 limbs, then one
    # Montgomery reduction (t < pR trivially) brings the value below p.
    ext = jnp.concatenate(
        [sums, jnp.zeros(sums.shape[:-1] + (1,), dtype=jnp.uint32)], axis=-1
    )
    norm17 = F._carry_propagate(ext, N_LIMBS + 1)
    padded = jnp.concatenate(
        [norm17, jnp.zeros(sums.shape[:-1] + (N_LIMBS - 1,), dtype=jnp.uint32)],
        axis=-1,
    )
    reduced = F.mont_reduce(padded)  # value * R^-1 mod p (standard-ish form)
    # Terms were Montgomery (x*R); reduction stripped one R: multiply back.
    return F.mont_mul(reduced, jnp.broadcast_to(F.R2, reduced.shape))


def matrix_evals_device(sm: SparseMatrices, witness):
    """Host witness ints -> (a, b, c) eval int lists, qap.matrix_evals contract."""
    w = jnp.asarray(F.to_mont(witness).reshape(len(witness), N_LIMBS))
    a, b, c = sm.eval_with(w)
    return (
        F.from_mont_host(np.asarray(a)),
        F.from_mont_host(np.asarray(b)),
        F.from_mont_host(np.asarray(c)),
    )
