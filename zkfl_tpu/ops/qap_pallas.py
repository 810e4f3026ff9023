"""QAP pipeline on device: limb-major NTT + sparse matrix evaluation.

The round-1 device pipeline (ops/ntt.py) round-tripped every stage through
host Python ints and ran its butterflies on the memory-bound XLA limb layer.
This version keeps the whole witness -> h(X) dataflow on device in the
limb-major [16, ...] layout, with each NTT butterfly stage ONE fused Pallas
kernel (multiply by the stage twiddles + both add/sub outputs).

Replaces the FFT/QAP stage of `snarkjs groth16 prove`
(full_system_simulation.mjs:770-780; SURVEY §3.3 — QAP NTTs over domains
2^14..2^18).  Oracle: groth16/qap.py (tests/test_pallas_kernels.py
TestQapPallas).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..field.bn254 import FR, FR_GENERATOR, fr_inv, fr_nth_root
from ..field.limbs import N_LIMBS
from .limb_kernels import FRK


@lru_cache(maxsize=32)
def _stage_twiddles(n: int, inverse: bool):
    """Per-stage twiddles [16, half] in Montgomery form (device constants)."""
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
        stages.append(FRK.pack(ws))  # numpy: safe to cache across traces
        length <<= 1
    return stages


@lru_cache(maxsize=32)
def _bitrev_idx(n: int):
    bits = n.bit_length() - 1
    idx = np.zeros(n, dtype=np.int32)
    for i in range(n):
        idx[int(format(i, f"0{bits}b")[::-1], 2)] = i
    return idx  # numpy: jnp constants cached across traces leak tracers


@lru_cache(maxsize=32)
def _coset_powers(n: int, inverse: bool):
    s = fr_inv(FR_GENERATOR) if inverse else FR_GENERATOR
    out = []
    acc = 1
    for _ in range(n):
        out.append(acc)
        acc = acc * s % FR
    return FRK.pack(out)  # numpy [16, n] Montgomery (trace-safe to cache)


def ntt_lm(x: jnp.ndarray, inverse: bool = False) -> jnp.ndarray:
    """Batched radix-2 NTT, limb-major: x [16, B, n] Montgomery -> same.

    Decimation-in-time with an up-front bit-reversal gather; every stage is
    one fused butterfly kernel call over all B*n/2 lanes."""
    _, B, n = x.shape
    x = jnp.take(x, _bitrev_idx(n), axis=-1)
    for s, tw in enumerate(_stage_twiddles(n, inverse)):
        half = 1 << s
        length = half * 2
        blocks = x.reshape(N_LIMBS, B, n // length, length)
        u = blocks[..., :half].reshape(N_LIMBS, -1)
        v = blocks[..., half:].reshape(N_LIMBS, -1)
        twb = jnp.broadcast_to(
            tw[:, None, None, :], (N_LIMBS, B, n // length, half)
        ).reshape(N_LIMBS, -1)
        hi, lo = FRK.butterfly(u, v, twb)
        x = jnp.concatenate(
            [
                hi.reshape(N_LIMBS, B, n // length, half),
                lo.reshape(N_LIMBS, B, n // length, half),
            ],
            axis=-1,
        ).reshape(N_LIMBS, B, n)
    if inverse:
        n_inv_mont = fr_inv(n) * FRK.mont_r % FR
        x = FRK.mont_mul_const(x.reshape(N_LIMBS, -1), n_inv_mont).reshape(
            N_LIMBS, B, n
        )
    return x


def compute_h_lm(evals: jnp.ndarray) -> jnp.ndarray:
    """evals [16, B, 3, n] Montgomery (A.s, B.s, C.s on the domain, per
    batched proof) -> h(X) coefficients [16, B, n] in STANDARD form (ready
    for MSM digits).

    Coset trick exactly as qap.compute_h_coeffs: on g<omega> the vanishing
    polynomial is the constant g^n - 1, so the division is one fused
    (a*b - c) * z_inv kernel."""
    _, B, _, n = evals.shape
    coeffs = ntt_lm(evals.reshape(N_LIMBS, 3 * B, n), inverse=True)
    cp = _coset_powers(n, False)
    shifted = FRK.mont_mul(
        coeffs.reshape(N_LIMBS, -1),
        jnp.tile(cp, (1, 3 * B)),
    ).reshape(N_LIMBS, 3 * B, n)
    on_coset = ntt_lm(shifted).reshape(N_LIMBS, B, 3, n)
    z_inv = fr_inv((pow(FR_GENERATOR, n, FR) - 1) % FR)
    z_inv_mont = z_inv * FRK.mont_r % FR
    h_s = FRK.mul_sub_mul_const(
        on_coset[:, :, 0].reshape(N_LIMBS, -1),
        on_coset[:, :, 1].reshape(N_LIMBS, -1),
        on_coset[:, :, 2].reshape(N_LIMBS, -1),
        z_inv_mont,
    ).reshape(N_LIMBS, B, n)
    h_c = ntt_lm(h_s, inverse=True)
    h_c = FRK.mont_mul(
        h_c.reshape(N_LIMBS, -1), jnp.tile(_coset_powers(n, True), (1, B))
    )
    return FRK.from_mont(h_c).reshape(N_LIMBS, B, n)


class DeviceMatrices:
    """Device-resident COO form of the three R1CS matrices (one stream).

    Row ids are offset by which*domain so A, B and C reduce in ONE
    segment_sum; coefficients are Montgomery limb-major."""

    def __init__(self, constraints, domain: int, nnz_pad=None):
        self.domain = domain
        rows, cols, coeffs = [], [], []
        for which in range(3):
            for j, abc in enumerate(constraints):
                for w, coef in abc[which].items():
                    rows.append(which * domain + j)
                    cols.append(w)
                    coeffs.append(coef % FR)
        if nnz_pad is not None:
            if nnz_pad < len(rows):
                raise ValueError(f"nnz_pad {nnz_pad} < nnz {len(rows)}")
            # zero-coefficient padding terms land in row 0 / wire 0: 0 adds
            pad = nnz_pad - len(rows)
            rows += [0] * pad
            cols += [0] * pad
            coeffs += [0] * pad
        self.rows = jnp.asarray(np.asarray(rows, dtype=np.int32))
        self.cols = jnp.asarray(np.asarray(cols, dtype=np.int32))
        self.coeffs = jnp.asarray(FRK.pack(coeffs))  # [16, nnz]

    @classmethod
    def from_coo(cls, compiled, domain: int, nnz_pad=None) -> "DeviceMatrices":
        """Build from a CompiledCircuit's prepacked COO arrays (no Python
        per-entry loop — prod-dims circuits have ~10M entries)."""
        self = cls.__new__(cls)
        self.domain = domain
        rows = compiled.which.astype(np.int32) * domain + compiled.row
        cols = compiled.col
        coeffs = compiled.coeffs
        if nnz_pad is not None:
            nnz = rows.shape[0]
            if nnz_pad < nnz:
                raise ValueError(f"nnz_pad {nnz_pad} < nnz {nnz}")
            pad = nnz_pad - nnz
            rows = np.concatenate([rows, np.zeros(pad, np.int32)])
            cols = np.concatenate([cols, np.zeros(pad, np.int32)])
            coeffs = np.concatenate(
                [coeffs, np.zeros((coeffs.shape[0], pad), coeffs.dtype)], axis=1
            )
        self.rows = jnp.asarray(rows)
        self.cols = jnp.asarray(np.asarray(cols, dtype=np.int32))
        self.coeffs = jnp.asarray(coeffs)
        return self


def matrix_evals_lm(rows, cols, coeffs, w_mont, domain: int) -> jnp.ndarray:
    """Sparse (A.s, B.s, C.s): w_mont [16, B, m] -> [16, B, 3, domain]
    Montgomery (B = client/proof batch).

    gather -> fused mont_mul -> one segment_sum of 16-bit limbs (each row
    sum < nnz_row * 2^16 < 2^31) -> fused carry + Montgomery re-reduction."""
    _, B, m = w_mont.shape
    nnz = cols.shape[0]
    w_flat = w_mont.reshape(N_LIMBS, B * m)
    idx = (jnp.arange(B, dtype=jnp.int32)[:, None] * m + cols[None, :]).reshape(-1)
    terms = FRK.mont_mul(
        jnp.take(w_flat, idx, axis=-1), jnp.tile(coeffs, (1, B))
    )  # [16, B*nnz]
    seg = (
        jnp.arange(B, dtype=jnp.int32)[:, None] * (3 * domain) + rows[None, :]
    ).reshape(-1)
    sums = jax.ops.segment_sum(
        terms.T, seg, num_segments=B * 3 * domain
    )  # [B*3*domain, 16]
    out = FRK.normalize_raw(sums.T)  # [16, B*3*domain]
    return out.reshape(N_LIMBS, B, 3, domain)
