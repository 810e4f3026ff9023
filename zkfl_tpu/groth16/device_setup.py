"""Device-accelerated fixed-base batches for the Groth16 trusted setup.

Round-1 setup ran every [scalar]*G encryption through a pure-Python windowed
ladder — 51 s for the 12.5k-constraint balance circuit and hours at prod
dims (VERDICT.md weak #3).  Here the per-window multiples table
T[w][d] = d * 2^(8w) * G (32 windows x 256 entries) is built once on host,
uploaded once, and a batch of m scalars becomes one gather + a 5-level
fused-point-add tree reduction: ~31 point adds per scalar at the Pallas
kernels' ~32 M adds/s.

The affine conversion back to host uses Montgomery's batch-inversion trick
(one modular inverse for the whole batch).  Replaces the snarkjs
setup/zkey pipeline's encryption loops (full_system_simulation.mjs:713-736).
"""

from __future__ import annotations

from functools import lru_cache
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..field.bn254 import FQ, FR
from ..field.curve import (
    g1_add_jac,
    g1_from_jacobian,
    g1_generator,
    g1_to_jacobian,
    g2_add_jac,
    g2_from_jacobian,
    g2_generator,
    g2_to_jacobian,
    G2_JAC_INF,
)
from ..field.limbs import N_LIMBS
from ..ops import point_kernels as pk
from ..ops.limb_kernels import FQK, FRK
from ..ops.msm_pallas import _G1Ops, _G2Ops, _fold_sum

WINDOW = 8
N_WINDOWS = 32
TABLE = 1 << WINDOW


@lru_cache(maxsize=1)
def _g1_table_device():
    """[3, 16, 32*256] device table: entry (w, d) = d * 2^(8w) * G1."""
    rows: List[Optional[tuple]] = []
    cur = g1_to_jacobian(g1_generator())
    for _ in range(N_WINDOWS):
        acc = (1, 1, 0)
        rows.append(None)
        for _ in range(TABLE - 1):
            acc = g1_add_jac(acc, cur)
            rows.append(g1_from_jacobian(acc))
        for _ in range(WINDOW):
            from ..field.curve import g1_double_jac

            cur = g1_double_jac(cur)
    return pk.g1_to_device(rows)


@lru_cache(maxsize=1)
def _g2_table_device():
    rows = []
    cur = g2_to_jacobian(g2_generator())
    from ..field.curve import g2_double_jac

    for _ in range(N_WINDOWS):
        acc = G2_JAC_INF
        rows.append(None)
        for _ in range(TABLE - 1):
            acc = g2_add_jac(acc, cur)
            rows.append(g2_from_jacobian(acc))
        for _ in range(WINDOW):
            cur = g2_double_jac(cur)
    return pk.g2_to_device(rows)


def _digit_indices(scalars: List[int]) -> jnp.ndarray:
    """[32, n] int32 gather indices w*256 + digit_w(scalar)."""
    sc = FRK.pack([s % FR for s in scalars], mont=False)  # [16, n]
    lo = (sc & 0xFF).astype(np.int32)
    hi = ((sc >> 8) & 0xFF).astype(np.int32)
    digits = np.stack([lo, hi], axis=1).reshape(2 * N_LIMBS, -1)  # [32, n]
    offs = (np.arange(N_WINDOWS, dtype=np.int32) * TABLE)[:, None]
    return jnp.asarray(digits + offs)


@jax.jit
def _fixed_mul_g1_jit(table, idx):
    gathered = jnp.take(table, idx.reshape(-1), axis=-1)  # [3,16,32*n]
    n = idx.shape[-1]
    pts = gathered.reshape(3, N_LIMBS, N_WINDOWS, n)
    # windows to the last axis so the fold's single add site reduces them
    return _fold_sum(jnp.moveaxis(pts, 2, 3), _G1Ops)  # [3, 16, n]


@jax.jit
def _fixed_mul_g2_jit(table, idx):
    gathered = jnp.take(table, idx.reshape(-1), axis=-1)
    n = idx.shape[-1]
    pts = gathered.reshape(3, 2, N_LIMBS, N_WINDOWS, n)
    return _fold_sum(jnp.moveaxis(pts, 3, 4), _G2Ops)


def _batch_affine(xs, ys, zs) -> List[Optional[tuple]]:
    """Projective int coords -> affine pairs via one batched inversion."""
    n = len(zs)
    out: List[Optional[tuple]] = [None] * n
    # Montgomery's trick over the nonzero z's
    idxs = [i for i in range(n) if zs[i] != 0]
    if not idxs:
        return out
    prefix = []
    acc = 1
    for i in idxs:
        prefix.append(acc)
        acc = acc * zs[i] % FQ
    inv = pow(acc, -1, FQ)
    for j in range(len(idxs) - 1, -1, -1):
        i = idxs[j]
        zi = inv * prefix[j] % FQ
        inv = inv * zs[i] % FQ
        out[i] = (xs[i] * zi % FQ, ys[i] * zi % FQ)
    return out


def batch_fixed_mul_g1(scalars: List[int], chunk: int = 1 << 17) -> List[Optional[tuple]]:
    """[s * G1 for s in scalars] -> affine host pairs (None for s = 0)."""
    table = _g1_table_device()
    out: List[Optional[tuple]] = []
    for c0 in range(0, len(scalars), chunk):
        batch = scalars[c0 : c0 + chunk]
        res = np.asarray(_fixed_mul_g1_jit(table, _digit_indices(batch)))
        xs = FQK.unpack(res[0])
        ys = FQK.unpack(res[1])
        zs = FQK.unpack(res[2])
        out.extend(_batch_affine(xs, ys, zs))
    return out


def batch_fixed_mul_g2(scalars: List[int], chunk: int = 1 << 16) -> list:
    """[s * G2 for s in scalars] -> affine (FQ2, FQ2) pairs (None for 0)."""
    from ..field.tower import FQ2

    table = _g2_table_device()
    out = []
    for c0 in range(0, len(scalars), chunk):
        batch = scalars[c0 : c0 + chunk]
        res = np.asarray(_fixed_mul_g2_jit(table, _digit_indices(batch)))
        coords = [[FQK.unpack(res[i, j]) for j in range(2)] for i in range(3)]
        n = len(batch)
        for i in range(n):
            z = FQ2([coords[2][0][i], coords[2][1][i]])
            if z.is_zero():
                out.append(None)
                continue
            zi = z.inv()
            x = FQ2([coords[0][0][i], coords[0][1][i]]) * zi
            y = FQ2([coords[1][0][i], coords[1][1][i]]) * zi
            out.append((x, y))
    return out
