"""Multi-chip NTT over BN254-Fr: 4-step (Bailey) decomposition on a mesh.

SURVEY §2.4 NTT row / VERDICT r1 item 8: snarkjs runs its QAP FFTs
single-threaded; at prod dims the domains reach 2^17-2^18, so the rebuild
shards them.  Radix-2 stages with per-stage cross-shard exchanges would
need log2(D) collectives; the 4-step scheme needs exactly ONE all_to_all:

    N = n1 * n2, input matrix M[j1, j2] = x[j1*n2 + j2], j2 sharded.
    1. column NTTs (size n1)            — local (each chip owns whole cols)
    2. twiddle by w_N^(k1*j2)           — local (table passed in, sharded)
    3. transpose via all_to_all         — the one ICI collective
    4. row NTTs (size n2)               — local
    output X[k1 + n1*k2] = Z[k1, k2], un-transposed outside the shard_map.

Identical math to groth16/qap.py's ntt (same fr_nth_root convention:
w_N^{n2} = w_{n1}), so the oracle test is direct equality.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..field.bn254 import FR, fr_inv, fr_nth_root
from ..field.limbs import N_LIMBS
from ..ops.limb_kernels import FRK
from ..ops.qap_pallas import ntt_lm


@lru_cache(maxsize=16)
def _twiddle_table(n1: int, n2: int, inverse: bool) -> np.ndarray:
    """[16, n1, n2] Montgomery w_N^(±k1*j2) (numpy: trace-safe to cache)."""
    n = n1 * n2
    w = fr_nth_root(n)
    if inverse:
        w = fr_inv(w)
    rows = []
    for k1 in range(n1):
        wk = pow(w, k1, FR)
        acc = 1
        row = []
        for _ in range(n2):
            row.append(acc)
            acc = acc * wk % FR
        rows.extend(row)
    return FRK.pack(rows).reshape(N_LIMBS, n1, n2)


def _ntt_axis(x, axis_len: int, inverse: bool):
    """NTT along the second-to-last axis of [16, B, L, m]."""
    _, B, L, m = x.shape
    xt = jnp.moveaxis(x, 2, 3).reshape(N_LIMBS, B * m, L)
    yt = ntt_lm(xt, inverse=inverse)
    return jnp.moveaxis(yt.reshape(N_LIMBS, B, m, L), 3, 2)


def _ntt4_local(x, tw, axis_name: str, inverse: bool):
    """Per-device body: x [16, B, n1, n2/D], tw [16, n1, n2/D]."""
    _, B, n1, n2_loc = x.shape
    # 1. column NTTs (size n1), local
    y = _ntt_axis(x, n1, inverse)
    # 2. twiddle w^(k1 * j2)
    y = FRK.mont_mul(
        y.reshape(N_LIMBS, -1),
        jnp.broadcast_to(tw[:, None], (N_LIMBS, B, n1, n2_loc)).reshape(N_LIMBS, -1),
    ).reshape(N_LIMBS, B, n1, n2_loc)
    # 3. transpose: shard moves from j2 to k1 (ONE all_to_all over ICI)
    z = jax.lax.all_to_all(y, axis_name, split_axis=2, concat_axis=3, tiled=True)
    # z: [16, B, n1/D, n2]
    # 4. row NTTs (size n2), local
    _, _, n1_loc, n2 = z.shape
    zt = z.reshape(N_LIMBS, B * n1_loc, n2)
    return ntt_lm(zt, inverse=inverse).reshape(N_LIMBS, B, n1_loc, n2)


def make_ntt_sharded(mesh: Mesh, n: int, batch: int, axis: str = "tp",
                     inverse: bool = False, n1: int | None = None):
    """Jitted sharded NTT: x [16, B, n] (replicated or sharded) -> [16, B, n]
    in standard order.  n = n1*n2 with both multiples of the axis size."""
    D = mesh.shape[axis]
    if n1 is None:
        n1 = 1 << ((n.bit_length() - 1) // 2)
        n1 = max(n1, D)
    n2 = n // n1
    assert n1 % D == 0 and n2 % D == 0, (n1, n2, D)
    tw = jnp.asarray(_twiddle_table(n1, n2, inverse))

    local = jax.shard_map(
        partial(_ntt4_local, axis_name=axis, inverse=inverse),
        mesh=mesh,
        in_specs=(P(None, None, None, axis), P(None, None, axis)),
        out_specs=P(None, None, axis, None),
        check_vma=False,
    )

    def fn(x):
        mat = x.reshape(N_LIMBS, batch, n1, n2)
        z = local(mat, tw)  # [16, B, n1, n2], output index k1 + n1*k2
        return jnp.moveaxis(z, 2, 3).reshape(N_LIMBS, batch, n)

    return jax.jit(fn)


def ntt_sharded(x, mesh: Mesh, axis: str = "tp", inverse: bool = False):
    """Host-facing sharded NTT on [16, B, n] Montgomery limb tensors."""
    _, B, n = x.shape
    return make_ntt_sharded(mesh, n, B, axis, inverse)(x)
