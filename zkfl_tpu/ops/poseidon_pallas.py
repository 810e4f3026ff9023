"""Fused Pallas TPU kernels for the Poseidon permutation.

The round-1/2 Poseidon device path (ops/poseidon.py) ran each round through
the XLA limb layer (field/limbs.py) — ~5.6 khash/s on a v5e chip, memory
bound on the [batch, t, 16, 16] product tensors it materialises in HBM.
Here one Pallas kernel computes an ENTIRE round (add-round-constant, x^5
S-box, MDS mix) for a block of lanes with every intermediate in
VMEM/registers, and a lax.scan over rounds replays the two kernel bodies
(full round / partial round) instead of inlining ~65 of them.

Cost model: a width-t permutation is R_F*t + R_P S-box mont-muls plus
(R_F+R_P)*t^2 MDS const-muls; at the fused kernels' ~500 M mont-muls/s a
t=3 permutation (828 muls) should run at several hundred khash/s — two
orders of magnitude over the XLA path and ~50x the reference's circomlibjs
WASM hasher (full_system_simulation.mjs:134-137).

Layout: states are uint32[t*16, L] limb-major (limb index in sublanes, hash
index in lanes), Montgomery form, matching ops/limb_kernels.py.  Round
constants ride in SMEM as one [t*16] vector per round; the MDS matrix is
baked into the kernel as compile-time Montgomery-form limb constants.

MDS-mix overflow analysis (why one Montgomery reduction per output lane is
sound): each lane value s_j and each MDS constant is canonical (< p), so the
accumulated wide product sum is < t*p^2 < 2^512 for t <= 17 (no carry is
lost from the 32 columns), and the reduced u = (sum + m*p)/R is < (t*p/R +
1)*p, handled by ceil(t*p/R) extra conditional subtractions (t=3: 1, t=17:
4).  Column accumulators stay < t * 2^21 < 2^26, far inside uint32.

Off-TPU the public entry points fall back to the oracle-tested XLA path in
ops/poseidon.py; bit-exactness of this kernel vs that oracle is pinned by
tests/test_pallas_poseidon.py (interpret mode) and on-chip by the same test
under ZKFL_TEST_TPU=1.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..field.bn254 import FR
from ..field.limbs import LIMB_BITS, LIMB_MASK, N_LIMBS, R, int_to_limbs
from ..poseidon.grain import R_F, partial_rounds, poseidon_params
from .limb_kernels import (
    _emit_carry,
    _emit_cond_sub_const,
    _emit_geq_const,
    _emit_mont_mul,
    _emit_mul_low_const,
    _emit_mul_wide_const,
    _interpret,
    _limbs,
)

_PL = _limbs(FR)
_NPL = _limbs((-pow(FR, -1, R)) % R)
_MONT_R = R % FR


def _n_subs(t: int) -> int:
    """Conditional subtractions needed after reducing a t-term product sum."""
    u_bound_num = t * FR * FR + R * FR  # u < u_bound_num / (R * FR) * FR
    u_over_p = -(-u_bound_num // (R * FR))  # ceil(u_bound / p)
    return u_over_p - 1


def _emit_mont_reduce_multi(cols, n_subs: int):
    """32 raw columns (sum of <= 17 wide products) -> canonical 16 limbs."""
    t16, _ = _emit_carry(cols)
    m = _emit_mul_low_const(t16[:N_LIMBS], _NPL)
    m16, _ = _emit_carry(m)
    mn = _emit_mul_wide_const(m16, _PL)
    s = [t16[i] + mn[i] for i in range(2 * N_LIMBS)]
    s16, _ = _emit_carry(s)
    u = s16[N_LIMBS:]
    for _ in range(n_subs):
        u = _emit_cond_sub_const(u, _PL, _emit_geq_const(u, _PL))
    return u


def _round_body(c_ref, s_ref, o_ref, *, t: int, mds, full: bool, subs: int):
    """One Poseidon round: ARK + S-box + MDS mix, all lanes of one block.

    c_ref: SMEM [t*16] round constants (Montgomery limbs); s_ref/o_ref:
    VMEM [t*16, blk].  `mds` is a t x t tuple of 16-limb Montgomery
    constants baked at trace time.
    """
    lanes = []
    for l in range(t):
        x = [s_ref[l * N_LIMBS + i, :] + c_ref[l * N_LIMBS + i] for i in range(N_LIMBS)]
        x16, _ = _emit_carry(x)  # value < 2p: one conditional subtract
        lanes.append(_emit_cond_sub_const(x16, _PL, _emit_geq_const(x16, _PL)))
    for l in range(t) if full else (0,):
        x = lanes[l]
        x2 = _emit_mont_mul(x, x, _PL, _NPL)
        x4 = _emit_mont_mul(x2, x2, _PL, _NPL)
        lanes[l] = _emit_mont_mul(x4, x, _PL, _NPL)
    for i in range(t):
        cols = None
        for j in range(t):
            pc = _emit_mul_wide_const(lanes[j], mds[i][j])
            cols = pc if cols is None else [a + b for a, b in zip(cols, pc)]
        out = _emit_mont_reduce_multi(cols, subs)
        for k in range(N_LIMBS):
            o_ref[i * N_LIMBS + k, :] = out[k]


def _blk_for(t: int) -> int:
    """Lanes per grid step: keep in+out blocks around <= ~2 MB of VMEM."""
    if t <= 4:
        return 2048
    if t <= 8:
        return 1024
    return 256


@lru_cache(maxsize=32)
def _round_call(t: int, full: bool, L: int, interpret: bool):
    """pallas_call for one round at a padded lane count L."""
    C, M = poseidon_params(t)
    del C
    mds = tuple(
        tuple(_limbs(v * _MONT_R % FR) for v in row) for row in M
    )
    subs = _n_subs(t)
    blk = min(_blk_for(t), L)

    def kern(c_ref, s_ref, o_ref):
        _round_body(c_ref, s_ref, o_ref, t=t, mds=mds, full=full, subs=subs)

    spec = pl.BlockSpec((t * N_LIMBS, blk), lambda i: (0, i), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((t * N_LIMBS, L), jnp.uint32),
        grid=(L // blk,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), spec],
        out_specs=spec,
        interpret=interpret,
    )


@lru_cache(maxsize=32)
def _permute_fn(t: int, L: int, interpret: bool = False):
    """Jitted full permutation over [t*16, L] states; constants captured."""
    rp = partial_rounds(t)
    rf_half = R_F // 2
    C, _ = poseidon_params(t)
    # [rounds, t*16] uint32 Montgomery limb rows, one SMEM vector per round.
    c_rows = np.stack(
        [
            np.concatenate(
                [
                    np.asarray(int_to_limbs(C[r * t + l] * _MONT_R % FR), np.uint32)
                    for l in range(t)
                ]
            )
            for r in range(R_F + rp)
        ]
    )
    c_dev = jnp.asarray(c_rows)
    full_call = _round_call(t, True, L, interpret)
    part_call = _round_call(t, False, L, interpret)

    def fb(s, c):
        return full_call(c, s), None

    def pb(s, c):
        return part_call(c, s), None

    def run(state):
        s, _ = jax.lax.scan(fb, state, c_dev[:rf_half])
        s, _ = jax.lax.scan(pb, s, c_dev[rf_half : rf_half + rp])
        s, _ = jax.lax.scan(fb, s, c_dev[rf_half + rp :])
        return s

    return jax.jit(run)


def _pad_pow2(L: int) -> int:
    Lp = 128
    while Lp < L:
        Lp *= 2
    return Lp


def permute_lanes(state_lm: jnp.ndarray, *, interpret: bool | None = None):
    """Poseidon permutation on limb-major states uint32[t*16, L] (Montgomery).

    Pads lanes to a power of two (>= 128) and replays one cached jaxpr per
    (t, padded L).  `interpret` defaults to off-TPU detection.
    """
    t = state_lm.shape[0] // N_LIMBS
    L = state_lm.shape[-1]
    Lp = _pad_pow2(L)
    if interpret is None:
        interpret = _interpret()
    x = state_lm if Lp == L else jnp.pad(state_lm, ((0, 0), (0, Lp - L)))
    out = _permute_fn(t, Lp, interpret)(x)
    return out[:, :L]


def permute_batch(state_bl: jnp.ndarray, *, interpret: bool | None = None):
    """Poseidon permutation on limb-last states uint32[batch, t, 16].

    Layout adapter for ops/poseidon.py's batch convention.
    """
    b, t, _ = state_bl.shape
    lm = jnp.transpose(state_bl, (1, 2, 0)).reshape(t * N_LIMBS, b)
    out = permute_lanes(lm, interpret=interpret)
    return jnp.transpose(out.reshape(t, N_LIMBS, b), (2, 0, 1))
