"""Batched big-field arithmetic on limb-decomposed tensors (the TPU path).

Replaces ffjavascript's bigint field layer (reference dependency,
package.json:44) with a formulation XLA can vectorise on the TPU VPU:

  * A field element is 16 little-endian limbs of 16 bits held in uint32
    (shape [..., 16]).  16-bit limbs keep every partial product < 2^32 and
    every accumulation column < 2^22, so no 64-bit arithmetic is needed —
    TPUs have no native u64.
  * Multiplication is schoolbook (256 limb products, split lo/hi on the
    fly) followed by separated Montgomery reduction with R = 2^256.
  * All functions broadcast over arbitrary leading batch dims; the batch
    dimension is where TPU parallelism comes from (thousands of field ops
    per VPU instruction).

Two moduli are instantiated: FR (scalar field — Poseidon/witness/NTT) and
FQ (base field — curve points/MSM).  Bit-exactness against the pure-Python
layer is pinned in tests/test_limbs.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .bn254 import FQ, FR

N_LIMBS = 16
LIMB_BITS = 16
LIMB_MASK = (1 << LIMB_BITS) - 1
R_BITS = N_LIMBS * LIMB_BITS  # 256
R = 1 << R_BITS


# Skew-gather index for _mul_wide: rows padded to width 32 then flattened;
# element (i, k) of the anti-diagonal view lives at 31*i + k (row stride 32
# minus one for the per-row shift).  Max index 31*15 + 31 = 496 < 512; the
# spill region k < i lands in the previous row's zero padding.
_SKEW_IDX = np.asarray(
    31 * np.arange(N_LIMBS, dtype=np.int32)[:, None]
    + np.arange(2 * N_LIMBS, dtype=np.int32)[None, :]
)


def _kogge_stone(g, p, n: int):
    """Parallel-prefix carry resolution: generate/propagate uint32[..., n]
    (both 0/1) -> inclusive carry-out per position.  Hand-rolled doubling
    steps (shift + mask) — far fewer ops than lax.associative_scan."""
    d = 1
    while d < n:
        gs = jnp.concatenate([jnp.zeros_like(g[..., :d]), g[..., :-d]], axis=-1)
        ps = jnp.concatenate([jnp.zeros_like(p[..., :d]), p[..., :-d]], axis=-1)
        g = g | (p & gs)
        p = p & ps
        d <<= 1
    return g


def int_to_limbs(x: int) -> np.ndarray:
    """Host: python int -> uint32[16] little-endian 16-bit limbs."""
    return np.array([(x >> (LIMB_BITS * i)) & LIMB_MASK for i in range(N_LIMBS)], dtype=np.uint32)


def ints_to_limbs(xs) -> np.ndarray:
    """Host: iterable of ints -> uint32[n, 16] (via 32-byte LE packing)."""
    if not isinstance(xs, (list, tuple)):
        xs = list(xs)
    buf = b"".join(x.to_bytes(32, "little") for x in xs)
    u16 = np.frombuffer(buf, dtype=np.uint16).reshape(len(xs), N_LIMBS)
    return u16.astype(np.uint32)


def limbs_to_ints(a) -> list:
    """Host: uint32[..., 16] -> list of python ints (flattened)."""
    arr = np.asarray(a).reshape(-1, N_LIMBS).astype(np.uint16)
    data = arr.tobytes()
    return [
        int.from_bytes(data[i : i + 32], "little") for i in range(0, len(data), 32)
    ]


class LimbField:
    """Modulus-specific batched arithmetic.  Instantiated for FR and FQ."""

    def __init__(self, modulus: int, name: str):
        self.p = modulus
        self.name = name
        self.mont_r = R % modulus
        self.mont_r2 = (R * R) % modulus
        # n' = -p^-1 mod R  (full 256-bit Montgomery constant)
        self.n_prime = (-pow(modulus, -1, R)) % R
        self.P = int_to_limbs(modulus)
        self.TWO_P = int_to_limbs(2 * modulus)
        self.NPRIME = int_to_limbs(self.n_prime)
        self.R2 = int_to_limbs(self.mont_r2)
        self.ONE_MONT = int_to_limbs(self.mont_r)
        self.ZERO = jnp.zeros(N_LIMBS, dtype=jnp.uint32)

    # -- host converters --------------------------------------------------
    def to_mont(self, xs) -> np.ndarray:
        """Host: list[int] -> Montgomery-form limbs uint32[n,16]."""
        return ints_to_limbs([x * self.mont_r % self.p for x in xs])

    def from_mont_host(self, a) -> list:
        r_inv = pow(self.mont_r, -1, self.p)
        return [v * r_inv % self.p for v in limbs_to_ints(a)]

    def to_limbs(self, xs) -> np.ndarray:
        """Host: list[int] -> standard-form limbs."""
        return ints_to_limbs([x % self.p for x in xs])

    def from_limbs(self, a) -> list:
        return limbs_to_ints(a)

    # -- device ops (all jit-safe, broadcast over leading dims) ----------
    @staticmethod
    def _carry_propagate(cols, n_out):
        """cols: uint32[..., n_out] with entries < 2^31; normalise to 16-bit
        limbs, dropping the final carry (callers guarantee it is zero).

        Two vectorised steps instead of an n_out-long ripple: (1) split each
        column into lo + hi and add the his one position up (result < 2^17);
        (2) resolve the remaining 0/1 carries with a Kogge-Stone
        generate/propagate prefix scan — log2(n_out) levels, no per-limb
        slicing, so the jitted graph stays small and the VPU sees whole-row
        ops."""
        lo = cols & LIMB_MASK
        hi = cols >> LIMB_BITS
        hi_up = jnp.concatenate([jnp.zeros_like(hi[..., :1]), hi[..., :-1]], axis=-1)
        s = lo + hi_up  # < 2^17
        g = s >> LIMB_BITS  # carry generated here (0/1)
        p = ((s & LIMB_MASK) == LIMB_MASK).astype(jnp.uint32)  # propagates
        G = _kogge_stone(g, p, n_out)
        carry_in = jnp.concatenate([jnp.zeros_like(G[..., :1]), G[..., :-1]], axis=-1)
        return (s + carry_in) & LIMB_MASK

    @staticmethod
    def _mul_wide(a, b):
        """Full 512-bit product: uint32[...,16] x uint32[...,16] ->
        normalised uint32[...,32] 16-bit limbs.

        Anti-diagonal reduction by shift-add via a strided gather: rows
        padded to width 32 then flattened; element (i, k) of the
        anti-diagonal view lives at 31*i + k (row stride 32 minus one for
        the per-row shift), so two gathers + row sums produce the column
        sums.  Measured 2.7x faster on XLA:CPU than the static pad-shift
        formulation (r5 A/B: 0.64 vs 0.24 M mul_wide/s) — the gather
        vectorises fine and avoids materialising 16 padded copies.  Each
        column accumulates <= 32 terms < 2^16, so uint32 never overflows
        before the carry pass."""
        prod = a[..., :, None] * b[..., None, :]  # [..., 16, 16] uint32
        lo = prod & LIMB_MASK
        hi = prod >> LIMB_BITS
        zeros = jnp.zeros_like(lo)
        one = jnp.zeros_like(lo[..., :1])
        lo_p = jnp.concatenate([lo, zeros], axis=-1).reshape(
            lo.shape[:-2] + (2 * N_LIMBS * N_LIMBS,)
        )
        hi_p = jnp.concatenate([one, hi, zeros[..., 1:]], axis=-1).reshape(
            hi.shape[:-2] + (2 * N_LIMBS * N_LIMBS,)
        )
        cols = jnp.take(lo_p, _SKEW_IDX, axis=-1).sum(axis=-2) + jnp.take(
            hi_p, _SKEW_IDX, axis=-1
        ).sum(axis=-2)
        return LimbField._carry_propagate(cols, 2 * N_LIMBS)

    @staticmethod
    def _mul_low(a, b):
        """Low 256 bits of the product (for m = t * n' mod R)."""
        return LimbField._mul_wide(a, b)[..., :N_LIMBS]

    def _geq(self, a, b):
        """a >= b lexicographically from the top limb; bool[...]."""
        gt = a > b
        eq = a == b
        # eq_above[k] = all limbs strictly above k are equal.
        eq_sfx = jnp.cumprod(eq[..., ::-1].astype(jnp.uint32), axis=-1)[..., ::-1]
        eq_above = jnp.concatenate(
            [eq_sfx[..., 1:], jnp.ones_like(eq_sfx[..., :1])], axis=-1
        )
        return jnp.any(gt & (eq_above == 1), axis=-1) | jnp.all(eq, axis=-1)

    def _sub_raw(self, a, b):
        """(a - b) assuming a >= b; Kogge-Stone borrow propagation."""
        g = (a < b).astype(jnp.uint32)  # borrow generated here
        p = (a == b).astype(jnp.uint32)  # borrow propagates through
        G = _kogge_stone(g, p, N_LIMBS)
        borrow_in = jnp.concatenate([jnp.zeros_like(G[..., :1]), G[..., :-1]], axis=-1)
        return (a + (1 << LIMB_BITS) - b - borrow_in) & LIMB_MASK

    def _cond_sub(self, a, const):
        """Subtract `const` (limb constant) once where a >= const."""
        c = jnp.broadcast_to(const, a.shape)
        need = self._geq(a, c)
        return jnp.where(need[..., None], self._sub_raw(a, c), a)

    def _cond_sub_p(self, a):
        """a mod p given a < 2p."""
        return self._cond_sub(a, self.P)

    def sum_mod(self, x):
        """Modular sum over axis -2: x uint32[..., m, 16] canonical -> [..., 16].

        Pairwise tree with *raw* limb adds — a value bound of 4p still fits
        16 limbs (4p < 2^256 for both BN254 moduli), so we only normalise
        (two conditional subtracts) every second level.  One batched carry
        propagation per level replaces m-1 full modular adds; this is the
        workhorse behind the Poseidon MDS mix and NTT-style reductions."""
        bound = 1  # current bound as a multiple of p
        while x.shape[-2] > 1:
            m = x.shape[-2]
            if m % 2:
                pad = jnp.zeros(x.shape[:-2] + (1, N_LIMBS), dtype=x.dtype)
                x = jnp.concatenate([x, pad], axis=-2)
                m += 1
            x = x.reshape(x.shape[:-2] + (m // 2, 2, N_LIMBS)).sum(axis=-2)
            x = self._carry_propagate(x, N_LIMBS)
            bound *= 2
            if bound == 4 and x.shape[-2] > 1:
                x = self._cond_sub(x, self.TWO_P)
                x = self._cond_sub(x, self.P)
                bound = 1
        x = x[..., 0, :]
        if bound == 4:
            x = self._cond_sub(x, self.TWO_P)
        if bound >= 2:
            x = self._cond_sub(x, self.P)
        return x

    def add(self, a, b):
        cols = a + b  # limbs < 2^17, no overflow
        summed = self._carry_propagate(cols, N_LIMBS)
        # (a + b) < 2p given canonical inputs; the dropped carry is zero
        # because p < 2^255 and limbs hold 256 bits.
        return self._cond_sub_p(summed)

    def sub(self, a, b):
        """(a - b) mod p."""
        lt = ~self._geq(a, b)
        a_adj = jnp.where(lt[..., None], self._add_raw(a, jnp.broadcast_to(self.P, a.shape)), a)
        return self._sub_raw(a_adj, b)

    def _add_raw(self, a, b):
        return self._carry_propagate(a + b, N_LIMBS)

    def neg(self, a):
        is_zero = jnp.all(a == 0, axis=-1)
        negated = self._sub_raw(jnp.broadcast_to(self.P, a.shape), a)
        return jnp.where(is_zero[..., None], a, negated)

    def mont_reduce(self, t):
        """t: uint32[...,32] (t < p*R) -> t*R^-1 mod p as uint32[...,16]."""
        t_lo = t[..., :N_LIMBS]
        m = self._mul_low(t_lo, jnp.broadcast_to(self.NPRIME, t_lo.shape))
        mn = self._mul_wide(m, jnp.broadcast_to(self.P, m.shape))
        # u = (t + m*n) / R: sum as uint32 columns then carry.
        cols = t + mn
        full = self._carry_propagate(cols, 2 * N_LIMBS)
        # The low 256 bits are zero by construction; (t + mn) may carry one
        # extra bit beyond 2*16 limbs: (t + mn) < pR + pR = 2pR < R^2 so the
        # quotient fits 257 bits -> handle via one conditional subtract.
        u = full[..., N_LIMBS:]
        # detect carry-out: t + mn >= R^2 is impossible, but u may be >= p.
        return self._cond_sub_p(u)

    def mont_mul(self, a, b):
        """Montgomery product: (a * b * R^-1) mod p."""
        return self.mont_reduce(self._mul_wide(a, b))

    def mont_square(self, a):
        return self.mont_mul(a, a)

    def to_mont_device(self, a):
        """Standard-form limbs -> Montgomery form, on device."""
        return self.mont_mul(a, jnp.broadcast_to(self.R2, a.shape))

    def from_mont_device(self, a):
        """Montgomery form -> standard form, on device."""
        one = jnp.zeros_like(a).at[..., 0].set(1)
        return self.mont_mul(a, one)

    def mont_pow(self, a, e: int):
        """a^e for a python-int exponent.

        Short exponents unroll (fully fused); long ones (Fermat inversion's
        p-2) run as a lax.scan over the bit vector so the jitted graph stays
        one square+select body instead of ~500 inlined multiplies."""
        if e.bit_length() <= 16:
            result = jnp.broadcast_to(self.ONE_MONT, a.shape)
            base = a
            while e > 0:
                if e & 1:
                    result = self.mont_mul(result, base)
                e >>= 1
                if e:
                    base = self.mont_square(base)
            return result
        bits = np.asarray(
            [(e >> i) & 1 for i in range(e.bit_length())], dtype=np.uint32
        )

        def step(carry, bit):
            result, base = carry
            mult = self.mont_mul(result, base)
            result = jnp.where((bit == 1)[..., None], mult, result)
            return (result, self.mont_square(base)), None

        init = (jnp.broadcast_to(self.ONE_MONT, a.shape), a)
        (result, _), _ = jax.lax.scan(step, init, bits)
        return result

    def inv(self, a):
        """Batched inversion via Fermat (a^(p-2)); a in Montgomery form."""
        return self.mont_pow(a, self.p - 2)

    def is_zero(self, a):
        return jnp.all(a == 0, axis=-1)

    def select(self, cond, a, b):
        """Elementwise select; cond is bool[...] (no limb dim)."""
        return jnp.where(cond[..., None], a, b)


FR_FIELD = LimbField(FR, "fr")
FQ_FIELD = LimbField(FQ, "fq")
