"""Batched G1 curve arithmetic + MSM on TPU (limb tensors, JAX/XLA).

Replaces snarkjs's ffjavascript MSM (the Groth16 prove hot path,
full_system_simulation.mjs:770-780; ~95% of reference round latency per
SURVEY §3.3) with an XLA-friendly formulation:

  * Points are projective (X:Y:Z) limb tensors over FQ in Montgomery form,
    shape [..., 3, 16].  The identity is (0:1:0).
  * Point addition uses the COMPLETE formulas of Renes-Costello-Batina 2015
    (Algorithm 7/9 for a=0, b3=3b=9): branchless, no doubling/infinity edge
    cases — every lane executes the same instructions, which is exactly
    what the VPU wants.
  * MSM is a windowed Horner scan: process the 254-bit scalars in W-bit
    windows MSB-first; per window bit, mask-select the points and
    tree-reduce (halving levels for the bulk, then a constant-shape
    butterfly so the jitted graph stays a handful of padd instantiations).
    No data-dependent scatter, no sort — everything static-shape.

Bit-exact vs the pure-Python Jacobian engine (field/curve.py, groth16/
prover.py), pinned by tests/test_ops_curve.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..field.bn254 import FQ
from ..field.limbs import FQ_FIELD, N_LIMBS, ints_to_limbs

F = FQ_FIELD

# b3 = 3*b = 9 for BN254 (y^2 = x^3 + 3), Montgomery form.
_B3 = jnp.asarray(ints_to_limbs([9 * F.mont_r % FQ])[0])


def inf_point(shape=()):
    """Identity (0:1:0) broadcast to leading shape."""
    x = jnp.zeros(shape + (N_LIMBS,), dtype=jnp.uint32)
    y = jnp.broadcast_to(F.ONE_MONT, shape + (N_LIMBS,))
    z = jnp.zeros(shape + (N_LIMBS,), dtype=jnp.uint32)
    return jnp.stack([x, y, z], axis=-2)


def padd(p, q):
    """Complete projective addition (RCB15 alg. 7, a=0).  p,q: [...,3,16]."""
    x1, y1, z1 = p[..., 0, :], p[..., 1, :], p[..., 2, :]
    x2, y2, z2 = q[..., 0, :], q[..., 1, :], q[..., 2, :]
    mul, add, sub = F.mont_mul, F.add, F.sub

    t0 = mul(x1, x2)
    t1 = mul(y1, y2)
    t2 = mul(z1, z2)
    t3 = mul(add(x1, y1), add(x2, y2))
    t3 = sub(t3, add(t0, t1))                     # X1Y2 + X2Y1
    t4 = mul(add(y1, z1), add(y2, z2))
    t4 = sub(t4, add(t1, t2))                     # Y1Z2 + Y2Z1
    x3 = mul(add(x1, z1), add(x2, z2))
    y3 = sub(x3, add(t0, t2))                     # X1Z2 + X2Z1
    t0 = add(add(t0, t0), t0)                     # 3*X1X2
    t2 = mul(_B3, t2)                             # b3*Z1Z2
    z3 = add(t1, t2)
    t1 = sub(t1, t2)                              # Y1Y2 - b3Z1Z2
    y3 = mul(_B3, y3)                             # b3*(X1Z2+X2Z1)
    x3 = sub(mul(t3, t1), mul(t4, y3))
    y3 = add(mul(t1, z3), mul(y3, t0))
    z3 = add(mul(z3, t4), mul(t0, t3))
    return jnp.stack([x3, y3, z3], axis=-2)


def pdbl(p):
    """Complete projective doubling (RCB15 alg. 9, a=0)."""
    x, y, z = p[..., 0, :], p[..., 1, :], p[..., 2, :]
    mul, add, sub = F.mont_mul, F.add, F.sub

    t0 = mul(y, y)
    z3 = add(t0, t0)
    z3 = add(z3, z3)
    z3 = add(z3, z3)                              # 8Y^2
    t1 = mul(y, z)
    t2 = mul(_B3, mul(z, z))                      # b3*Z^2
    x3 = mul(t2, z3)
    y3 = add(t0, t2)
    z3 = mul(t1, z3)
    t1 = add(t2, t2)
    t2 = add(t1, t2)                              # 3*b3*Z^2
    t0 = sub(t0, t2)
    y3 = add(x3, mul(t0, y3))
    t1 = mul(x, y)
    x3 = mul(t0, t1)
    x3 = add(x3, x3)
    return jnp.stack([x3, y3, z3], axis=-2)


def select_point(mask, p, q):
    """mask bool[...]: p where mask else q."""
    return jnp.where(mask[..., None, None], p, q)


def _tree_reduce(pts, unroll_levels: int = 4):
    """Sum points along axis 0: [n, 3, 16] -> [3, 16].  n power of two.

    First `unroll_levels` halving levels (covers the bulk of the work at
    full lane width), then a constant-shape butterfly rolled into a
    fori_loop so the graph holds O(1) padd instantiations.
    """
    n = pts.shape[0]
    levels = int(np.log2(n))
    for _ in range(min(unroll_levels, levels)):
        m = pts.shape[0]
        if m == 1:
            return pts[0]
        pts = padd(pts[: m // 2], pts[m // 2 :])
    m = pts.shape[0]
    if m == 1:
        return pts[0]
    rem = int(np.log2(m))

    def body(k, x):
        shift = 1 << k
        return padd(x, jnp.roll(x, -shift, axis=0))

    pts = jax.lax.fori_loop(0, rem, body, pts)
    return pts[0]


@partial(jax.jit, static_argnums=(2,))
def _msm_impl(points, bits, n_bits: int):
    """points: [n, 3, 16]; bits: [n_bits, n] uint32 (MSB first)."""
    inf1 = inf_point(points.shape[:1])

    def bit_step(acc, bit_row):
        acc = pdbl(acc)
        sel = select_point(bit_row == 1, points, inf1)
        t = _tree_reduce(sel)
        return padd(acc, t), None

    acc, _ = jax.lax.scan(bit_step, inf_point(), bits)
    return acc


def points_to_device(points):
    """Host affine int pairs (or None for identity) -> [n,3,16] mont limbs."""
    xs, ys, zs = [], [], []
    for pt in points:
        if pt is None:
            xs.append(0)
            ys.append(1)
            zs.append(0)
        else:
            xs.append(pt[0] % FQ)
            ys.append(pt[1] % FQ)
            zs.append(1)
    n = len(points)
    out = np.zeros((n, 3, N_LIMBS), dtype=np.uint32)
    out[:, 0] = F.to_mont(xs)
    out[:, 1] = F.to_mont(ys)
    out[:, 2] = F.to_mont(zs)
    return jnp.asarray(out)


def scalars_to_bits(scalars, n_bits: int = 254):
    """Host ints -> [n_bits, n] uint32, MSB first."""
    from ..field.bn254 import FR

    n = len(scalars)
    out = np.zeros((n_bits, n), dtype=np.uint32)
    for i, s in enumerate(scalars):
        s %= FR
        for b in range(n_bits):
            out[n_bits - 1 - b, i] = (s >> b) & 1
    return jnp.asarray(out)


def point_from_device(acc) -> tuple | None:
    """[3,16] mont limbs projective -> host affine int pair (or None)."""
    arr = np.asarray(acc)
    x, y, z = (
        F.from_mont_host(arr[0][None])[0],
        F.from_mont_host(arr[1][None])[0],
        F.from_mont_host(arr[2][None])[0],
    )
    if z == 0:
        return None
    zinv = pow(z, -1, FQ)
    return (x * zinv % FQ, y * zinv % FQ)


def _pad_pow2(points, scalars):
    n = len(points)
    m = 1 << max(1, (n - 1).bit_length())
    points = list(points) + [None] * (m - n)
    scalars = list(scalars) + [0] * (m - n)
    return points, scalars


def msm_g1_device(points, scalars, n_bits: int = 254):
    """Host-facing MSM: affine int points + int scalars -> affine int point.

    Drop-in replacement for groth16.prover.pippenger_g1 (same contract:
    None entries and zero scalars contribute the identity).
    """
    if not points:
        return None
    points, scalars = _pad_pow2(points, scalars)
    dev_pts = points_to_device(points)
    bits = scalars_to_bits(scalars, n_bits)
    acc = _msm_impl(dev_pts, bits, n_bits)
    return point_from_device(acc)
