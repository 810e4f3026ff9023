"""Batched G1/G2 curve arithmetic on XLA limb tensors (CPU fallback path).

  * G1 points are projective (X:Y:Z) limb tensors over FQ in Montgomery
    form, shape [..., 3, 16]; G2 points carry Fq2 coordinates (pairs of FQ
    limbs), shape [..., 3, 2, 16].  The identity is (0:1:0).
  * Point addition uses the COMPLETE formulas of Renes-Costello-Batina 2015
    (Algorithm 7/9 for a=0): branchless, no doubling/infinity edge cases —
    every lane executes the same instructions, which is exactly what the
    VPU wants.  The same formula code runs for both groups through a small
    field-ops shim (Fq2 multiply = Karatsuba over three FQ multiplies).

These XLA formulations are the off-TPU (interpret-mode) twins of the fused
Pallas point kernels in ops/point_kernels.py — the production MSM is the
sort/prefix-scan Pippenger in ops/msm_pallas.py.  The round-1 bit-serial
device MSM that used to live here is gone (superseded; it only added
~250x-slower dead code and LLVM compile pressure to the CPU test suite).

Bit-exact vs the pure-Python Jacobian engines (field/curve.py,
groth16/prover.py), pinned by tests/test_ops_curve.py.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..field.bn254 import FQ
from ..field.limbs import FQ_FIELD, N_LIMBS, ints_to_limbs
from ..field.curve import TWIST_B

F = FQ_FIELD


class _G1Coords:
    """FQ coordinate arithmetic on [..., 16] tensors."""

    ndim = 1  # trailing dims per coordinate

    def __init__(self):
        self.b3 = ints_to_limbs([9 * F.mont_r % FQ])[0]
        self.one = F.ONE_MONT

    mul = staticmethod(lambda a, b: F.mont_mul(a, b))
    add = staticmethod(lambda a, b: F.add(a, b))
    sub = staticmethod(lambda a, b: F.sub(a, b))


class _G2Coords:
    """Fq2 coordinate arithmetic on [..., 2, 16] tensors (c0 + c1*u)."""

    ndim = 2

    def __init__(self):
        b3 = TWIST_B * 3
        self.b3 = np.stack([F.to_mont([b3.coeffs[0]])[0], F.to_mont([b3.coeffs[1]])[0]])
        self.one = np.stack([F.to_mont([1])[0], F.to_mont([0])[0]])

    @staticmethod
    def add(a, b):
        return F.add(a, b)

    @staticmethod
    def sub(a, b):
        return F.sub(a, b)

    @staticmethod
    def mul(a, b):
        # Karatsuba over u^2 = -1: 3 FQ multiplies, batched into ONE
        # Montgomery multiply call (lane axis 0).
        a0, a1 = a[..., 0, :], a[..., 1, :]
        b0, b1 = b[..., 0, :], b[..., 1, :]
        sums = F.add(jnp.stack([a0, b0]), jnp.stack([a1, b1]))
        prods = F.mont_mul(
            jnp.stack([a0, a1, sums[0]]), jnp.stack([b0, b1, sums[1]])
        )
        t0, t1, t2 = prods[0], prods[1], prods[2]
        diffs = F.sub(jnp.stack([t0, t2]), jnp.stack([t1, F.add(t0, t1)]))
        return jnp.stack([diffs[0], diffs[1]], axis=-2)


G1 = _G1Coords()
G2 = _G2Coords()


def _padd_generic(p, q, C):
    """Complete projective addition (RCB15 alg. 7, a=0) on coord triples.

    Stage-batched: the formula's 12 multiplies group into three dependency
    stages; each stage stacks its independent multiplies into ONE batched
    Montgomery multiply (lane axis 0).  Same field ops, ~4x smaller jitted
    graph and far fewer kernel dispatches than the naive transliteration.
    """
    x1, y1, z1 = p
    x2, y2, z2 = q
    mul, add, sub = C.mul, C.add, C.sub
    st = lambda *xs: jnp.stack(xs, axis=0)

    l1 = add(st(x1, y1, x1), st(y1, z1, z1))      # x1+y1, y1+z1, x1+z1
    l2 = add(st(x2, y2, x2), st(y2, z2, z2))
    m1 = mul(st(x1, y1, z1, l1[0], l1[1], l1[2]),
             st(x2, y2, z2, l2[0], l2[1], l2[2]))
    t0, t1, t2, p3, p4, p5 = (m1[i] for i in range(6))
    a2 = add(st(t0, t1, t0, t0), st(t1, t2, t2, t0))
    s1 = sub(st(p3, p4, p5), st(a2[0], a2[1], a2[2]))
    t3, t4, y3 = s1[0], s1[1], s1[2]              # X1Y2+X2Y1, Y1Z2+Y2Z1, X1Z2+X2Z1
    t00 = add(a2[3], t0)                          # 3*X1X2
    bb = jnp.broadcast_to(C.b3, t2.shape)
    m2 = mul(st(bb, bb), st(t2, y3))
    t2b, y3b = m2[0], m2[1]                       # b3*Z1Z2, b3*(X1Z2+X2Z1)
    z3a = add(t1, t2b)                            # Y1Y2 + b3Z1Z2
    t1b = sub(t1, t2b)                            # Y1Y2 - b3Z1Z2
    m3 = mul(st(t3, t4, t1b, y3b, z3a, t00),
             st(t1b, y3b, z3a, t00, t4, t3))
    x3 = sub(m3[0], m3[1])
    y3f = add(m3[2], m3[3])
    z3f = add(m3[4], m3[5])
    return x3, y3f, z3f


def _pdbl_generic(p, C):
    """Complete projective doubling (RCB15 alg. 9, a=0), stage-batched."""
    x, y, z = p
    mul, add, sub = C.mul, C.add, C.sub
    st = lambda *xs: jnp.stack(xs, axis=0)

    m1 = mul(st(y, y, z, x), st(y, z, z, y))
    t0, t1, zz, xy = m1[0], m1[1], m1[2], m1[3]
    z3 = add(t0, t0)
    z3 = add(z3, z3)
    z3 = add(z3, z3)                              # 8Y^2
    bb = jnp.broadcast_to(C.b3, zz.shape)
    t2 = mul(bb, zz)                              # b3*Z^2
    y3 = add(t0, t2)
    t1s = add(t2, t2)
    t2s = add(t1s, t2)                            # 3*b3*Z^2
    t0s = sub(t0, t2s)
    m2 = mul(st(t2, t1, t0s, t0s), st(z3, z3, y3, xy))
    x3a, z3f, y3a, x3h = m2[0], m2[1], m2[2], m2[3]
    y3f = add(x3a, y3a)
    x3f = add(x3h, x3h)
    return x3f, y3f, z3f


def _coords(pts, C):
    """Stacked [..., 3, *coord] -> (x, y, z)."""
    axis = -1 - C.ndim
    return tuple(jnp.moveaxis(pts, axis, 0)[i] for i in range(3))


def _stack(xyz, C):
    axis = -1 - C.ndim
    return jnp.stack(xyz, axis=axis)


def padd(p, q, C=G1):
    return _stack(_padd_generic(_coords(p, C), _coords(q, C), C), C)


def pdbl(p, C=G1):
    return _stack(_pdbl_generic(_coords(p, C), C), C)


def inf_point(shape=(), C=G1):
    """Identity (0:1:0) broadcast to leading shape."""
    coord = (N_LIMBS,) if C.ndim == 1 else (2, N_LIMBS)
    x = jnp.zeros(shape + coord, dtype=jnp.uint32)
    y = jnp.broadcast_to(C.one, shape + coord)
    z = jnp.zeros(shape + coord, dtype=jnp.uint32)
    return _stack((x, y, z), C)


def select_point(mask, p, q, C=G1):
    """mask bool[...]: p where mask else q."""
    m = mask.reshape(mask.shape + (1,) * (1 + C.ndim))
    return jnp.where(m, p, q)


# -- host converters --------------------------------------------------------

def points_to_device(points):
    """Host affine int pairs (or None for identity) -> [n,3,16] mont limbs."""
    n = len(points)
    out = np.zeros((n, 3, N_LIMBS), dtype=np.uint32)
    xs = [0 if p is None else p[0] % FQ for p in points]
    ys = [1 if p is None else p[1] % FQ for p in points]
    zs = [0 if p is None else 1 for p in points]
    out[:, 0] = F.to_mont(xs)
    out[:, 1] = F.to_mont(ys)
    out[:, 2] = F.to_mont(zs)
    return jnp.asarray(out)


def g2_points_to_device(points):
    """Host affine Fq2 pairs ((x0,x1),(y0,y1)) or None -> [n,3,2,16]."""
    n = len(points)
    out = np.zeros((n, 3, 2, N_LIMBS), dtype=np.uint32)

    def coeffs(p, idx, default):
        if p is None:
            return default
        c = p[idx].coeffs if hasattr(p[idx], "coeffs") else p[idx]
        return (c[0] % FQ, c[1] % FQ)

    xs = [coeffs(p, 0, (0, 0)) for p in points]
    ys = [coeffs(p, 1, (1, 0)) for p in points]
    zs = [(0, 0) if p is None else (1, 0) for p in points]
    for c in range(2):
        out[:, 0, c] = F.to_mont([x[c] for x in xs])
        out[:, 1, c] = F.to_mont([y[c] for y in ys])
        out[:, 2, c] = F.to_mont([z[c] for z in zs])
    return jnp.asarray(out)


def point_from_device(acc):
    """[3,16] mont limbs projective -> host affine int pair (or None)."""
    arr = np.asarray(acc)
    x, y, z = (F.from_mont_host(arr[i][None])[0] for i in range(3))
    if z == 0:
        return None
    zinv = pow(z, -1, FQ)
    return (x * zinv % FQ, y * zinv % FQ)


def g2_point_from_device(acc):
    """[3,2,16] mont limbs -> host affine (FQ2, FQ2) pair (or None)."""
    from ..field.tower import FQ2

    arr = np.asarray(acc)
    c = [[F.from_mont_host(arr[i, j][None])[0] for j in range(2)] for i in range(3)]
    x, y, z = (FQ2(cc) for cc in c)
    if z.is_zero():
        return None
    zi = z.inv()
    return (x * zi, y * zi)


