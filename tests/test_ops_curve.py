"""Batched G1 curve ops + device MSM vs the pure-Python Jacobian engine.

The complete-formula (RCB15) projective path must agree with field/curve.py
(itself pinned to the BN254 group law) on every edge case a branchless SIMD
formulation must absorb: doubling, inverses, identity, zero scalars.
"""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from zkfl_tpu.field.bn254 import FR
from zkfl_tpu.field.curve import g1_add, g1_generator, g1_mul, g1_neg
from zkfl_tpu.groth16.prover import pippenger_g1
from zkfl_tpu.ops.curve import (
    inf_point,
    msm_g1_device,
    padd,
    pdbl,
    point_from_device,
    points_to_device,
)

rng = random.Random(11)
G = g1_generator()


def rand_points(n):
    return [g1_mul(G, rng.randrange(1, 10**9)) for _ in range(n)]


def test_padd_matches_group_law():
    ps = rand_points(4)
    qs = rand_points(4)
    dev = padd(points_to_device(ps), points_to_device(qs))
    for i in range(4):
        assert point_from_device(dev[i]) == g1_add(ps[i], qs[i])


def test_padd_edge_cases():
    p = rand_points(1)[0]
    cases = [
        (p, p, g1_mul(p, 2)),       # doubling through the add formula
        (p, g1_neg(p), None),       # P + (-P) = identity
        (p, None, p),               # P + O = P
        (None, None, None),         # O + O = O
    ]
    dev_p = points_to_device([c[0] for c in cases])
    dev_q = points_to_device([c[1] for c in cases])
    out = padd(dev_p, dev_q)
    for i, (_, _, want) in enumerate(cases):
        assert point_from_device(out[i]) == want, f"case {i}"


def test_pdbl_matches():
    ps = rand_points(3) + [None]
    out = pdbl(points_to_device(ps))
    for i, p in enumerate(ps):
        want = g1_mul(p, 2) if p is not None else None
        assert point_from_device(out[i]) == want


def test_inf_point_roundtrip():
    assert point_from_device(inf_point()) is None


def test_msm_matches_pippenger():
    pts = rand_points(7) + [None]
    scs = [rng.randrange(FR) for _ in range(6)] + [0, 5]
    assert msm_g1_device(pts, scs) == pippenger_g1(pts, scs)


def test_msm_all_zero_scalars():
    pts = rand_points(4)
    assert msm_g1_device(pts, [0, 0, 0, 0]) is None


def test_msm_single_point():
    p = rand_points(1)[0]
    k = rng.randrange(FR)
    assert msm_g1_device([p], [k]) == g1_mul(p, k)


def test_msm_g2_matches_host():
    from zkfl_tpu.field.curve import g2_generator, g2_mul, g2_msm
    from zkfl_tpu.ops.curve import msm_g2_device

    g2 = g2_generator()
    pts = [g2_mul(g2, rng.randrange(1, 10**6)) for _ in range(3)] + [None]
    scs = [rng.randrange(FR) for _ in range(3)] + [7]
    got = msm_g2_device(pts, scs)
    want = g2_msm(pts, scs)
    assert got == want
