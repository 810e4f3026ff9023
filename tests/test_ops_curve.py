"""Batched G1 curve ops vs the pure-Python Jacobian engine.

The complete-formula (RCB15) projective path must agree with field/curve.py
(itself pinned to the BN254 group law) on every edge case a branchless SIMD
formulation must absorb: doubling, inverses, identity.  (The production
MSM lives in ops/msm_pallas.py, covered by tests/test_pallas_kernels.py.)
"""

import random

from zkfl_tpu.field.curve import g1_add, g1_generator, g1_mul, g1_neg
from zkfl_tpu.ops.curve import (
    inf_point,
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
