"""Field, curve and pairing unit tests (pure-Python reference layer)."""

import random

import pytest

from zkfl_tpu.field.bn254 import (
    FQ,
    FR,
    FR_ROOT_OF_UNITY,
    FR_TWO_ADICITY,
    domain_size_for,
    fr_batch_inv,
    fr_inv,
    fr_nth_root,
)
from zkfl_tpu.field.curve import (
    g1_add,
    g1_generator,
    g1_is_on_curve,
    g1_msm,
    g1_mul,
    g1_neg,
    g2_add,
    g2_generator,
    g2_is_on_curve,
    g2_mul,
)
from zkfl_tpu.field.pairing import pairing, pairing_check
from zkfl_tpu.field.tower import FQ2, FQ12

rng = random.Random(1234)


def test_moduli_are_prime_sized():
    assert FR.bit_length() == 254
    assert FQ.bit_length() == 254
    assert pow(5, FR - 1, FR) == 1  # Fermat sanity
    assert pow(5, FQ - 1, FQ) == 1


def test_fr_inverse():
    for _ in range(10):
        x = rng.randrange(1, FR)
        assert x * fr_inv(x) % FR == 1


def test_fr_batch_inverse():
    xs = [rng.randrange(1, FR) for _ in range(17)]
    invs = fr_batch_inv(xs)
    for x, ix in zip(xs, invs):
        assert x * ix % FR == 1


def test_roots_of_unity():
    assert pow(FR_ROOT_OF_UNITY, 1 << FR_TWO_ADICITY, FR) == 1
    assert pow(FR_ROOT_OF_UNITY, 1 << (FR_TWO_ADICITY - 1), FR) != 1
    w8 = fr_nth_root(8)
    assert pow(w8, 8, FR) == 1 and pow(w8, 4, FR) != 1
    assert domain_size_for(5) == 8
    assert domain_size_for(8) == 8


def test_g1_group_law():
    G = g1_generator()
    assert g1_is_on_curve(G)
    assert g1_mul(G, FR) is None
    a, b = rng.randrange(FR), rng.randrange(FR)
    assert g1_add(g1_mul(G, a), g1_mul(G, b)) == g1_mul(G, (a + b) % FR)
    assert g1_add(g1_mul(G, a), g1_neg(g1_mul(G, a))) is None


def test_g1_msm_matches_sum():
    G = g1_generator()
    pts = [g1_mul(G, rng.randrange(1, 1000)) for _ in range(5)]
    scalars = [rng.randrange(FR) for _ in range(5)]
    expected = None
    for p, s in zip(pts, scalars):
        expected = g1_add(expected, g1_mul(p, s)) if expected else g1_mul(p, s)
    assert g1_msm(pts, scalars) == expected


def test_g2_group_law():
    G = g2_generator()
    assert g2_is_on_curve(G)
    assert g2_mul(G, FR) is None
    a = rng.randrange(FR)
    assert g2_add(g2_mul(G, a), g2_mul(G, a)) == g2_mul(G, 2 * a % FR)


def test_fq2_arithmetic():
    x = FQ2([3, 7])
    assert x * x.inv() == FQ2.one()
    # u^2 == -1
    u = FQ2([0, 1])
    assert u * u == FQ2([-1, 0])


def test_fq12_frobenius_and_conjugate():
    x = FQ12([rng.randrange(FQ) for _ in range(12)])
    assert x.conjugate() == x ** (FQ**6)
    assert x * x.inv() == FQ12.one()


@pytest.mark.slow
def test_pairing_bilinearity():
    G1, G2 = g1_generator(), g2_generator()
    e = pairing(G1, G2)
    assert e != FQ12.one()
    assert pairing(g1_mul(G1, 3), G2) == e**3
    assert pairing(G1, g2_mul(G2, 5)) == e**5


def test_pairing_product_check():
    G1, G2 = g1_generator(), g2_generator()
    a, b = 99991, 31337
    assert pairing_check(
        [(g1_mul(G1, a), g2_mul(G2, b)), (g1_neg(g1_mul(G1, a * b)), G2)]
    )
    assert not pairing_check(
        [(g1_mul(G1, a), g2_mul(G2, b)), (g1_neg(g1_mul(G1, a * b + 1)), G2)]
    )
