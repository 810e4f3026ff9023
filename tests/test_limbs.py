"""Limb-tensor field arithmetic vs the pure-Python oracle.

Pins the TPU path (zkfl_tpu/field/limbs.py) bit-exact against plain int
modular arithmetic, the role ffjavascript plays for the reference stack
(package.json:44).
"""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from zkfl_tpu.field.bn254 import FQ, FR
from zkfl_tpu.field.limbs import (
    FQ_FIELD,
    FR_FIELD,
    N_LIMBS,
    int_to_limbs,
    ints_to_limbs,
    limbs_to_ints,
)

rng = random.Random(42)


def rand_elems(n, p):
    # Mix of structured edge cases and uniform randoms.
    edge = [0, 1, 2, p - 1, p - 2, (p - 1) // 2, 1 << 255 % p]
    out = [e % p for e in edge[: min(n, len(edge))]]
    while len(out) < n:
        out.append(rng.randrange(p))
    return out


@pytest.mark.parametrize("field,p", [(FR_FIELD, FR), (FQ_FIELD, FQ)])
class TestLimbField:
    def test_roundtrip(self, field, p):
        xs = rand_elems(32, p)
        assert limbs_to_ints(ints_to_limbs(xs)) == xs
        m = field.to_mont(xs)
        assert field.from_mont_host(m) == xs

    def test_add_sub_neg(self, field, p):
        xs = rand_elems(64, p)
        ys = rand_elems(64, p)
        a = jnp.asarray(field.to_limbs(xs))
        b = jnp.asarray(field.to_limbs(ys))
        got_add = field.from_limbs(np.asarray(field.add(a, b)))
        got_sub = field.from_limbs(np.asarray(field.sub(a, b)))
        got_neg = field.from_limbs(np.asarray(field.neg(a)))
        assert got_add == [(x + y) % p for x, y in zip(xs, ys)]
        assert got_sub == [(x - y) % p for x, y in zip(xs, ys)]
        assert got_neg == [(-x) % p for x in xs]

    def test_mont_mul(self, field, p):
        xs = rand_elems(64, p)
        ys = rand_elems(64, p)
        a = jnp.asarray(field.to_mont(xs))
        b = jnp.asarray(field.to_mont(ys))
        got = field.from_mont_host(np.asarray(field.mont_mul(a, b)))
        assert got == [x * y % p for x, y in zip(xs, ys)]

    def test_mont_conversion_device(self, field, p):
        xs = rand_elems(32, p)
        std = jnp.asarray(field.to_limbs(xs))
        m = field.to_mont_device(std)
        assert field.from_mont_host(np.asarray(m)) == xs
        back = field.from_mont_device(m)
        assert field.from_limbs(np.asarray(back)) == xs

    def test_pow_and_inv(self, field, p):
        xs = [x for x in rand_elems(16, p) if x]
        a = jnp.asarray(field.to_mont(xs))
        sq = field.from_mont_host(np.asarray(field.mont_pow(a, 5)))
        assert sq == [pow(x, 5, p) for x in xs]
        inv = field.from_mont_host(np.asarray(field.inv(a)))
        assert inv == [pow(x, -1, p) for x in xs]

    def test_broadcasting(self, field, p):
        xs = rand_elems(12, p)
        a = jnp.asarray(field.to_mont(xs)).reshape(3, 4, N_LIMBS)
        one = jnp.asarray(int_to_limbs(field.mont_r))
        out = field.mont_mul(a, one[None, None, :])
        assert out.shape == (3, 4, N_LIMBS)
        assert field.from_mont_host(np.asarray(out)) == xs
