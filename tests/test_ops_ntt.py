"""Device NTT / QAP pipeline vs the pure-Python qap.py oracle."""

import random

import jax.numpy as jnp
import numpy as np

from zkfl_tpu.field.bn254 import FR
from zkfl_tpu.field.limbs import FR_FIELD, N_LIMBS
from zkfl_tpu.groth16.qap import compute_h_coeffs, matrix_evals, ntt
from zkfl_tpu.ops.ntt import (
    SparseMatrices,
    compute_h_coeffs_device,
    matrix_evals_device,
    ntt_device,
)

rng = random.Random(5)
F = FR_FIELD


def to_dev(xs):
    return jnp.asarray(F.to_mont(xs).reshape(1, len(xs), N_LIMBS))


def from_dev(x):
    return F.from_mont_host(np.asarray(x))


def test_ntt_forward_inverse():
    n = 32
    xs = [rng.randrange(FR) for _ in range(n)]
    fwd = from_dev(ntt_device(to_dev(xs)))
    assert fwd == ntt(xs)
    inv = from_dev(ntt_device(to_dev(fwd), inverse=True))
    assert inv == xs


def test_ntt_batched():
    n = 16
    rows = [[rng.randrange(FR) for _ in range(n)] for _ in range(3)]
    flat = [v for row in rows for v in row]
    dev = jnp.asarray(F.to_mont(flat).reshape(3, n, N_LIMBS))
    out = ntt_device(dev)
    got = F.from_mont_host(np.asarray(out))
    want = [v for row in rows for v in ntt(row)]
    assert got == want


def test_h_coeffs_matches_host():
    n = 16
    a = [rng.randrange(FR) for _ in range(n)]
    b = [rng.randrange(FR) for _ in range(n)]
    # Choose c = a*b pointwise so the quotient is an honest polynomial
    # (mirrors a satisfied R1CS); also test a random (unsatisfied) c.
    c_sat = [x * y % FR for x, y in zip(a, b)]
    for c in (c_sat, [rng.randrange(FR) for _ in range(n)]):
        assert compute_h_coeffs_device(a, b, c) == compute_h_coeffs(a, b, c)


def test_sparse_matvec():
    # Random sparse system: 12 constraints, 20 wires, domain 16.
    n_wires, n_cons, domain = 20, 12, 16
    witness = [rng.randrange(FR) for _ in range(n_wires)]
    constraints = []
    for _ in range(n_cons):
        mk = lambda: {
            rng.randrange(n_wires): rng.randrange(FR)
            for _ in range(rng.randrange(1, 6))
        }
        constraints.append((mk(), mk(), mk()))
    sm = SparseMatrices(constraints, domain)
    got = matrix_evals_device(sm, witness)
    want = matrix_evals(constraints, witness, domain)
    assert got == tuple(want) or list(got) == list(want)
