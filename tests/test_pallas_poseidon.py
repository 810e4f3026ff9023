"""Fused Pallas Poseidon kernels (ops/poseidon_pallas.py).

The kernels only compile on real TPU hardware (interpret mode would take
tens of minutes for the 65-round scan), so the bit-exactness tests are
gated on the backend; run with ZKFL_TEST_TPU=1 on a chip.  The constant
/ bound machinery is testable everywhere.
"""

import jax
import numpy as np
import pytest

from zkfl_tpu.field.bn254 import FR
from zkfl_tpu.field.limbs import FR_FIELD, R
from zkfl_tpu.ops.poseidon_pallas import _n_subs

on_tpu = jax.default_backend() == "tpu"


def test_reduction_sub_counts():
    # u < (t*p/R + 1)*p after one Montgomery reduction of a t-term sum;
    # the kernel must emit enough conditional subtractions to reach < p.
    for t in range(1, 18):
        bound_num = t * FR * FR + R * FR  # u_bound = bound_num / (R*p) * p
        n = _n_subs(t)
        # after n subtractions the bound is u_bound - n*p, must be <= p
        assert bound_num - n * (R * FR) <= R * FR
        assert n >= 1
    assert _n_subs(3) == 1
    assert _n_subs(17) == 4


@pytest.mark.skipif(not on_tpu, reason="Pallas Poseidon compiles on TPU only")
@pytest.mark.parametrize("t", [2, 3, 6, 17])
def test_pallas_permutation_bit_exact(t):
    from zkfl_tpu.ops.poseidon_pallas import permute_batch
    from zkfl_tpu.poseidon.reference import poseidon_permutation

    rng = np.random.RandomState(42 + t)
    b = 3
    vals = [int.from_bytes(rng.bytes(31), "little") % FR for _ in range(b * t)]
    st = np.asarray(FR_FIELD.to_mont(vals).reshape(b, t, 16))
    out = np.asarray(permute_batch(st))
    got = FR_FIELD.from_mont_host(out.reshape(b * t, 16))
    for i in range(b):
        assert got[i * t : (i + 1) * t] == list(
            poseidon_permutation(vals[i * t : (i + 1) * t])
        )
