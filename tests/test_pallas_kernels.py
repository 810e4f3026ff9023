"""Pallas limb/point kernel correctness vs the pure-Python oracles.

Runs in interpret mode on the CPU test backend; sizes are tiny because the
semantics are shape-independent (bench.py exercises real sizes on TPU).
"""

import numpy as np
import pytest

from zkfl_tpu.field.bn254 import FQ, FR
from zkfl_tpu.field.curve import (
    G1_GEN,
    g1_add,
    g1_mul,
    g2_add,
    g2_generator,
    g2_mul,
    g1_neg,
)
from zkfl_tpu.ops import point_kernels as pk
from zkfl_tpu.ops.limb_kernels import FQK, FRK

rng = np.random.RandomState(7)


def _rand_fq(n):
    return [int.from_bytes(rng.bytes(32), "little") % FQ for _ in range(n)]


def _rand_fr(n):
    return [int.from_bytes(rng.bytes(32), "little") % FR for _ in range(n)]


class TestFieldKernels:
    def test_mont_mul(self):
        a = _rand_fq(9) + [0, 1, FQ - 1]
        b = _rand_fq(9) + [FQ - 1, 0, FQ - 1]
        out = FQK.unpack(FQK.mont_mul(FQK.pack(a), FQK.pack(b)))
        assert out == [x * y % FQ for x, y in zip(a, b)]

    def test_add_sub(self):
        a, b = _rand_fr(8), _rand_fr(8)
        a[0], b[0] = 0, 0
        a[1], b[1] = FR - 1, FR - 1
        assert FRK.unpack(FRK.add(FRK.pack(a), FRK.pack(b))) == [
            (x + y) % FR for x, y in zip(a, b)
        ]
        assert FRK.unpack(FRK.sub(FRK.pack(a), FRK.pack(b))) == [
            (x - y) % FR for x, y in zip(a, b)
        ]

    def test_mont_form_roundtrip(self):
        a = _rand_fr(5)
        std = FRK.pack(a, mont=False)
        assert FRK.unpack(FRK.to_mont(std)) == a
        assert FRK.unpack(FRK.from_mont(FRK.pack(a)), mont=False) == a

    def test_butterfly(self):
        u, v, tw = _rand_fr(4), _rand_fr(4), _rand_fr(4)
        hi, lo = FRK.butterfly(FRK.pack(u), FRK.pack(v), FRK.pack(tw))
        want_hi = [(x + y * t) % FR for x, y, t in zip(u, v, tw)]
        want_lo = [(x - y * t) % FR for x, y, t in zip(u, v, tw)]
        assert FRK.unpack(hi) == want_hi
        assert FRK.unpack(lo) == want_lo

    def test_mul_sub_mul_const(self):
        a, b, c = _rand_fr(4), _rand_fr(4), _rand_fr(4)
        k = 12345
        out = FRK.mul_sub_mul_const(
            FRK.pack(a), FRK.pack(b), FRK.pack(c), k * FRK.mont_r % FR
        )
        assert FRK.unpack(out) == [
            (x * y - z) * k % FR for x, y, z in zip(a, b, c)
        ]

    def test_normalize_raw(self):
        # raw column sums of Montgomery terms, entries up to ~2^30
        vals = _rand_fr(6)
        packed = np.asarray(FRK.pack(vals)).astype(np.uint64)
        raw = (packed * 3 + 12_000).astype(np.uint32)  # still < 2^31
        out = FRK.unpack(FRK.normalize_raw(raw))
        want = []
        for j, v in enumerate(vals):
            lifted = sum(
                int(raw[i, j]) << (16 * i) for i in range(16)
            )
            r_inv = pow(FRK.mont_r, -1, FR)
            want.append(lifted * r_inv % FR)
        assert out == want


class TestPointKernels:
    def setup_method(self):
        self.pts = [g1_mul(G1_GEN, 3 + 5 * i) for i in range(6)]

    def test_padd_including_edge_cases(self):
        p_host = [self.pts[0], None, self.pts[1], self.pts[2], self.pts[3], G1_GEN]
        q_host = [self.pts[1], self.pts[2], None, self.pts[2], g1_neg(self.pts[3]), None]
        out = pk.padd(pk.g1_to_device(p_host), pk.g1_to_device(q_host))
        got = [pk.g1_from_device(np.asarray(out)[:, :, i]) for i in range(6)]
        want = [g1_add(p, q) for p, q in zip(p_host, q_host)]
        assert got == want  # incl. P+inf, inf+Q, P+P (doubling), P+(-P)

    def test_pdbl(self):
        out = pk.pdbl(pk.g1_to_device(self.pts))
        got = [pk.g1_from_device(np.asarray(out)[:, :, i]) for i in range(6)]
        assert got == [g1_add(p, p) for p in self.pts]

    def test_g2_padd_pdbl(self):
        g2g = g2_generator()
        p2 = [g2_mul(g2g, 2 + i) for i in range(4)]
        q2 = [g2_mul(g2g, 9 + i) for i in range(4)]
        p2[1] = None
        q2[2] = None
        out = pk.padd_g2(pk.g2_to_device(p2), pk.g2_to_device(q2))
        got = [pk.g2_from_device(np.asarray(out)[:, :, :, i]) for i in range(4)]
        assert got == [g2_add(p, q) for p, q in zip(p2, q2)]
        out2 = pk.pdbl_g2(pk.g2_to_device(p2))
        got2 = [pk.g2_from_device(np.asarray(out2)[:, :, :, i]) for i in range(4)]
        assert got2 == [g2_add(p, p) for p in p2]


class TestMsmPallas:
    def test_msm_g1_vs_host_pippenger(self):
        from zkfl_tpu.groth16.prover import pippenger_g1
        from zkfl_tpu.ops.msm_pallas import msm_g1_host

        pts = [g1_mul(G1_GEN, 2 + i) for i in range(40)]
        pts[5] = None
        scalars = _rand_fr(40)
        scalars[0] = 0
        scalars[1] = 1
        scalars[2] = FR - 1
        assert msm_g1_host(pts, scalars) == pippenger_g1(pts, scalars)

    def test_msm_g2_vs_host(self):
        from zkfl_tpu.groth16.prover import msm_g2
        from zkfl_tpu.ops.msm_pallas import msm_g2_host

        g2g = g2_generator()
        pts = [g2_mul(g2g, 2 + i) for i in range(10)]
        pts[3] = None
        scalars = _rand_fr(10)
        scalars[0] = 0
        assert msm_g2_host(pts, scalars) == msm_g2(pts, scalars)


class TestQapPallas:
    def test_ntt_roundtrip_vs_oracle(self):
        import jax.numpy as jnp

        from zkfl_tpu.groth16.qap import ntt
        from zkfl_tpu.ops.qap_pallas import ntt_lm

        vals = _rand_fr(16)
        x = jnp.asarray(FRK.pack(vals)).reshape(16, 1, 16)
        fwd = FRK.unpack(np.asarray(ntt_lm(x))[:, 0, :])
        assert fwd == ntt(vals)
        inv = FRK.unpack(np.asarray(ntt_lm(x, inverse=True))[:, 0, :])
        assert inv == ntt(vals, inverse=True)

    def test_compute_h_vs_oracle(self):
        import jax.numpy as jnp

        from zkfl_tpu.groth16.qap import compute_h_coeffs
        from zkfl_tpu.ops.qap_pallas import compute_h_lm

        n = 8
        # legitimate QAP evals: c = a*b on the domain => h is the honest
        # quotient; also exercise the generic path with random c
        a, b = _rand_fr(n), _rand_fr(n)
        c = [x * y % FR for x, y in zip(a, b)]
        evals = jnp.asarray(
            np.stack([FRK.pack(a), FRK.pack(b), FRK.pack(c)], axis=1)
        )[:, None, :, :]  # [16, B=1, 3, n]
        got = FRK.unpack(np.asarray(compute_h_lm(evals))[:, 0, :], mont=False)
        assert got == compute_h_coeffs(a, b, c)

    def test_matrix_evals_vs_oracle(self):
        import jax.numpy as jnp

        from zkfl_tpu.groth16.qap import matrix_evals
        from zkfl_tpu.ops.qap_pallas import DeviceMatrices, matrix_evals_lm

        # tiny R1CS: 3 constraints, 4 wires, dict-form {wire: coeff}
        rng = np.random.RandomState(7)
        constraints = []
        for _ in range(3):
            abc = []
            for _ in range(3):
                terms = {
                    int(rng.randint(0, 4)): int(rng.randint(1, 1000))
                    for _ in range(2)
                }
                abc.append(terms)
            constraints.append(tuple(abc))
        witness = _rand_fr(4)
        domain = 4
        dm = DeviceMatrices(constraints, domain)
        w = jnp.asarray(FRK.pack(witness))[:, None, :]
        evals = np.asarray(
            matrix_evals_lm(dm.rows, dm.cols, dm.coeffs, w, domain)
        )
        want = matrix_evals(constraints, witness, domain)
        for i in range(3):
            assert FRK.unpack(evals[:, 0, i, :]) == want[i]
