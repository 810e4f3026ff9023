"""Groth16 setup/prove/verify on micro circuits (pure-Python engine)."""

import json

import pytest

from zkfl_tpu.field.bn254 import FR
from zkfl_tpu.field.curve import g1_generator, g1_msm, g1_mul
from zkfl_tpu.groth16.prover import groth16_prove, msm_g2, pippenger_g1
from zkfl_tpu.groth16.qap import compute_h_coeffs, matrix_evals, ntt
from zkfl_tpu.groth16.serialize import (
    proof_from_json,
    proof_to_json,
    public_to_json,
    vkey_from_json,
    vkey_to_json,
)
from zkfl_tpu.groth16.setup import groth16_setup
from zkfl_tpu.groth16.verifier import groth16_verify
from zkfl_tpu.r1cs.balance import BalanceParams
from zkfl_tpu.r1cs.circuits import build_structure, generate_witness
from zkfl_tpu.r1cs.secagg import SecaggParams

from test_r1cs import _micro_balance_inputs, _micro_secagg_inputs


def test_ntt_roundtrip():
    import random

    rng = random.Random(7)
    a = [rng.randrange(FR) for _ in range(16)]
    assert ntt(ntt(a), inverse=True) == a


def test_ntt_is_polynomial_evaluation():
    from zkfl_tpu.field.bn254 import fr_nth_root

    coeffs = [5, 7, 11, 13]
    w = fr_nth_root(4)
    evals = ntt(coeffs)
    for k in range(4):
        x = pow(w, k, FR)
        expected = sum(c * pow(x, i, FR) for i, c in enumerate(coeffs)) % FR
        assert evals[k] == expected


def test_pippenger_matches_naive():
    import random

    rng = random.Random(3)
    G = g1_generator()
    pts = [g1_mul(G, rng.randrange(1, 10**6)) for _ in range(30)]
    scalars = [rng.randrange(FR) for _ in range(30)]
    assert pippenger_g1(pts, scalars) == g1_msm(pts, scalars)


@pytest.fixture(scope="module")
def balance_setup():
    p = BalanceParams(n=2, depth=1, model_dim=2)
    cs = build_structure(p)
    pk, vk = groth16_setup(cs, seed="test-seed")
    return p, cs, pk, vk


@pytest.mark.slow
def test_groth16_roundtrip_balance(balance_setup):
    p, cs, pk, vk = balance_setup
    inp = _micro_balance_inputs(p)
    wit = generate_witness(p, inp)
    proof = groth16_prove(pk, cs, wit.witness)
    assert groth16_verify(vk, proof)

    # soundness: tampered public signals rejected
    bad = list(proof.public_signals)
    bad[3], bad[4] = (bad[3] + 1) % FR, (bad[4] - 1) % FR
    assert not groth16_verify(vk, proof, bad)

    # soundness: unsatisfied witness yields a rejected proof
    inp_bad = dict(inp)
    inp_bad["labels"] = [1 - l for l in inp["labels"]]
    wit_bad = generate_witness(p, inp_bad)
    assert not groth16_verify(vk, groth16_prove(pk, cs, wit_bad.witness))


def test_groth16_snarkjs_schema_roundtrip(balance_setup):
    p, cs, pk, vk = balance_setup
    wit = generate_witness(p, _micro_balance_inputs(p))
    proof = groth16_prove(pk, cs, wit.witness)

    pj = proof_to_json(proof)
    assert pj["protocol"] == "groth16" and pj["curve"] == "bn128"
    assert all(isinstance(c, str) for c in pj["pi_a"])
    publics = public_to_json(proof.public_signals)

    vk2 = vkey_from_json(json.loads(json.dumps(vkey_to_json(vk))))
    proof2 = proof_from_json(json.loads(json.dumps(pj)), publics)
    assert groth16_verify(vk2, proof2)


@pytest.mark.slow
def test_groth16_roundtrip_secagg():
    p = SecaggParams(dim=2, num_peers=2)
    cs = build_structure(p)
    pk, vk = groth16_setup(cs, seed="test-seed-2")
    wit = generate_witness(p, _micro_secagg_inputs(p))
    proof = groth16_prove(pk, cs, wit.witness)
    assert groth16_verify(vk, proof)


def test_h_polynomial_identity():
    """(a*b - c) == h*Z on a random satisfied toy system."""
    p = BalanceParams(n=2, depth=1, model_dim=2)
    cs = build_structure(p)
    inp = _micro_balance_inputs(p)
    wit = generate_witness(p, inp)
    from zkfl_tpu.field.bn254 import domain_size_for

    domain = domain_size_for(len(cs.constraints) + 1)
    a_e, b_e, c_e = matrix_evals(cs.constraints, wit.witness, domain)
    h = compute_h_coeffs(a_e, b_e, c_e)
    assert h[-1] == 0  # deg h <= n-2
    # spot-check the identity at a random field point
    x = 0xDEADBEEF
    zx = (pow(x, domain, FR) - 1) % FR
    from zkfl_tpu.field.bn254 import fr_nth_root

    w = fr_nth_root(domain)
    # interpolate a,b,c at x via Lagrange (only for this micro domain)
    from zkfl_tpu.groth16.setup import lagrange_evals_at

    lag = lagrange_evals_at(x, domain)
    ax = sum(v * l for v, l in zip(a_e, lag)) % FR
    bx = sum(v * l for v, l in zip(b_e, lag)) % FR
    cx = sum(v * l for v, l in zip(c_e, lag)) % FR
    hx = sum(c * pow(x, i, FR) for i, c in enumerate(h)) % FR
    assert (ax * bx - cx) % FR == hx * zx % FR
