"""Production-dims integration path (zkfl_tpu/fl/prod.py) + compiled COO
circuit cache (r1cs/compiled.py).

The full N=128 flow (structure build + setup + prove) only makes sense on
TPU hardware — gate with ZKFL_TEST_TPU=1 / --run-slow.  The COO cache and
the input generators are validated here at toy/micro dims on CPU.
"""

import jax
import numpy as np
import pytest

from zkfl_tpu.field.bn254 import FR
from zkfl_tpu.groth16.engine import JaxEngine
from zkfl_tpu.groth16.prover import groth16_prove
from zkfl_tpu.groth16.setup import groth16_setup
from zkfl_tpu.groth16.verifier import groth16_verify
from zkfl_tpu.r1cs.builder import ConstraintSystem
from zkfl_tpu.r1cs.compiled import CompiledCircuit


def _toy(x, y):
    cs = ConstraintSystem(name="toy_compiled")
    out = cs.public_input("out", (x * x % FR * y + x + 7) % FR)
    xin = cs.private_input("x", x)
    yin = cs.private_input("y", y)
    cs.enforce_equal(cs.mul(cs.mul(xin, xin), yin) + xin + 7, out)
    return cs


def test_compiled_roundtrip(tmp_path):
    cs = _toy(3, 5)
    cc = CompiledCircuit.from_structure(cs)
    assert cc.n_wires == cs.n_wires and cc.n_pub == cs.n_pub
    assert cc.nnz == sum(len(abc[k]) for abc in cs.constraints for k in range(3))
    path = tmp_path / "toy.coo.npz"
    cc.save(path)
    cc2 = CompiledCircuit.load(path)
    assert np.array_equal(cc.which, cc2.which)
    assert np.array_equal(cc.row, cc2.row)
    assert np.array_equal(cc.col, cc2.col)
    assert np.array_equal(cc.coeffs, cc2.coeffs)
    assert cc2.name == cs.name


def test_compiled_prove_matches_structure():
    """Proving through the CompiledCircuit COO form = structure form."""
    cs = _toy(3, 5)
    pk, vk = groth16_setup(cs, seed="compiled-seed")
    cc = CompiledCircuit.from_structure(cs)
    eng = JaxEngine()
    p1 = groth16_prove(pk, cs, cs.witness, engine=eng, blinding=(7, 11))
    p2 = groth16_prove(pk, cc, cs.witness, engine=eng, blinding=(7, 11))
    assert p1 == p2
    assert groth16_verify(vk, p2)


def test_compiled_requires_fused_engine():
    from zkfl_tpu.groth16.engine import HostEngine

    cs = _toy(3, 5)
    pk, _ = groth16_setup(cs, seed="compiled-seed")
    cc = CompiledCircuit.from_structure(cs)
    with pytest.raises(ValueError):
        groth16_prove(pk, cc, cs.witness, engine=HostEngine())


def test_prod_inputs_satisfy_circuits_micro():
    """The prod input generators produce satisfying witnesses (checked at
    the generator level against micro-dims replicas of the same circuits:
    structure+witness equality is dimension-generic)."""
    from zkfl_tpu.commit.merkle import verify_merkle_path
    from zkfl_tpu.fl import prod

    ds = prod.generate_dataset()
    # Merkle paths verify against root_D
    for i in (0, 1, 127):
        leaf = prod.sample_hash(ds["features"][i], ds["labels"][i])
        sib, idx = ds["tree"].prove(i)
        assert verify_merkle_path(leaf, sib, idx, ds["root_d"])
    bi = prod.balance_inputs(ds)
    assert bi["c0"] + bi["c1"] == prod.PROD_N
    assert bi["c1"] == sum(bi["labels"])
    vi = prod.v5_inputs(ds)
    assert vi["root_D"] == ds["root_d"]
    norm = sum(p * p + n * n for p, n in zip(vi["gradPos"], vi["gradNeg"]))
    assert norm <= vi["tauSquared"] < 1 << 60
    assert all(0 <= p < 1 << 30 for p in vi["gradPos"] + vi["gradNeg"])
    grad_field = [
        (p - n) % FR for p, n in zip(vi["gradPos"], vi["gradNeg"])
    ]
    assert vi["root_G"] == prod.gradient_commitment(grad_field, 1, 1)


@pytest.mark.slow
@pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="prod dims need the TPU"
)
def test_prod_integration_on_tpu():
    from zkfl_tpu.fl.prod import run_prod_integration

    res = run_prod_integration(verbose=False)
    assert res["balance_verified"] and res["v5_verified"] and res["binding_ok"]
    assert res["constraints"]["balance"] > 300_000
