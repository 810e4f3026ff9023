"""Adversarial attack vectors (Report.pdf Table 6) as executable tests.

The reference documents these only as prose; here each attack is mounted
against the regenerated constraint systems / protocol layer and must fail
witness satisfaction or server verification.
"""

import pytest

from zkfl_tpu.field.bn254 import FR
from zkfl_tpu.r1cs.balance import BalanceParams
from zkfl_tpu.r1cs.circuits import build_circuit
from zkfl_tpu.r1cs.secagg import SecaggParams
from zkfl_tpu.r1cs.training import TrainingParams

from test_r1cs import (
    _micro_balance_inputs,
    _micro_secagg_inputs,
    _micro_training_inputs,
)


# -- Attack 1: dataset substitution ----------------------------------------

def test_training_on_substituted_dataset_fails():
    """Train on samples not in the committed tree -> Merkle membership
    constraints unsatisfied."""
    p = TrainingParams(batch_size=2, model_dim=2, depth=1, variant="verified")
    inp = _micro_training_inputs(p)
    inp["features"][0][0] += 1
    cs = build_circuit(p, inp)
    assert not cs.is_satisfied()


def test_balance_with_relabelled_sample_fails():
    """Flip a label to fake balance -> leaf hash no longer in tree."""
    p = BalanceParams(n=4, depth=2, model_dim=2)
    inp = _micro_balance_inputs(p)
    inp["labels"][0] ^= 1
    inp["c0"] += 1 if inp["labels"][0] == 0 else -1
    inp["c1"] += 1 if inp["labels"][0] == 1 else -1
    cs = build_circuit(p, inp)
    assert not cs.is_satisfied()


# -- Attack 2: gradient inflation ------------------------------------------

def test_gradient_inflation_breaks_division_check():
    """Claim a bigger gradient than the data supports -> summed = q*D + r
    identity fails."""
    p = TrainingParams(batch_size=2, model_dim=2, depth=1, variant="verified")
    inp = _micro_training_inputs(p)
    inp["gradPos"] = [g + 7 for g in inp["gradPos"]]
    cs = build_circuit(p, inp)
    assert not cs.is_satisfied()


def test_norm_bound_violation_fails():
    """Gradient with norm^2 > tau^2 cannot satisfy the clipping gadget."""
    p = TrainingParams(batch_size=2, model_dim=2, depth=1, variant="verified")
    inp = _micro_training_inputs(p)
    inp["tauSquared"] = 1  # tighten below the honest norm
    cs = build_circuit(p, inp)
    assert not cs.is_satisfied()


# -- Attack 3: wrong weights -----------------------------------------------

def test_wrong_weights_break_weight_commitment():
    """Gradient computed from different weights than root_W commits to."""
    p = TrainingParams(batch_size=2, model_dim=2, depth=1, variant="verified")
    inp = _micro_training_inputs(p)
    inp["weights"][0] += 1  # root_W still commits to the old weights
    cs = build_circuit(p, inp)
    assert not cs.is_satisfied()


# -- Attack 4: mask manipulation -------------------------------------------

def test_biased_mask_fails_prf_constraints():
    """Submitting a masked update with a self-chosen (non-PRF) mask."""
    p = SecaggParams(dim=2, num_peers=2)
    inp = _micro_secagg_inputs(p)
    inp["masked_update"] = [(m + 5) % FR for m in inp["masked_update"]]
    cs = build_circuit(p, inp)
    assert not cs.is_satisfied()


def test_wrong_shared_key_fails_key_commitment():
    p = SecaggParams(dim=2, num_peers=2)
    inp = _micro_secagg_inputs(p)
    inp["shared_keys"] = [(k + 1) % FR for k in inp["shared_keys"]]
    cs = build_circuit(p, inp)
    assert not cs.is_satisfied()


# -- Attack 5: fabricated gradient commitment ------------------------------

def test_fabricated_root_g_fails():
    """root_G that doesn't match the gradient -> commitment constraint."""
    p = TrainingParams(batch_size=2, model_dim=2, depth=1, variant="verified")
    inp = _micro_training_inputs(p)
    inp["root_G"] = (inp["root_G"] + 1) % FR
    cs = build_circuit(p, inp)
    assert not cs.is_satisfied()


def test_secagg_gradient_swap_fails():
    """Prove secagg for a different gradient than root_G commits to."""
    p = SecaggParams(dim=2, num_peers=2)
    inp = _micro_secagg_inputs(p)
    inp["gradient"] = [(g + 1) % FR for g in inp["gradient"]]
    cs = build_circuit(p, inp)
    assert not cs.is_satisfied()


# -- Attack 6: cross-proof binding (server level, in test_fl.py) ------------
# Covered by tests/test_fl.py::test_server_binding_and_hardening_checks.


# -- Production dims (integration_test.mjs analog) --------------------------

@pytest.mark.slow
def test_balance_prod_dims_witness():
    """balance_unified_prod configuration (128, 7, 16)
    (balance_unified_prod.circom:101): witness satisfies the regenerated
    R1CS at production dimensions."""
    p = BalanceParams(n=128, depth=7, model_dim=16)
    inp = _micro_balance_inputs(p)
    cs = build_circuit(p, inp)
    assert cs.is_satisfied()
    assert cs.stats()["constraints"] > 50_000


# -- Inherited fixed-point gaps (ADVICE r1: documented, demonstrated) --------

class TestFixedpointInheritedGaps:
    """The reference's fixedpoint.circom carries two soundness gaps that we
    replicate faithfully (parity, not regression).  These tests PROVE the
    gaps are real by constructing satisfying adversarial witnesses — the
    executable form of the module docstring's warnings."""

    def test_fixed_mul_remainder_wrap_forges_quotient(self):
        """LessThan(64) admits a field-negative remainder (rem = FR - k,
        k < 2^64 - P), so the quotient can be shifted (fixedpoint.circom
        :64-73 has the identical gap)."""
        from zkfl_tpu.r1cs.builder import ConstraintSystem
        from zkfl_tpu.r1cs.fixedpoint import fixed_mul

        P = 1000
        cs = ConstraintSystem()
        a = cs.private_input("a", 3140)
        b = cs.private_input("b", 2000)
        q = fixed_mul(cs, a, b, P)
        assert q.value == 6280 and cs.is_satisfied()

        w_q = next(iter(q.terms))
        w_prod, w_rem = w_q - 1, w_q + 1
        vals = list(cs.values)
        product = vals[w_prod]
        q_bad = (vals[w_q] + 1) % FR           # forge quotient + 1
        rem_bad = (product - q_bad * P) % FR    # field-negative remainder
        vals[w_q], vals[w_rem] = q_bad, rem_bad
        shifted = (rem_bad + (1 << 64) - P) % FR
        for i in range(65):                     # LessThan's Num2Bits wires
            vals[w_rem + 1 + i] = (shifted >> i) & 1
        cs.values = vals
        # adversarial witness SATISFIES the constraint system -> gap is real
        assert cs.is_satisfied()
        assert cs.values[w_q] != 6280

    def test_fixed_abs_sign_hint_unconstrained(self):
        """The branch-consistency check (:346-349) holds for either boolean
        is_neg, so a prover may return value instead of -value."""
        from zkfl_tpu.r1cs.builder import ConstraintSystem
        from zkfl_tpu.r1cs.fixedpoint import fixed_abs

        v = (FR - 5000) % FR  # -5.0 in field encoding
        cs = ConstraintSystem()
        x = cs.private_input("x", v)
        r = fixed_abs(cs, x)
        assert r.value == 5000 and cs.is_satisfied()

        # wire layout: x=1, is_neg=2, mul(is_neg, -2v)=3, branch muls 4, 5
        vals = list(cs.values)
        vals[2] = 0  # lie: claim non-negative
        vals[3] = 0  # is_neg * (neg - value) = 0
        vals[4] = 0  # is_neg * (result + value) = 0
        vals[5] = 0  # (1 - is_neg) * (result - value) = value - value = 0
        cs.values = vals
        assert cs.is_satisfied()  # abs is advisory: forged branch accepted
