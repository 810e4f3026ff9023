"""Client-batched proving: B independent witnesses through one fused
pipeline, optionally sharded over a device mesh (SURVEY §2.4 row 1 — the
reference loops clients sequentially at full_system_simulation.mjs:1298-1343;
per-client proofs are independent, so they batch/shard freely)."""

import pytest

from zkfl_tpu.field.bn254 import FR
from zkfl_tpu.groth16.device_prover import DeviceProver
from zkfl_tpu.groth16.prover import _assemble_proof, groth16_prove
from zkfl_tpu.groth16.setup import groth16_setup
from zkfl_tpu.groth16.verifier import groth16_verify
from zkfl_tpu.r1cs.builder import ConstraintSystem


def _toy_circuit(x: int, y: int) -> ConstraintSystem:
    cs = ConstraintSystem(name="toy_batch")
    out_val = (x * x % FR * y + x + 7) % FR
    out = cs.public_input("out", out_val)
    xin = cs.private_input("x", x)
    yin = cs.private_input("y", y)
    x2 = cs.mul(xin, xin)
    x2y = cs.mul(x2, yin)
    cs.enforce_equal(x2y + xin + 7, out)
    return cs


@pytest.fixture(scope="module")
def setup():
    cs = _toy_circuit(3, 5)
    pk, vk = groth16_setup(cs, seed="batch-seed")
    witnesses = [_toy_circuit(3 + i, 5 + 2 * i).witness for i in range(2)]
    return cs, pk, vk, witnesses


def test_batched_matches_single(setup):
    cs, pk, vk, witnesses = setup
    prover = DeviceProver(pk, cs)
    batched = prover.msm_results_many(witnesses)
    for w, msms in zip(witnesses, batched):
        single = prover.msm_results(w)
        assert msms == single


def test_batched_proofs_verify(setup):
    cs, pk, vk, witnesses = setup
    prover = DeviceProver(pk, cs)
    for w, msms in zip(witnesses, prover.msm_results_many(witnesses)):
        proof = _assemble_proof(pk, w, msms, r=7, s=11)
        assert groth16_verify(vk, proof)


@pytest.mark.slow
def test_batched_on_mesh_matches():
    """Client axis sharded over 2 virtual devices — same results.

    Runs in a fresh subprocess: the shard_map'd fused pipeline is the
    largest XLA CPU compile in the suite, and compiling it after ~45 other
    tests' compiles segfaults LLVM in-process (observed repeatably on the
    2-vCPU CI host).  A clean process compiles it fine — same program the
    driver's dryrun_multichip exercises.
    """
    import os
    import subprocess
    import sys
    import textwrap

    script = textwrap.dedent(
        """
        import numpy as np, jax
        from jax.sharding import Mesh
        from tests.test_client_batch import _toy_circuit
        from zkfl_tpu.groth16.device_prover import DeviceProver
        from zkfl_tpu.groth16.setup import groth16_setup

        cs = _toy_circuit(3, 5)
        pk, vk = groth16_setup(cs, seed="batch-seed")
        witnesses = [_toy_circuit(3 + i, 5 + 2 * i).witness for i in range(2)]
        devs = jax.devices()
        assert len(devs) >= 2, "needs the multi-device CPU mesh"
        mesh = Mesh(np.array(devs[:2]), ("clients",))
        prover = DeviceProver(pk, cs)
        plain = prover.msm_results_many(witnesses)
        sharded = prover.msm_results_many(witnesses, mesh=mesh)
        assert plain == sharded
        print("mesh-batched proving matches", flush=True)
        """
    )
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run(
        [sys.executable, "-c", script],
        env=env,
        cwd=repo,
        capture_output=True,
        text=True,
        timeout=1500,
    )
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr[-4000:]}"
    assert "mesh-batched proving matches" in r.stdout
