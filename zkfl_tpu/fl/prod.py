"""Production-dims integration flow: N=128, DIM=16, DEPTH=7 (+ sgd_step_v5).

TPU rebuild of tests/integration_test.mjs:557-697 — the reference's
production-scale run: a seeded 128-sample dataset, the balance proof at
(128,7,16) via `balance_unified_prod` (balance_unified_prod.circom:101),
the training proof at (8,16,7) via `sgd_step_v5` (sgd_step_v5.circom:168),
and the cross-proof binding check on the shared root_D
(integration_test.mjs:672-697).  Reference baseline for the two proves at
N=128: 231.5 s on the i7-10750H (Report.pdf Table 5).

Artifact reuse mirrors full_system_simulation.mjs:698-739: the trusted
setups (zkey pickles) and the compiled COO constraint matrices are disk
cached, so a warm run skips the ~3-minute Python structure build and the
setup entirely.  Both circuits share one PipelineProfile, so one compiled
fused pipeline serves both proofs.

Run:  python -m zkfl_tpu.fl.prod            (TPU; CPU works but is slow)
"""

from __future__ import annotations

import json
import time
from typing import Dict, List

from ..commit.merkle import MerkleTree
from ..commit.vector_hash import gradient_commitment, sample_hash
from ..field.bn254 import FR
from ..r1cs.balance import BalanceParams
from ..r1cs.circuits import build_structure, generate_witness
from ..r1cs.compiled import compile_and_cache, compiled_cached
from ..r1cs.training import TrainingParams
from ..groth16.setup import setup_cached
from ..groth16.prover import groth16_prove
from ..groth16.verifier import groth16_verify

PROD_N = 128
PROD_DIM = 16
PROD_DEPTH = 7
PROD_BATCH = 8
PROD_SEED = 42
CACHE_DIR = "/root/.cache/zkfl_prod_artifacts"

BALANCE_PARAMS = BalanceParams(n=PROD_N, depth=PROD_DEPTH, model_dim=PROD_DIM)
V5_PARAMS = TrainingParams(
    batch_size=PROD_BATCH, model_dim=PROD_DIM, depth=PROD_DEPTH,
    precision=1000, variant="v5",
)


class _LCG:
    """integration_test.mjs:67-75 seeded-random semantics."""

    def __init__(self, seed: int = PROD_SEED):
        self.state = seed

    def next(self) -> float:
        self.state = (self.state * 1103515245 + 12345) & 0x7FFFFFFF
        return self.state / 0x7FFFFFFF

    def randint(self, lo: int, hi: int) -> int:
        return lo + int(self.next() * (hi - lo))


def generate_dataset(seed: int = PROD_SEED) -> Dict:
    """Seeded dataset + Merkle commitment (integration_test.mjs:209-252)."""
    rng = _LCG(seed)
    features = [
        [rng.randint(0, 1000) for _ in range(PROD_DIM)] for _ in range(PROD_N)
    ]
    labels = [i % 2 for i in range(PROD_N)]  # exactly balanced
    leaves = [sample_hash(features[i], labels[i]) for i in range(PROD_N)]
    tree = MerkleTree(leaves, PROD_DEPTH)
    return {
        "features": features,
        "labels": labels,
        "tree": tree,
        "root_d": tree.root,
    }


def balance_inputs(ds: Dict, client_id: int = 1) -> Dict:
    tree: MerkleTree = ds["tree"]
    paths = [tree.prove(i) for i in range(PROD_N)]
    c1 = sum(ds["labels"])
    return {
        "client_id": client_id,
        "root": ds["root_d"],
        "N_public": PROD_N,
        "c0": PROD_N - c1,
        "c1": c1,
        "features": ds["features"],
        "labels": ds["labels"],
        "siblings": [p[0] for p in paths],
        "pathIndices": [p[1] for p in paths],
    }


def v5_inputs(ds: Dict, client_id: int = 1, round_num: int = 1) -> Dict:
    """Sign-magnitude gradient within the clipping bound + the first
    PROD_BATCH samples of the shared dataset (binding through root_D)."""
    rng = _LCG(PROD_SEED + 1)
    grad = [rng.randint(-10000, 10001) for _ in range(PROD_DIM)]
    norm_sq = sum(g * g for g in grad)
    tau_squared = max(norm_sq + 1, 76014)  # < 2^60 range check headroom
    grad_pos = [g if g > 0 else 0 for g in grad]
    grad_neg = [-g if g < 0 else 0 for g in grad]
    grad_field = [(p - n) % FR for p, n in zip(grad_pos, grad_neg)]
    tree: MerkleTree = ds["tree"]
    paths = [tree.prove(i) for i in range(PROD_BATCH)]
    return {
        "client_id": client_id,
        "round": round_num,
        "root_D": ds["root_d"],
        "root_G": gradient_commitment(grad_field, client_id, round_num),
        "tauSquared": tau_squared,
        "gradPos": grad_pos,
        "gradNeg": grad_neg,
        "features": ds["features"][:PROD_BATCH],
        "labels": ds["labels"][:PROD_BATCH],
        "siblings": [p[0] for p in paths],
        "pathIndices": [p[1] for p in paths],
    }


def _structure(params, cache_dir: str, log):
    """Compiled-or-full structure.  Warm path loads the COO cache and skips
    the ~3-minute Python constraint build; cold path builds once and fills
    the cache."""
    cc = compiled_cached(params, cache_dir)
    if cc is not None:
        return cc
    t0 = time.time()
    cs = build_structure(params)
    log(f"{params.name}: structure built in {time.time()-t0:.1f}s "
        f"({len(cs.constraints)} constraints)")
    compile_and_cache(cs, cache_dir)
    return cs


def verify_binding(balance_publics: List[int], v5_publics: List[int]) -> bool:
    """Cross-proof binding: the balance proof's Merkle root (public #2,
    wire layout per build_balance declaration order) must equal the
    training proof's root_D (public #3) — integration_test.mjs:672-697."""
    return balance_publics[1] == v5_publics[2]


def run_prod_integration(
    cache_dir: str = CACHE_DIR, verbose: bool = True, engine=None,
) -> Dict:
    def log(msg):
        if verbose:
            print(f"# {msg}", flush=True)

    timings: Dict[str, float] = {}
    t_all = time.time()

    # --- circuits (cached compiled forms + cached setups) ----------------
    t0 = time.time()
    bal_cs = _structure(BALANCE_PARAMS, cache_dir, log)
    v5_cs = _structure(V5_PARAMS, cache_dir, log)
    timings["structures_s"] = time.time() - t0

    # Per-circuit native domains: the two circuits differ 14x in size
    # (357,764 vs 25,858 constraints), so padding sgd_v5 to the balance
    # circuit's 2^19 domain (one shared compiled pipeline) costs ~12 s of
    # wasted device work per v5 proof; two native-shape pipelines trade a
    # one-time extra compile for a ~2x faster steady total.
    if engine is None:
        from ..groth16.engine import JaxEngine

        engine = JaxEngine()
    domain = getattr(getattr(engine, "profile", None), "domain", None)

    def _setup(cs, params):
        """Zkey-cache miss with only the COO form on disk: rebuild the full
        structure once to run the trusted setup."""
        from ..field.bn254 import domain_size_for

        n_cons = (cs.n_constraints if getattr(cs, "is_compiled", False)
                  else len(cs.constraints))
        # explicit natural domain keeps the zkey cache key stable whether
        # or not a profile-bearing engine is passed
        dom = domain or domain_size_for(n_cons + 1)
        try:
            return setup_cached(cs, cache_dir, domain=dom), cs
        except ValueError:
            log(f"{params.name}: zkey cache cold — rebuilding full structure")
            full = build_structure(params)
            return setup_cached(full, cache_dir, domain=dom), cs

    t0 = time.time()
    (bal_pk, bal_vk), bal_cs = _setup(bal_cs, BALANCE_PARAMS)
    (v5_pk, v5_vk), v5_cs = _setup(v5_cs, V5_PARAMS)
    timings["setups_s"] = time.time() - t0
    log(f"setups ready in {timings['setups_s']:.1f}s")

    # --- dataset + witnesses ---------------------------------------------
    t0 = time.time()
    ds = generate_dataset()
    timings["dataset_s"] = time.time() - t0
    t0 = time.time()
    bal_wit = generate_witness(BALANCE_PARAMS, balance_inputs(ds))
    v5_wit = generate_witness(V5_PARAMS, v5_inputs(ds))
    timings["witness_s"] = time.time() - t0
    log(f"witnesses in {timings['witness_s']:.2f}s")

    # --- proofs (first = compile+run, second = steady state) -------------
    t0 = time.time()
    bal_proof = groth16_prove(bal_pk, bal_cs, bal_wit.witness, engine=engine)
    timings["balance_prove_first_s"] = time.time() - t0
    t0 = time.time()
    v5_proof = groth16_prove(v5_pk, v5_cs, v5_wit.witness, engine=engine)
    timings["v5_prove_first_s"] = time.time() - t0
    log(f"first proves: balance {timings['balance_prove_first_s']:.1f}s, "
        f"v5 {timings['v5_prove_first_s']:.1f}s")
    t0 = time.time()
    bal_proof = groth16_prove(bal_pk, bal_cs, bal_wit.witness, engine=engine)
    timings["balance_prove_s"] = time.time() - t0
    t0 = time.time()
    v5_proof = groth16_prove(v5_pk, v5_cs, v5_wit.witness, engine=engine)
    timings["v5_prove_s"] = time.time() - t0
    timings["prove_total_s"] = timings["balance_prove_s"] + timings["v5_prove_s"]

    # --- verify + binding --------------------------------------------------
    t0 = time.time()
    ok_bal = groth16_verify(bal_vk, bal_proof)
    ok_v5 = groth16_verify(v5_vk, v5_proof)
    timings["verify_s"] = time.time() - t0
    bound = verify_binding(bal_proof.public_signals, v5_proof.public_signals)
    timings["total_s"] = time.time() - t_all

    result = {
        "balance_verified": ok_bal,
        "v5_verified": ok_v5,
        "binding_ok": bound,
        "constraints": {
            "balance": getattr(bal_cs, "n_constraints", None)
            or len(bal_cs.constraints),
            "v5": getattr(v5_cs, "n_constraints", None)
            or len(v5_cs.constraints),
        },
        "baseline_prove_s": 231.5,  # Report.pdf Table 5, N=128
        "vs_baseline": round(231.5 / max(timings["prove_total_s"], 1e-9), 2),
        "timings": {k: round(v, 3) for k, v in timings.items()},
    }
    log(json.dumps(result))
    return result


if __name__ == "__main__":
    import os
    import sys

    res = run_prod_integration()
    assert res["balance_verified"] and res["v5_verified"] and res["binding_ok"]
    out = next((a.split("=", 1)[1] for a in sys.argv[1:]
                if a.startswith("--json-out=")), None)
    if out:
        with open(out, "w") as f:
            json.dump(res, f, indent=1)
        print(f"# wrote {os.path.abspath(out)}")
