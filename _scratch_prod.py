import os, time
os.environ["JAX_PLATFORMS"] = "cpu"
import time
from zkfl_tpu.r1cs.balance import BalanceParams
from zkfl_tpu.r1cs.training import TrainingParams
from zkfl_tpu.r1cs.circuits import build_structure, generate_witness, dummy_inputs

for params in (
    BalanceParams(n=128, depth=7, model_dim=16),
    TrainingParams(batch_size=8, model_dim=16, depth=7, precision=1000, variant="v5"),
):
    t0 = time.time()
    cs = build_structure(params)
    t1 = time.time()
    nnz = sum(len(abc[k]) for abc in cs.constraints for k in range(3))
    print(f"{params.name}: {len(cs.constraints)} constraints, {cs.n_wires} wires, "
          f"nnz {nnz}, build {t1-t0:.1f}s", flush=True)
    inp = dummy_inputs(params)
    t0 = time.time()
    wit = generate_witness(params, inp)
    t1 = time.time()
    print(f"  witness {t1-t0:.2f}s ({len(wit.witness)} wires)", flush=True)
