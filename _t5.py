import os, time
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("ZKFL_DETERMINISTIC_BLINDING", "1")
import jax
jax.config.update("jax_platforms", "cpu")
t0 = time.time()
from zkfl_tpu.fl.config import MICRO_CONFIG
from zkfl_tpu.fl.prover import RoundProver
from zkfl_tpu.groth16.engine import HostEngine
import tempfile
with tempfile.TemporaryDirectory() as td:
    t0 = time.time()
    rp = RoundProver(MICRO_CONFIG, engine=HostEngine(), cache_dir=td)
    print(f"RoundProver (3 setups, device path, cold): {time.time()-t0:.1f}s", flush=True)
from zkfl_tpu.fl.simulation import run_round
t0 = time.time()
server, timings = run_round(MICRO_CONFIG, engine=HostEngine(), prover=rp, verbose=False)
print(f"micro round (host engine): {time.time()-t0:.1f}s", flush=True)
print({k: round(v,1) for k,v in timings.items()}, flush=True)
