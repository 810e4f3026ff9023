"""Ahead-of-time compiled fused prove pipelines.

The fused witness -> h(X) -> 5-MSM program (device_prover._prove_msms_impl)
is a ~33k-op jaxpr whose Pallas point kernels are ~25k traced ops each —
tracing alone costs ~2 minutes per fresh process and XLA/Mosaic compilation
minutes more.  The reference amortises its analogous cost by caching
compiled circuits + zkeys on disk (full_system_simulation.mjs:698-739); the
TPU-native analog is the *compiled executable itself*: serialize it once
(jax.experimental.serialize_executable) keyed by the pipeline config and
argument shapes, and every later process loads it in ~a second — no
tracing, no compilation.

Artifacts live under <repo>/artifacts/aot (override: ZKFL_AOT_DIR); set
ZKFL_NO_AOT=1 to bypass.  A stale artifact (code changed but key didn't)
computes the old function — every caller verifies proofs with the native
pairing check, which catches that; bump AOT_VERSION on any semantic change
to the pipeline or the field/point kernels.
"""

from __future__ import annotations

import hashlib
import os
import pickle
from typing import Callable, Dict, Optional, Tuple

import jax

# Bump on ANY semantic change to device_prover._prove_msms_impl or the
# kernels it composes (ops/limb_kernels, ops/point_kernels, ops/msm_pallas,
# ops/qap_pallas) so stale executables are never loaded.
AOT_VERSION = 5  # r5: j-vectorized limb emitters (smaller/faster Mosaic kernels)

_loaded: Dict[str, Callable] = {}


def default_dir() -> str:
    env = os.environ.get("ZKFL_AOT_DIR")
    if env:
        return env
    here = os.path.dirname(os.path.abspath(__file__))
    return os.path.normpath(os.path.join(here, "..", "..", "artifacts", "aot"))


def _shape_sig(args) -> Tuple:
    return tuple((tuple(a.shape), str(a.dtype)) for a in args)


def cache_key(cfg, shape_sig) -> str:
    dev = jax.devices()[0]
    desc = repr((AOT_VERSION, jax.__version__, dev.device_kind,
                 len(jax.devices()), cfg, shape_sig))
    return hashlib.sha256(desc.encode()).hexdigest()[:20]


def _path(key: str) -> str:
    return os.path.join(default_dir(), f"prove_msms_{key}.aot")


def enabled() -> bool:
    """AOT executable artifacts only help where deserialization restores
    compiled code.  On the tunneled "axon" PJRT platform the first
    execution of a deserialized executable costs ~as much as a fresh
    backend compile (measured 95-195 s, r5) while HIDING the cost behind
    async dispatch — worse than the instrumented lower/compile path
    (device_prover._compile_pipeline).  Opt back in with ZKFL_FORCE_AOT=1
    on platforms where loading is cheap."""
    if os.environ.get("ZKFL_NO_AOT"):
        return False
    if jax.default_backend() != "tpu":
        return False
    if os.environ.get("ZKFL_FORCE_AOT"):
        return True
    return "axon" not in jax.devices()[0].client.platform_version


def load(cfg, args) -> Optional[Callable]:
    """Deserialized executable for (cfg, arg shapes), or None if absent."""
    if not enabled():
        return None
    key = cache_key(cfg, _shape_sig(args))
    fn = _loaded.get(key)
    if fn is not None:
        return fn
    path = _path(key)
    if not os.path.exists(path):
        return None
    try:
        from jax.experimental import serialize_executable as se

        with open(path, "rb") as f:
            payload, in_tree, out_tree = pickle.load(f)
        fn = se.deserialize_and_load(payload, in_tree, out_tree)
    except Exception:  # corrupt/incompatible artifact: fall back to jit
        return None
    _loaded[key] = fn
    return fn


def build_and_save(cfg, args) -> Callable:
    """Trace + compile the fused pipeline for these arg shapes, persist the
    executable, and return the loaded callable.  Idempotent: an existing
    artifact (in memory or on disk) is loaded, not rebuilt."""
    from jax.experimental import serialize_executable as se

    from .device_prover import _prove_msms_impl

    key = cache_key(cfg, _shape_sig(args))
    fn = _loaded.get(key) or load(cfg, args)
    if fn is not None:
        return fn

    def wrapper(n_pub, g1_pts, b2_pts, rows, cols, coeffs, w_std):
        return _prove_msms_impl(cfg, n_pub, g1_pts, b2_pts, rows, cols,
                                coeffs, w_std)

    specs = [jax.ShapeDtypeStruct(a.shape, a.dtype) for a in args]
    compiled = jax.jit(wrapper).lower(*specs).compile()
    payload, in_tree, out_tree = se.serialize(compiled)
    os.makedirs(default_dir(), exist_ok=True)
    path = _path(key)
    with open(path + ".tmp", "wb") as f:
        pickle.dump((payload, in_tree, out_tree), f)
    os.replace(path + ".tmp", path)
    fn = se.deserialize_and_load(payload, in_tree, out_tree)
    _loaded[key] = fn
    return fn
