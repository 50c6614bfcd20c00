"""Global dtype policy for the framework.

The reference (`/root/reference/src/color.rs:2` and every shape) computes in
f64. TPUs natively compute in f32 (f64 is emulated and an order of magnitude
slower), so the TPU-native design is f32 throughout with scale-aware epsilons
(see `rpt_tpu.intersect`). Set ``RPT_TPU_F64=1`` to enable f64 for parity
debugging on CPU.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

_F64 = os.environ.get("RPT_TPU_F64", "0") == "1"

if _F64:
    jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: scene/shape changes retrigger XLA compiles
# that take minutes on TPU toolchains; cache them across processes.
#
# CPU runs (tests, multichip dryrun) get a cache dir KEYED BY THE HOST CPU
# FEATURE SET: XLA:CPU AOT entries embed the compile machine's ISA, and
# the home directory outlives the VM — entries written by a previous
# round's machine would load on a host missing those features with only a
# warning ("could lead to execution errors such as SIGILL"). (NB: the
# loader also warns about +prefer-no-scatter/+prefer-no-gather on
# SAME-machine entries — those are LLVM tuning flags absent from runtime
# feature detection; benign.) The TPU dir stays fingerprint-free (TPU
# executables don't depend on host ISA; losing that cache re-costs
# ~15 min of dragon-bench compile).
if os.environ.get("RPT_TPU_NO_COMPILE_CACHE", "0") != "1":
    _cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if _cache_dir is None:
        _cache_dir = os.path.join(os.path.expanduser("~"), ".cache", "rpt_tpu_xla")
        try:
            _platforms = jax.config.jax_platforms or ""
        except Exception:  # pragma: no cover
            _platforms = ""
        # The axon TPU plugin IGNORES the JAX_PLATFORMS env var for backend
        # selection (CLAUDE.md) — only a programmatic
        # jax.config.update("jax_platforms", "cpu") actually selects CPU.
        # If "cpu" came solely from the env var on an axon machine, the real
        # compiles are still TPU: don't route them into the _cpu_<fp> dir
        # (which would orphan the warm TPU cache, ~15 min of dragon compile).
        # Callers that genuinely run on XLA:CPU (tests/conftest.py, the
        # dryrun subprocess) assert it via RPT_TPU_CACHE_PLATFORM=cpu.
        _cache_plat = os.environ.get("RPT_TPU_CACHE_PLATFORM")
        if _cache_plat is None:
            _env_plat = os.environ.get("JAX_PLATFORMS", "")
            _axon_installed = "axon" in _env_plat or any(
                "axon" in p
                for p in os.environ.get("PYTHONPATH", "").split(os.pathsep)
            )
            if _axon_installed and _env_plat.startswith("cpu") and _platforms == _env_plat:
                _platforms = ""
        else:
            _platforms = _cache_plat
        if _platforms.startswith("cpu"):
            import hashlib

            try:
                with open("/proc/cpuinfo") as _f:
                    _flags = next((l for l in _f if l.startswith("flags")), "")
            except OSError:  # pragma: no cover - non-linux
                _flags = ""
            _fp = hashlib.sha1(
                (_flags + jax.__version__).encode()
            ).hexdigest()[:10]
            _cache_dir = f"{_cache_dir}_cpu_{_fp}"
    try:
        os.makedirs(_cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass

#: Float dtype used for all geometry/radiometry computation.
DTYPE = jnp.float64 if _F64 else jnp.float32

#: Integer dtype for indices (BVH nodes, triangle ids, material ids).
ITYPE = jnp.int32

#: Large-but-finite sentinel used as "no hit" time (reference uses f64::INFINITY,
#: `shape.rs:87`). We use actual inf; f32 inf is fine on TPU.
INF = float("inf")


def asf(x):
    """Convert to the global float dtype."""
    return jnp.asarray(x, dtype=DTYPE)
