"""Persistent XLA compile cache, shared by every entry point.

Flagship-scale programs are large HLOs (minutes of cold compile); caching
compiled executables across process invocations makes every run after the
first start in seconds. One helper so the CLI (`main.py`), the driver entry
(`__graft_entry__`) and the bench agree on the environment contract:

* ``UPP_NO_COMPILE_CACHE=1``        — disable entirely.
* ``UPP_JAX_CACHE_DIR=<dir>``       — override the location (the multichip
  dryrun subprocess points it at a fresh dir so XLA:CPU never reads
  TPU-compiled entries and floods stderr with AOT machine-feature warnings).
* ``JAX_COMPILATION_CACHE_DIR=<dir>`` — jax's native spelling, also honored.
"""

import os


_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Default lives INSIDE the repo (gitignored), not /tmp: the repo survives
# container restarts while /tmp does not — a wiped /tmp cost a session a
# fully cold ~17-min bench (BASELINE.md "Compile-time budget").
_DEFAULT_DIR = os.path.join(_REPO_ROOT, ".jax_cache")


def enable_compile_cache(default_dir: str = _DEFAULT_DIR) -> None:
    if os.environ.get("UPP_NO_COMPILE_CACHE"):
        return
    cache_dir = (os.environ.get("UPP_JAX_CACHE_DIR")
                 or os.environ.get("JAX_COMPILATION_CACHE_DIR")
                 or default_dir)
    import jax
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except (OSError, AttributeError):
        pass  # unwritable dir / older jax: run without the cache
