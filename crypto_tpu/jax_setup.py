"""Central JAX configuration: persistent compilation cache.

Import early (conftest / bench / entry points) so repeated runs skip XLA
compilation of the limb-arithmetic graphs.
"""

import os

import jax

_CACHE_DIR = os.environ.get(
    "CRYPTO_TPU_JAX_CACHE", os.path.expanduser("~/.cache/crypto_tpu_jax"))


def setup():
    os.makedirs(_CACHE_DIR, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


setup()
