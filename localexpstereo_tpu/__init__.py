"""localexpstereo_tpu: TPU-native Local Expansion Stereo framework.

See ARCHITECTURE.md at the repo root for the design and SURVEY.md for the
reference mapping.
"""
import os as _os

import jax as _jax

# Persistent compilation cache: the engine compiles one executable per
# (layer, proposal-plan) variant; caching makes repeated runs start hot.
_repo_root = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
_cache_dir = _os.environ.get("LOCALEXP_JAX_CACHE",
                             _os.path.join(_repo_root, ".jax_cache"))
try:
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # pragma: no cover - cache is best-effort
    pass

__version__ = "0.1.0"
