"""affnet_tpu — a TPU-native (JAX/XLA/Pallas) local-feature geometry framework.

Re-implements the full capability surface of ducha-aiki/affnet (Hessian
scale-space detection, learned/handcrafted affine shape + orientation, patch
description, training, evaluation, CLIs) as a from-scratch TPU-first design:
the whole image -> LAFs -> descriptors pipeline is one jitted XLA program
over static shapes.
"""

__version__ = "0.1.0"

import jax as _jax

# Numerical policy: float32 arrays mean float32 math.  TPUs default to
# bfloat16 matmul inputs for f32 operands ("DEFAULT" precision), which
# truncates keypoint coordinates and descriptor distances far beyond the
# reference-parity budget.  Speed comes from *explicit* bfloat16 dtypes on
# the CNN paths (see models/), never from silent input truncation.
_jax.config.update("jax_default_matmul_precision", "float32")

# Persistent compilation cache: the remote-compile service behind the axon
# tunnel takes ~45 min for the full train step's conv backwards (CLAUDE.md);
# pay that once per machine, not per process.  Override the location with
# AFFNET_TPU_COMPILE_CACHE (empty string disables).
import os as _os  # noqa: E402

_cache_dir = _os.environ.get("AFFNET_TPU_COMPILE_CACHE",
                             _os.path.expanduser("~/.cache/affnet_tpu_xla"))
if _cache_dir:
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    # Cache every compilation, however quick (default skips <1 s compiles).
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from . import laf  # noqa: F401, E402
