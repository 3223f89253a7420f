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

from . import laf  # noqa: F401, E402
