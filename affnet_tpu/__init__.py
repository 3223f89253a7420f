"""affnet_tpu — a TPU-native (JAX/XLA/Pallas) local-feature geometry framework.

Re-implements the full capability surface of ducha-aiki/affnet (Hessian
scale-space detection, learned/handcrafted affine shape + orientation, patch
description, training, evaluation, CLIs) as a from-scratch TPU-first design:
the whole image -> LAFs -> descriptors pipeline is one jitted XLA program
over static shapes.
"""

__version__ = "0.1.0"

from . import laf  # noqa: F401
