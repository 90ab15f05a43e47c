"""basedet_tpu: a TPU-native object-detection framework in JAX/XLA/Pallas.

Rebuilt from scratch with the capabilities of megvii-research/basedet
(reference at /root/reference): ten detection models, config-as-factory,
hook-based training engine, COCO data pipeline + evaluator, and CLI tools —
designed TPU-first (jit/pjit over a device mesh, static shapes, Pallas
kernels for the hot box ops).
"""

__version__ = "0.1.0"
