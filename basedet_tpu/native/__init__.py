"""Native (C++) runtime components.

The compute path is JAX/XLA/Pallas (TPU); this package holds the
C++ host-side runtime pieces — currently the fused batch-pack op used by
the data loader (the analogue of the reference's native MegEngine
DataLoader machinery). Everything here is optional: callers fall back to
numpy when the toolchain or binary is unavailable.
"""
from basedet_tpu.native.pack import pack_images  # noqa: F401
