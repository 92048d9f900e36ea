"""cbench_basic_tpu — TPU-native computationally-scalable neural image
compression framework (BaSIC capabilities, JAX/XLA/Pallas compute path,
C++ host-side entropy coding)."""

__version__ = "0.1.0"
