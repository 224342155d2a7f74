"""Stage codecs.

``bzip3_tpu.ops.ref``   — NumPy/Python oracle implementations (bit-exact
                          semantics, used as the ground truth in tests).
``bzip3_tpu.ops.*``     — JAX/XLA/Pallas TPU implementations of the same
                          contracts.
"""
