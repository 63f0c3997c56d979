"""Device (TPU) compute layer: JAX/XLA + Pallas kernels."""
