"""Batched numeric kernels (JAX/XLA; Pallas variants for the fused hot path)."""
