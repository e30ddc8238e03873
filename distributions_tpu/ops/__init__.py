"""Fused sweep kernels (sequential scan + blocked tiles + Pallas)."""
