"""Distributed pipeline layer: DataFrame plans wrapping the pure kernels."""
