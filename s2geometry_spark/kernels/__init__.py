"""Vectorized numpy kernels implementing S2 geometry semantics.

Every kernel operates on numpy arrays (batch-at-a-time) so it can be
exposed as a pandas/Arrow UDF — never per-row Python on the hot path.
"""
