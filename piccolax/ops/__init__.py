"""Compute kernels: matrix exponentials (Pade, scaling-and-squaring) as
batched XLA matmuls — the hot ops of the collocation residual path."""

from .expm import expm, expm_action, expm_pade_fixed
