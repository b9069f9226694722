"""Compute kernels (expm, KKT block ops, Pallas implementations)."""

from .expm import expm, expm_action, expm_pade_fixed
