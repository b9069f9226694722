"""Batched NLP solver: interior-point method + block-tridiagonal KKT."""

from .ipm import IPMOptions, IPMState, solve_nlp
from .kkt import block_tridiag_solve, cyclic_reduction_solve
from .nlp import CollocationNLP
