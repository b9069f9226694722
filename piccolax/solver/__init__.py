"""Batched NLP solver: interior-point method + block-tridiagonal KKT."""

from .ipm import IPMOptions, IPMState, solve_nlp
from .kkt import condensed_factor, condensed_solve, cr_factor, cr_solve
from .nlp import CollocationNLP
