"""Control layer: collocation NLP assembly over quantum trajectories.

Physics-thin by design (the quantum layer is optimization-free) —
mirrors the reference architectural invariant (src/control/CONTEXT.md).
"""

from . import constraints, integrators, objectives
from .options import PiccoloOptions
from .problem import QuantumControlProblem, build_nlp
from .templates import (
    BangBangPulseProblem,
    MinimumTimeProblem,
    SamplingProblem,
    SmoothPulseProblem,
    SplinePulseProblem,
)
