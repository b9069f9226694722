"""piccolax — TPU-native quantum optimal control via direct collocation.

A from-scratch JAX/XLA/Pallas framework with the capability set of the
reference Piccolo.jl stack (see SURVEY.md): quantum systems, pulse
parameterizations, trajectory rollouts, and collocation-based pulse
optimization with a batched interior-point solver replacing Ipopt.
"""

__version__ = "0.1.0"

from . import control, quantum, solver
from .control import (
    BangBangPulseProblem,
    MinimumTimeProblem,
    PiccoloOptions,
    QuantumControlProblem,
    SamplingProblem,
    SmoothPulseProblem,
    SplinePulseProblem,
)
from .quantum import *  # noqa: F401,F403
from .quantum.trajectories import (
    DensityTrajectory,
    KetTrajectory,
    MultiDensityTrajectory,
    MultiKetTrajectory,
    SamplingTrajectory,
    UnitaryTrajectory,
    discretize,
    extract_pulse,
)
from .solver import IPMOptions
from .trajectory import Trajectory
