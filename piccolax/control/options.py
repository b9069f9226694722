"""Framework options record.

TPU-native counterpart of the reference PiccoloOptions
(reference: src/control/options.jl:88-121). Three config tiers mirror the
reference: problem options here, solver options in
`solver.ipm.IPMOptions`, per-template weight kwargs on the templates.
"""

from __future__ import annotations

import dataclasses

__all__ = ["PiccoloOptions"]


@dataclasses.dataclass(frozen=True)
class PiccoloOptions:
    display: str = "compact"                 # silent | compact | standard | detailed
    timesteps_all_equal: bool = True
    geodesic: bool = True                    # geodesic state init (reference
                                             # options.jl:70; rollout of the
                                             # seed pulse when False)
    rollout_integrator: str = "auto"         # sync/validation rollout method:
                                             # auto | zoh | magnus4 (reference
                                             # options.jl:69 rollout_integrator)
    zero_initial_and_final_derivative: bool = False
    complex_control_norm_constraint: float | None = None
    bound_state: float | None = None         # +-box on state iso components
    bound_state_l2: bool = False             # Re^2+Im^2 <= 1 per complex entry
    leakage_constraint_value: float | None = None
    leakage_cost: float = 0.0
    rollout_n_substeps: int = 10             # validation rollout refinement

    def __post_init__(self):
        assert self.display in ("silent", "compact", "standard", "detailed")
        assert self.rollout_integrator in ("auto", "zoh", "magnus4")
