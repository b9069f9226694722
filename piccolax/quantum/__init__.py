"""Physics layer: optimization-free quantum objects (systems, pulses, rollouts).

Mirrors the reference architectural invariant that the quantum layer knows
nothing about the optimizer (reference: src/quantum/CONTEXT.md:15).
"""

from . import (
    dynamics,
    encodings,
    gates,
    isomorphisms,
    operators,
    pulses,
    system_utils,
    systems,
    templates,
    trajectories,
)
from .encodings import DualRailEncoding, target_states
from .system_utils import is_reachable, operator_algebra
from .templates import (
    CatSystem,
    IonChainSystem,
    MolmerSorensenCoupling,
    MultiTransmonSystem,
    RadialMSGateSystem,
    RadialMSGateSystemWithPhase,
    RydbergChainSystem,
    TransmonCavitySystem,
    TransmonDipoleCoupling,
    TransmonSystem,
    coherent_ket,
    get_cat_controls,
)
from .dynamics import (
    density_fidelity,
    density_rollout,
    fidelity,
    ket_rollout,
    pedersen_fidelity,
    rollout_fidelity,
    unitary_fidelity,
    unitary_rollout,
    unitary_rollout_fidelity,
)
from .gates import GATES, PAULIS
from .isomorphisms import (
    G,
    H_from_G,
    compact_iso_to_density,
    density_to_compact_iso,
    density_to_iso_vec,
    iso,
    iso_to_ket,
    iso_vec_to_density,
    iso_vec_to_operator,
    ket_to_iso,
    operator_to_iso_vec,
)
from .operators import (
    EmbeddedOperator,
    annihilate,
    create,
    direct_sum,
    embed,
    get_leakage_indices,
    get_subspace_indices,
    haar_random,
    ket_from_bitstring,
    ket_from_string,
    lift_operator,
    operator_from_string,
    unembed,
)
from .pulses import (
    CompositePulse,
    CubicSplinePulse,
    ErfPulse,
    FunctionPulse,
    GaussianPulse,
    LinearSplinePulse,
    ZeroOrderPulse,
    load_pulse,
    save_pulse,
)
from .systems import (
    CompositeQuantumSystem,
    DriftTerm,
    LinearDissipator,
    LinearDrive,
    ModulatedDrive,
    NonlinearDissipator,
    NonlinearDrive,
    OpenQuantumSystem,
    QuantumSystem,
    VariationalQuantumSystem,
)
