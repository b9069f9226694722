"""System templates (L5): transmons, ions, Rydberg arrays, cat qubits."""

from .cats import CatSystem, coherent_ket, get_cat_controls
from .ions import (
    IonChainSystem,
    MolmerSorensenCoupling,
    RadialMSGateSystem,
    RadialMSGateSystemWithPhase,
)
from .rydberg import RydbergChainSystem
from .transmons import (
    MultiTransmonSystem,
    TransmonCavitySystem,
    TransmonDipoleCoupling,
    TransmonSystem,
)
