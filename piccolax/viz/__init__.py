from .plots import (
    plot_bloch_trajectory,
    plot_pulse,
    plot_pulse_IQ,
    plot_pulse_phases,
    plot_state_populations,
    plot_unitary_populations,
    plot_wigner,
)
