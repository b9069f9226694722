from .plots import (
    LivePulsePlot,
    animate_populations,
    animate_pulse,
    plot_bloch_trajectory,
    plot_pulse,
    plot_pulse_IQ,
    plot_pulse_phases,
    plot_state_populations,
    plot_unitary_populations,
    plot_weyl_trajectory,
    plot_wigner,
    weyl_coordinates,
)
