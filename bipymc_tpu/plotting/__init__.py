from bipymc_tpu.plotting.mc_plot import (
    plot_trace, plot_hist, plot_corner, plot_acceptance, plot_autocorr,
    plot_geweke, plot_mode_occupancy, plot_rank, plot_sbc_ranks)
