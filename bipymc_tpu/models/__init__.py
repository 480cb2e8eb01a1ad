from bipymc_tpu.models.targets import (
    correlated_gaussian,
    banana,
    rosenbrock,
    gaussian_mixture,
    neal_funnel,
    eggbox,
    line_fit_log_like,
)
