from bipymc_tpu.models.targets import (
    correlated_gaussian,
    banana,
    rosenbrock,
    gaussian_mixture,
    line_fit_log_like,
)
