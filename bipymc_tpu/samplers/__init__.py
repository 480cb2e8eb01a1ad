from bipymc_tpu.samplers.api import (
    Metropolis,
    AdaptiveMetropolis,
    DrMetropolis,
    Dram,
    DeMc,
    DeMcZ,
    Dream,
    EnsembleSampler,
    Hmc,
    Mala,
    ParallelTempering,
    DreamZs,
)
