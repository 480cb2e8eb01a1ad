from bipymc_tpu.samplers.api import (
    Metropolis,
    AdaptiveMetropolis,
    DrMetropolis,
    Dram,
    DeMc,
    DeMcZ,
    Dream,
    EnsembleSampler,
    ParallelTempering,
    DreamZs,
)
