from bipymc_tpu.parallel.mesh import chain_mesh
from bipymc_tpu.parallel.pool import ChainPool
