from bipymc_tpu.gp.kernels import squared_exp, matern32, matern52
from bipymc_tpu.gp.regressor import GpRegressor
from bipymc_tpu.gp.sparse import SparseGpRegressor, init_inducing
