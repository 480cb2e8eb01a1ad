from bipymc_tpu.gp.kernels import squared_exp, matern32, matern52
from bipymc_tpu.gp.regressor import GpRegressor
