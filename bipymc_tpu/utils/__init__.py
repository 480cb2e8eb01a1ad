from bipymc_tpu.utils.init import var_ball
from bipymc_tpu.utils.diagnostics import (
    gelman_rubin,
    effective_sample_size,
    integrated_autocorr_time,
    acceptance_fraction,
    ess_bulk, ess_multichain,
    mcse_mean,
    mcse_sd,
    ess_tail,
    geweke,
    multivariate_rhat,
)
from bipymc_tpu.utils.debug import validate_log_prob
from bipymc_tpu.utils.laplace import map_estimate, laplace_cov, map_laplace
from bipymc_tpu.utils.profiling import time_fn
from bipymc_tpu.utils.transforms import Transform, constrain, transform_log_prob
from bipymc_tpu.utils.flows import (FlowConfig, FlowParams, fit_flow,
                                    flow_forward, flow_inverse,
                                    flow_log_q, flow_proposal,
                                    flow_sample, flow_transform)
from bipymc_tpu.utils.mixtures import (GmmParams, fit_gmm, gmm_log_q,
                                       gmm_marginal_std, gmm_proposal,
                                       gmm_sample)
from bipymc_tpu.utils.proposals import Proposal
from bipymc_tpu.utils.sbc import sbc_ranks, sbc_uniformity
from bipymc_tpu.utils.psis import (psis, gpd_fit, importance_ess,
                                   importance_resample, weighted_moments,
                                   surrogate_reweight)
from bipymc_tpu.utils.loo import loo, loo_compare, pointwise_loglik, waic
