from bipymc_tpu.core.rng import step_key, chain_key
from bipymc_tpu.core.scan import run_scan, run_scan_thinned
