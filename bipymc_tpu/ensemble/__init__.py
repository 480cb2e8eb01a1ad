from bipymc_tpu.ensemble.indices import sample_distinct
from bipymc_tpu.ensemble.archive import Archive, archive_init, archive_append, archive_sample
