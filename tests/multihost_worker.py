"""Worker script for the 2-process jax.distributed smoke test.

Each process pins the CPU platform with 2 virtual devices, joins the
coordinator, builds the global chain mesh via
``bipymc_tpu.parallel.mesh.init_distributed`` (the mpiexec-replacement
entry point, SURVEY.md §3.2), and runs a shard_map collective over all
4 global devices. Run by tests/test_multihost.py, not by pytest directly.
"""

import os
import sys


def main():
    coord, n_proc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                               " --xla_force_host_platform_device_count=2")
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from bipymc_tpu.parallel.mesh import init_distributed, CHAIN_AXIS

    mesh = init_distributed(coordinator_address=coord,
                            num_processes=n_proc, process_id=pid)
    n_dev = mesh.devices.size
    assert n_dev == 2 * n_proc, f"global mesh has {n_dev} devices"
    assert jax.process_count() == n_proc

    # global array sharded over the chain axis; every process provides
    # its addressable shards (the DCN analogue of the MPI scatter)
    n_chains = 2 * n_dev
    sharding = NamedSharding(mesh, P(CHAIN_AXIS))
    global_vals = np.arange(n_chains, dtype=np.float32)
    x = jax.make_array_from_callback(
        (n_chains,), sharding, lambda idx: global_vals[idx])

    def local_sum(x):
        return jnp.broadcast_to(
            jax.lax.psum(jnp.sum(x), CHAIN_AXIS), x.shape)

    g = jax.jit(jax.shard_map(local_sum, mesh=mesh,
                              in_specs=P(CHAIN_AXIS),
                              out_specs=P(CHAIN_AXIS)))
    out = g(x)
    # every element should be the global sum over all processes' shards —
    # checking this process's addressable shards proves the cross-process
    # psum saw the remote data
    want = global_vals.sum()
    for shard in out.addressable_shards:
        got = np.asarray(shard.data)
        assert np.allclose(got, want), (got, want)
    print(f"proc {pid}: global psum OK ({want})", flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
