"""Worker for the 2-process jax.distributed smoke test (test_hosts.py).

Run as: python tests/_hosts_worker.py <coordinator_port> <process_id>
Each process contributes 2 virtual CPU devices to a 2-process / 4-device
cluster, builds the global mesh via parallel/hosts.py, and runs a psum +
all_gather over it — the collective path every multi-host SPMD program in
this framework rides (SURVEY.md 5.8).
"""

import sys

import jax

# sitecustomize pre-imports jax; config.update still works pre-backend-init
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)

import jax.numpy as jnp  # noqa: E402
from jax.sharding import PartitionSpec as P  # noqa: E402


def main() -> None:
    port, pid = int(sys.argv[1]), int(sys.argv[2])

    from scgaussian_tpu.parallel import hosts

    hosts.initialize_multihost(
        coordinator_address=f"localhost:{port}", num_processes=2, process_id=pid
    )
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, jax.devices()

    mesh = hosts.global_mesh()

    def f(x):
        total = jax.lax.psum(jnp.sum(x), "data")
        ids = jax.lax.all_gather(jax.lax.axis_index("data"), "data")
        return total, ids

    # global input: device d holds value d + 1
    import numpy as np

    x = jax.make_array_from_process_local_data(
        jax.NamedSharding(mesh, P("data")),
        np.asarray([2 * pid + 1, 2 * pid + 2], np.float32),
        (4,),
    )
    total, ids = jax.jit(
        jax.shard_map(f, mesh=mesh, in_specs=P("data"),
                      out_specs=(P(), P("data")), check_vma=False)
    )(x)
    # psum over all 4 global devices: 1+2+3+4
    assert float(jax.device_get(total.addressable_shards[0].data)) == 10.0
    if hosts.is_primary():
        print("HOSTS_SMOKE_OK", flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
