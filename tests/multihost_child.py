"""Child process for tests/test_multihost.py — one JAX process of a
2-process local-coordinator cluster (CPU backend, 2 virtual devices each).

Run: python multihost_child.py <coordinator_port> <process_id>
Prints PROBE lines the parent asserts on.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    port, pid = int(sys.argv[1]), int(sys.argv[2])
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from stable_diffusion_videos_tpu.parallel.multihost import \
        initialize_multihost

    mesh = initialize_multihost(coordinator_address=f"localhost:{port}",
                                num_processes=2, process_id=pid)
    print(f"PROBE processes={jax.process_count()} "
          f"local={jax.local_device_count()} global={jax.device_count()}",
          flush=True)
    assert jax.process_count() == 2
    assert jax.device_count() == 4
    assert dict(mesh.shape) == {"data": 4, "model": 1}

    # one tiny sharded dispatch over the GLOBAL mesh: batch rows live on
    # different hosts; the sum needs a cross-process all-reduce over DCN
    # (here: the local gRPC transport)
    from jax.sharding import NamedSharding, PartitionSpec as P
    sharding = NamedSharding(mesh, P("data"))
    global_shape = (4, 8)
    local = np.arange(global_shape[0] * global_shape[1],
                      dtype=np.float32).reshape(global_shape)[
                          pid * 2:(pid + 1) * 2]
    arr = jax.make_array_from_process_local_data(sharding, local,
                                                 global_shape)

    @jax.jit
    def step(x):
        return (x * 2.0).sum()

    out = step(arr)
    # fetch the (replicated) scalar result on this host
    val = float(np.asarray(jax.device_get(out)))
    print(f"PROBE result={val}", flush=True)
    expected = float(np.arange(32, dtype=np.float32).sum() * 2)
    assert val == expected, (val, expected)
    print("PROBE ok", flush=True)


if __name__ == "__main__":
    main()
