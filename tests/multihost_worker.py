"""Worker process for the 2-process multi-host rendezvous test.

Launched by tests/test_multihost.py as ``python multihost_worker.py <pid> <port>``.
Exercises the real multi-host path the reference never had (SURVEY.md §2.9):
``jax.distributed.initialize`` (DCN rendezvous) via
``summer_clip_tpu.parallel.mesh.distributed_init``, then a psum across the
processes' devices through a global ('data','model') mesh.
"""

import os
import re
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
# one local device per process, whatever the parent env forced
_flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "",
                os.environ.get("XLA_FLAGS", ""))
os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=1").strip()

def main() -> None:
    pid, port = int(sys.argv[1]), sys.argv[2]

    import jax

    jax.config.update("jax_platforms", "cpu")

    from summer_clip_tpu.parallel.mesh import create_mesh, distributed_init

    # rendezvous BEFORE any backend/device use
    distributed_init(f"localhost:{port}", num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 2, jax.device_count()
    assert len(jax.local_devices()) == 1

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = create_mesh(data=2, model=1)

    # each process contributes one row; the jitted global sum psums over hosts
    local = np.full((1, 4), float(pid + 1), np.float32)
    arr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data", None)), local, global_shape=(2, 4))
    total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(arr)
    # P() output is replicated onto every device, so each process fetches locally
    got = float(total)
    assert got == 12.0, got  # 4*1 + 4*2

    print(f"MULTIHOST OK pid={pid} total={got}", flush=True)


if __name__ == "__main__":
    main()
