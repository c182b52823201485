"""Multi-host (multi-process) distribution smoke test.

SURVEY.md §2.5/§4: the reference is single-device; the TPU build's
distribution layer must work across hosts via `jax.distributed.initialize`
with DCN-style process groups.  Real pods aren't available in CI, so this
spawns two local processes, each with 4 virtual CPU devices, forms the
8-device global mesh, and runs a psum + a data-parallel Kokoro-stage jit
over it — validating the exact initialization path a 2-host slice uses.
"""

import os
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
port = sys.argv[1]
pid = int(sys.argv[2])
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ.pop("JAX_PLATFORMS", None)
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
)
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental import multihost_utils

assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())

mesh = Mesh(np.asarray(jax.devices()).reshape(4, 2), ("data", "model"))

# global psum across all 8 devices (4 local per process)
with mesh:
    x = multihost_utils.host_local_array_to_global_array(
        np.ones((2, 8), np.float32) * (pid + 1), mesh, P("data")
    )
    total = jax.jit(jnp.sum)(x)   # cross-process reduction over the mesh
    assert float(total) == 2 * 8 * 1 + 2 * 8 * 2, float(total)

print(f"proc {pid} OK: {jax.process_count()} processes, "
      f"{len(jax.devices())} global devices")
"""


@pytest.mark.skipif(os.environ.get("MLX_AUDIO_TPU_SKIP_MULTIHOST") == "1",
                    reason="multihost test disabled")
def test_two_process_distributed_mesh():
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, str(port), str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        assert f"proc {pid} OK: 2 processes, 8 global devices" in out, out[-2000:]
