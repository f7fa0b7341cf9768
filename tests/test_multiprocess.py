"""True multi-PROCESS distributed test: two OS processes, 4 virtual CPU
devices each, joined by ``jax.distributed.initialize`` (gloo CPU
collectives) -- the closest single-machine analogue of a multi-host TPU
pod. Exercises the framework's own multi-host wiring
(parallel.mesh.maybe_initialize_distributed / make_mesh / all_reduce_dict /
is_master) rather than bare JAX.

The reference ships NCCL process-group helpers with no caller and no test
(/root/reference/torch_utils/distributed_utils.py:31-191); this covers the
replacement for real.
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent("""
    import os, sys
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    pid = int(sys.argv[1]); port = sys.argv[2]
    sys.path.insert(0, os.environ["REPO"])
    from fourk_nerf_tpu.parallel import mesh as pmesh
    ok = pmesh.maybe_initialize_distributed(
        enable=True, coordinator_address=f"localhost:{port}",
        num_processes=2, process_id=pid)
    assert ok and jax.process_count() == 2, (ok, jax.process_count())
    assert len(jax.devices()) == 8, len(jax.devices())
    assert pmesh.is_master() == (pid == 0)

    import jax.numpy as jnp
    m = pmesh.make_mesh()  # 8 x 1 (data, grid)
    # per-device metric values 0..7 -> mean 3.5 on every process
    vals = pmesh.all_reduce_dict(m, {"loss": jnp.arange(8.0)})
    got = float(jax.device_get(vals["loss"]))
    assert abs(got - 3.5) < 1e-6, got
    print(f"MPOK {pid} {got}", flush=True)
""")


@pytest.mark.slow
def test_two_process_mesh_all_reduce(tmp_path):
    wf = tmp_path / "worker.py"
    wf.write_text(_WORKER)
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = str(s.getsockname()[1])
    env = dict(os.environ, REPO=os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen([sys.executable, str(wf), str(i), port],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, env=env, text=True)
             for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        assert f"MPOK {i} 3.5" in out, out[-2000:]
