"""Multi-process (DCN-path) execution of the distributed bootstrap and the
production sharded NMF.

The reference's only 'cluster tooling' is two scp scripts
(``push_to_server.sh``); this framework's replacement is
``parallel.distributed.initialize_multihost`` (jax.distributed over DCN) +
mesh collectives. These tests EXECUTE that path: two real OS processes form
a jax.distributed group over localhost (the same wire protocol a multi-host
pod uses — Gloo/GRPC coordination, cross-process collectives), each
contributing 4 virtual CPU devices to one 8-device mesh.

Run in subprocesses because jax.distributed can only be initialized once
per process and must happen before backend init — impossible inside the
already-initialized pytest process.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r'''
import os, sys, json
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, %(repo)r)
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental import multihost_utils
from exemplars_vc_tpu.parallel.distributed import initialize_multihost
from exemplars_vc_tpu.parallel.sharded_nmf import sharded_nmf_activations
from exemplars_vc_tpu.factorize import nmf_activations

info = initialize_multihost(coordinator_address=f"127.0.0.1:{port}",
                            num_processes=nproc, process_id=pid)
assert info["process_count"] == nproc
devs = np.array(jax.devices())
assert len(devs) == 4 * nproc, len(devs)

# 1) cross-process collective: global sum over a process-sharded array
mesh = Mesh(devs.reshape(nproc, 4), ("data", "dict"))
x = multihost_utils.host_local_array_to_global_array(
    np.full((4, 16), float(pid + 1), np.float32), mesh, P("data", None))
s = float(jax.jit(jnp.sum)(x))
expect = 64.0 * sum(range(1, nproc + 1))
assert abs(s - expect) < 1e-5, (s, expect)

# 2) the production sharded NMF with the dictionary axis spanning processes
mesh2 = Mesh(devs.reshape(1, 4 * nproc), ("data", "dict"))
rng = np.random.default_rng(0)                 # identical data every process
X = np.abs(rng.standard_normal((32, 201))).astype(np.float32)
A = np.abs(rng.standard_normal((512, 201))).astype(np.float32)
st = sharded_nmf_activations(jnp.asarray(X), jnp.asarray(A), mesh2,
                             tol=0.0, max_iter=60)
err_sharded = float(st.error)
err_local = float(nmf_activations(jnp.asarray(X), jnp.asarray(A),
                                  tol=0.0, max_iter=60).error)
assert abs(err_sharded - err_local) < 1e-3 * max(err_local, 1.0), (
    err_sharded, err_local)
if pid == 0:
    print(json.dumps({"psum": s, "sharded_err": err_sharded,
                      "local_err": err_local}))
''' % {"repo": REPO}


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.timeout(240)
def test_two_process_distributed_sharded_nmf(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    port = str(_free_port())
    env = dict(os.environ)
    # the workers set their own platform/XLA flags before importing jax
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen([sys.executable, str(worker), str(pid), "2", port],
                              stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                              text=True, env=env, cwd=str(tmp_path))
             for pid in (0, 1)]
    outs = [p.communicate(timeout=220) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}\n{err[-2000:]}"
    import json

    payload = json.loads(outs[0][0].strip().splitlines()[-1])
    assert payload["psum"] == 192.0
    assert abs(payload["sharded_err"] - payload["local_err"]) < 1e-2
