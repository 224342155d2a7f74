"""Multi-process (multi-host-shaped) efficiency measurement.

Spawns N separate processes bootstrapped through ``jax.distributed``
against a local coordinator, each owning ``ndev`` virtual CPU devices,
and times the SAME global work on the global dp mesh:

- the sharded encode core (CRC + BWT + parallel CM — real
  data-parallel work on this backend), and
- the sharded inverse-BWT stage (the shardable decode stage; the
  scan-CM's serial step count cannot shard on the CPU backend and is
  therefore not a valid cross-process decode signal — PERF_NOTES
  R5.1).

Comparing {1 proc x 8 dev} against {2 proc x 4 dev} (same 8 global
devices, same global batch) isolates the cross-PROCESS tax: the
collective hop that rides DCN between real hosts.  Run:

    python scripts/multihostbench.py [blocks] [block_KiB]

and record the wall ratio in PERF_NOTES (north-star "scaling
efficiency at N>=2 hosts" row).
"""
import json
import os
import socket
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
K = int(sys.argv[1]) if len(sys.argv) > 1 else 16
BS_KIB = int(sys.argv[2]) if len(sys.argv) > 2 else 256

_WORKER = r"""
import os, sys, json, time

proc_id = int(sys.argv[1]); coord = sys.argv[2]; out_path = sys.argv[3]
nproc = int(sys.argv[4]); ndev = int(sys.argv[5])
K = int(sys.argv[6]); N = int(sys.argv[7])

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
    + f" --xla_force_host_platform_device_count={ndev}").strip()
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", ndev)
jax.distributed.initialize(coordinator_address=coord, num_processes=nproc,
                           process_id=proc_id, local_device_ids=list(range(ndev)))
import numpy as np
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map
sys.path.insert(0, os.environ["REPO_DIR"])
from bench import make_corpus
from bzip3_tpu.parallel import multihost as mh
from bzip3_tpu.parallel.sharding import sharded_encode_core
from bzip3_tpu.ops.device.bwt import bwt_forward_batch, bwt_inverse_batch

mesh = mh.global_mesh()
ndev_total = mesh.devices.size
assert K % ndev_total == 0
per_dev = K // ndev_total
local_k = per_dev * ndev

corpus = make_corpus(int(K * N * 1.3) + (1 << 20), seed=5)[: K * N]
rows = np.frombuffer(corpus, np.uint8).reshape(K, N)
lo = proc_id * local_k
local = rows[lo : lo + local_k]
g = mh.make_global_batch(mesh, local)
lens = mh.make_global_batch(mesh, np.full((local_k,), N, np.int32))

enc = sharded_encode_core(mesh)

def sync(x):
    # a tiny addressable gather forces execution of the whole graph
    return jax.device_get(jax.jit(lambda a: jnp.sum(a))(x))

def time_best(fn, reps=3):
    fn()  # compile/warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter(); fn(); best = min(best, time.perf_counter() - t0)
    return best

t_enc = time_best(lambda: sync(enc(g, lens, g, lens)[3]))

fwd = jax.jit(shard_map(lambda a, b: bwt_forward_batch(a, b), mesh=mesh,
                        in_specs=(P("dp"), P("dp")), out_specs=(P("dp"), P("dp")),
                        check_vma=False))
u, idx = fwd(g, lens); sync(u)
inv = jax.jit(shard_map(lambda a, b, c: bwt_inverse_batch(a, b, c), mesh=mesh,
                        in_specs=(P("dp"), P("dp"), P("dp")), out_specs=P("dp"),
                        check_vma=False))
t_inv = time_best(lambda: sync(inv(u, lens, idx)))

if jax.process_index() == 0:
    with open(out_path, "w") as f:
        json.dump({"nproc": nproc, "ndev": ndev, "K": K, "N": N,
                   "encode_s": t_enc, "inverse_bwt_s": t_inv}, f)
print("proc", proc_id, "done", flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def run_config(nproc, ndev):
    with tempfile.TemporaryDirectory() as td:
        worker = os.path.join(td, "worker.py")
        with open(worker, "w") as f:
            f.write(_WORKER)
        out_path = os.path.join(td, "out.json")
        coord = f"127.0.0.1:{_free_port()}"
        env = dict(os.environ)
        env["REPO_DIR"] = REPO
        env.pop("JAX_COMPILATION_CACHE_DIR", None)
        procs = [
            subprocess.Popen(
                [sys.executable, worker, str(i), coord, out_path,
                 str(nproc), str(ndev), str(K), str(BS_KIB << 10)],
                env=env, stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT, text=True,
            )
            for i in range(nproc)
        ]
        outs = [p.communicate(timeout=1200)[0] for p in procs]
        for i, p in enumerate(procs):
            if p.returncode != 0:
                print(outs[i])
                raise SystemExit(f"proc {i} failed")
        with open(out_path) as f:
            return json.load(f)


if __name__ == "__main__":
    base = run_config(1, 8)
    print(json.dumps(base), flush=True)
    multi = run_config(2, 4)
    print(json.dumps(multi), flush=True)
    print(
        json.dumps(
            {
                "encode_wall_ratio_2proc_vs_1proc":
                    round(multi["encode_s"] / base["encode_s"], 3),
                "inverse_bwt_wall_ratio_2proc_vs_1proc":
                    round(multi["inverse_bwt_s"] / base["inverse_bwt_s"], 3),
            }
        ),
        flush=True,
    )
