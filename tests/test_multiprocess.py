"""Real multi-process jax.distributed exercise (VERDICT round-1 item 7).

Spawns TWO separate Python processes that bootstrap jax.distributed
against a local coordinator, build the global dp mesh, assemble a
process-sharded global batch, run the sharded encode core, and gather
the payloads to the writer process — which byte-compares the assembled
blocks against the single-process oracle encoding.

This is the pthread-pool-equivalent coverage the reference gets from
its CI (SURVEY.md §2 parallel block API): here the "threads" are
processes and the barrier is the collective.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys, pickle

proc_id = int(sys.argv[1])
coord = sys.argv[2]
out_path = sys.argv[3]
nproc = int(sys.argv[4])
ndev = int(sys.argv[5])

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + f" --xla_force_host_platform_device_count={ndev}"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", ndev)

jax.distributed.initialize(
    coordinator_address=coord, num_processes=nproc, process_id=proc_id,
    local_device_ids=list(range(ndev)),
)

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, os.environ["REPO_DIR"])
from bzip3_tpu.parallel import multihost as mh
from bzip3_tpu.parallel.sharding import sharded_encode_core

K = nproc * ndev  # one row per device
assert jax.process_count() == nproc, jax.process_count()
mesh = mh.global_mesh()
assert mesh.devices.size == K

N = 512
rng = np.random.default_rng(7)
all_rows = rng.integers(97, 123, (K, N), dtype=np.uint8)  # same seed everywhere
local = all_rows[proc_id * ndev : proc_id * ndev + ndev]
g = mh.make_global_batch(mesh, local)
lens = mh.make_global_batch(mesh, np.full((ndev,), N, np.int32))

enc = sharded_encode_core(mesh)
crc, idx, payload, plens, ok, total = enc(g, lens, g, lens)
pay_np, plens_np = mh.gather_to_writer(payload, plens)
crc_np, _ = mh.gather_to_writer(crc, plens)
idx_np, _ = mh.gather_to_writer(idx, plens)
ok_np, _ = mh.gather_to_writer(ok, plens)

if jax.process_index() == 0:
    with open(out_path, "wb") as f:
        pickle.dump(
            {
                "payloads": [pay_np[i, : plens_np[i]].tobytes() for i in range(K)],
                "crc": np.asarray(crc_np).tolist(),
                "idx": np.asarray(idx_np).tolist(),
                "ok": np.asarray(ok_np).tolist(),
                "total": int(total),
                "rows": all_rows,
            },
            f,
        )
else:
    assert pay_np is None  # non-writer retains nothing
print("proc", proc_id, "done")
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
@pytest.mark.parametrize(
    "nproc,ndev",
    [(2, 2), (4, 1)],
    ids=["2proc_x_2dev", "4proc_x_1dev"],
)
def test_multi_process_distributed_encode(tmp_path, nproc, ndev):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    out_path = tmp_path / "result.pkl"
    coord = f"127.0.0.1:{_free_port()}"

    env = dict(os.environ)
    env["REPO_DIR"] = repo
    env.pop("JAX_COMPILATION_CACHE_DIR", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), coord, str(out_path),
             str(nproc), str(ndev)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(nproc)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"proc {i} failed:\n{outs[i]}"

    import pickle
    import numpy as np

    with open(out_path, "rb") as f:
        res = pickle.load(f)

    # Byte-compare every gathered block against the oracle encoder.
    import struct

    from bzip3_tpu.models.block_codec import encode_block

    k_total = nproc * ndev
    assert all(res["ok"])
    assert len(res["payloads"]) == k_total
    for i in range(k_total):
        row = res["rows"][i].tobytes()
        ref = encode_block(row)
        # oracle block = crc(4) + bwt_idx(4) + model(1) + payload
        assert struct.unpack("<I", ref[:4])[0] == res["crc"][i] & 0xFFFFFFFF
        assert struct.unpack("<i", ref[4:8])[0] == res["idx"][i]
        assert ref[9:] == res["payloads"][i], f"block {i} payload mismatch"
    assert res["total"] == sum(len(p) for p in res["payloads"])
