"""Multi-host (DCN) evidence: the sharded RX step across 2 OS processes.

BASELINE demands multi-host scaling evidence; SURVEY §4 prescribes
"multi-host tests via jax.distributed with simulated DCN (multi-process CPU
backend)". This test launches two worker processes, each contributing 4
virtual CPU devices to a global (channel=2, time=4) mesh, and runs
StreamExecutor's shard_map step over a globally-sharded stream: the
time-ring ppermute halo exchange crosses the PROCESS boundary (the DCN
path), and a frame straddling that boundary must still decode bit-exact.

The worker protocol mirrors a real pod deployment: every host synthesizes
the same global stream (in production: receives its own antenna slice),
feeds its addressable shards via jax.make_array_from_process_local_data,
and process 0 asserts the globally-gathered decode results.
"""

import os
import pathlib
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1]); port = sys.argv[2]
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=2, process_id=pid)
assert len(jax.devices()) == 8, jax.devices()

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental import multihost_utils

from gnuradio_wifi_imagetransfer_tpu.config import ExecutorConfig
from gnuradio_wifi_imagetransfer_tpu.parallel.executor import (
    StreamExecutor, HALO_LEFT, _fetch_global)
from gnuradio_wifi_imagetransfer_tpu.phy import tx
from gnuradio_wifi_imagetransfer_tpu.utils.xfer import to_riq

MCS, L, BLOCK, T, C, K = 2, 50, 4096, 4, 2, 4

# deterministic global stream on every host (simulating a shared antenna
# feed); the frame at 2*BLOCK-500 straddles the time-shard boundary that
# maps to the PROCESS boundary in this device order
rng = np.random.default_rng(42)
frames = rng.integers(0, 256, (3, L), dtype=np.uint8)
bursts = np.array(tx.transmit(jnp.asarray(frames), MCS,
                              scrambler_seed=jnp.arange(1, 4)))
n = T * BLOCK
positions = [700, 2 * BLOCK - 500, 3 * BLOCK + 900]
streams = []
for c in range(C):
    x = np.zeros(n, np.complex64)
    for pos, b in zip(positions, bursts):
        x[pos : pos + b.size] += 0.5 * b
    x += (0.005 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
          ).astype(np.complex64)
    streams.append(x)
stream = np.stack(streams)                       # (C, n)

mesh = Mesh(np.array(jax.devices()).reshape(C, T), ("channel", "time"))
cfg = ExecutorConfig(block_size=BLOCK, time_shards=T, channels=C,
                     max_frames_per_block=K)
ex = StreamExecutor(tx.tx_plan(MCS, L), mesh=mesh, exec_cfg=cfg)

blocks = to_riq(ex._layout(stream, 0))           # (C, T, BLOCK, 2) global
sharding = NamedSharding(mesh, P("channel", "time"))
# global_shape=blocks.shape: every host holds the full stream and jax
# extracts its local slices (omitting it doubles the leading sharded dim)
garr = jax.make_array_from_process_local_data(sharding, blocks, blocks.shape)
out = ex._step(garr)                             # shard_map: ppermute over DCN
full = _fetch_global(out)                        # hosts exchange shards
if pid == 0:
    psdu, valid, starts, cfo, rate_idx, length, parity, snr = ex._unpack(full)
    got = set()
    for ci, ti, ki in np.argwhere((valid != 0) & (parity != 0)):
        got.add((int(ci), tuple(psdu[ci, ti, ki])))
    want = {(ci, tuple(f)) for ci in range(C) for f in frames}
    missing = want - got
    assert not missing, f"missing {len(missing)} frames across hosts"
    print("MULTIHOST_OK frames=%d" % len(got))
jax.distributed.shutdown()
"""


def test_two_process_dcn_decode(tmp_path):
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    # the worker script lives in tmp_path, so the repo root is neither the
    # script dir nor guaranteed installed — put it on PYTHONPATH explicitly
    repo_root = str(pathlib.Path(__file__).resolve().parent.parent)
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen([sys.executable, str(script), str(pid), port],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         env=env, text=True)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost worker timed out")
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
    assert "MULTIHOST_OK" in outs[0], outs[0][-3000:]


_ADAPTIVE_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1]); port = sys.argv[2]
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=2, process_id=pid)
assert len(jax.devices()) == 8 and jax.process_count() == 2

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh
from gnuradio_wifi_imagetransfer_tpu.config import ExecutorConfig
from gnuradio_wifi_imagetransfer_tpu.parallel.executor import (
    AdaptiveStreamExecutor)
from gnuradio_wifi_imagetransfer_tpu.phy import tx

BLOCK, T = 4096, 8

# mixed-MCS traffic: (mcs, length) varies per frame and one frame
# straddles the process boundary (shard 3|4 seam at 4*BLOCK)
rng = np.random.default_rng(7)
specs = [(0, 40), (5, 64), (2, 50), (5, 64), (0, 40)]
n = T * BLOCK
positions = [900, BLOCK + 1200, 4 * BLOCK - 700, 5 * BLOCK + 400,
             6 * BLOCK + 2000]
stream = (0.004 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
          ).astype(np.complex64)
frames = []
for (mcs, ln), pos in zip(specs, positions):
    f = rng.integers(0, 256, (1, ln), dtype=np.uint8)
    b = np.array(tx.transmit(jnp.asarray(f), mcs))[0]
    stream[pos : pos + b.size] += 0.5 * b
    frames.append((mcs, ln, pos, f[0]))

cfg = ExecutorConfig(block_size=BLOCK, time_shards=T, max_frames_per_block=4)
mesh = Mesh(np.array(jax.devices()).reshape(1, T), ("channel", "time"))
ex = AdaptiveStreamExecutor(mesh=mesh, exec_cfg=cfg)
recs = ex.run(stream[None, :])
got = {(r.rate_idx, r.length, r.global_start): tuple(r.psdu)
       for r in recs if r.parity_ok}

# parity with the local (single-process resident) executor on this host
ex_local = AdaptiveStreamExecutor(mesh=None, exec_cfg=ExecutorConfig(
    block_size=BLOCK, time_shards=2, max_frames_per_block=4))
recs_local = ex_local.run(stream[None, :])
got_local = {(r.rate_idx, r.length, r.global_start): tuple(r.psdu)
             for r in recs_local if r.parity_ok}

for mcs, ln, pos, payload in frames:
    hits = [k for k in got if k[0] == mcs and k[1] == ln
            and abs(k[2] - pos) < 50]
    assert hits, f"pid{pid}: ({mcs},{ln}) at {pos} missing from mesh run"
    assert got[hits[0]] == tuple(payload), f"pid{pid}: payload mismatch"
assert got == got_local, (
    f"pid{pid}: mesh/local divergence: {set(got) ^ set(got_local)}")
print("ADAPTIVE_MULTIHOST_OK frames=%d" % len(got))
jax.distributed.shutdown()
"""


def test_two_process_dcn_adaptive_mixed_mcs(tmp_path):
    """The flagship receiver across 2 OS processes (VERDICT r4 item 3):
    stage-A SIGNAL decode runs sharded over the DCN mesh, hosts exchange
    packed shards, and the replicated host dispatch + stage-B bucket
    decodes must match the local executor exactly on mixed-MCS traffic."""
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])
    script = tmp_path / "adaptive_worker.py"
    script.write_text(_ADAPTIVE_WORKER)
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    repo_root = str(pathlib.Path(__file__).resolve().parent.parent)
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen([sys.executable, str(script), str(pid), port],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         env=env, text=True)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("adaptive multihost worker timed out")
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
    for out in outs:
        assert "ADAPTIVE_MULTIHOST_OK" in out, out[-3000:]
