"""Benchmark: streaming 802.11a RX on one TPU chip — honest and broad.

Three measurements (VERDICT r1 item 4 / BASELINE north-star metrics):

  1. ``device_step`` — the PRIMARY metric: the jitted RX chain
     (sync statistics, detection, CFO, OFDM demod, equalize, Viterbi)
     in Msamples/s/chip — BASELINE's "Msamples/s/chip through the RX
     chain" — measured as the MARGINAL rate of a k-iteration on-device
     scan so relay dispatch overhead and memoization cancel out (see
     bench_device_step).
  2. ``pipeline``   — StreamExecutor.run() end-to-end (host layout +
     device_put + jitted step + collect). NOTE: on this rig the chip
     sits behind a network tunnel, so ingest/fetch pay a per-transfer
     round trip a host-attached TPU (PCIe DMA) does not; the pipeline
     number here measures the tunnel, and is reported as detail.
  3. ``frames_per_s`` per MCS 0..7 — dense frame streams decoded through
     the SIGNAL-steered AdaptiveStreamExecutor (runtime rate detection +
     per-(rate,length) payload decode), BASELINE's "frames/s decoded
     across BPSK-1/2..64QAM-3/4".

Plus a channel-count sweep of the device step (scaling protocol ready for
multi-chip runs). Sanity: every embedded frame must be recovered
bit-exact — a run that drops frames fails loudly.

MEASUREMENT GOTCHAS (verified 2026-08-20): the relay backend (a) memoizes
byte-identical dispatches — re-running the same program on the same bytes
returns in ~0.1 ms, (b) has tens-of-ms per-dispatch overhead, and (c)
block_until_ready does not reliably synchronize — only fetching a result
does. Naive timing loops therefore read anywhere from overhead-bound to
~1000x too high. The device-step uses a k-iteration on-device scan with
per-iteration input scaling and fetch-forced sync; the host-coupled
pipeline/adaptive timings perturb one input sample per run (_perturb) so
no run is memoized.

Baseline anchor: BASELINE.json's north-star of >= 1 Gsample/s aggregate on
a v5e-16 slice == 62.5 Msamples/s/chip; vs_baseline is the device-step
number against that per-chip target. (The GNU Radio reference runs its RX
at its radio's sample rate — 1-20 MS/s per process, IRS_AP.py:88-91.)

The TX streams are synthesized by a CPU-backend subprocess: the tunneled
axon compile service wedges when the TX graph compiles before the big RX
step in the same process, and the bench must only measure RX anyway.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "detail"}.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from dataclasses import replace as dataclasses_replace

import numpy as np

MCS = 2
PSDU_LEN = 50
# Large super-blocks amortize the tunneled backend's fixed per-dispatch
# cost (~10s of ms per jit call + per-fetch round trip): 4 channels x
# 16 x 256k = 16.8M samples per step.
BLOCK = 1 << 18
CHANNELS = 4
TIME_BLOCKS = 16
MAX_FRAMES = 4
TARGET_PER_CHIP_MSPS = 62.5
FRAMES_PER_BLOCK = 3       # embedded frames per time-block per channel
DENSE_BLOCKS = 4           # per-MCS dense stream: 4 * 256k samples
DENSE_MAX_FRAMES = 32
STREAM_CACHE = "/tmp/gwt_bench_streams_v4.npz"

_GEN_SNIPPET = r"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp
from gnuradio_wifi_imagetransfer_tpu.phy import tx

(MCS, PSDU_LEN, BLOCK, CHANNELS, TIME_BLOCKS, FRAMES_PER_BLOCK,
 DENSE_BLOCKS, DENSE_MAX_FRAMES) = {params}
rng = np.random.default_rng(0)
out = {{}}

# --- primary multi-channel stream (fixed MCS) ---
n = TIME_BLOCKS * BLOCK
n_frames = FRAMES_PER_BLOCK * TIME_BLOCKS
streams, payloads = [], []
for c in range(CHANNELS):
    frames = rng.integers(0, 256, (n_frames, PSDU_LEN), dtype=np.uint8)
    bursts = np.array(tx.transmit(jnp.asarray(frames), MCS))
    x = np.zeros(n, np.complex64)
    gap = n // n_frames
    for i, b in enumerate(bursts):
        pos = min(150 + i * gap, n - b.size - 1)
        x[pos : pos + b.size] += 0.5 * b
    x += 0.01 * (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)
    streams.append(x.astype(np.complex64))
    payloads.append(frames)
out["primary"] = np.stack(streams)
out["primary_payloads"] = np.stack(payloads)

# --- dense single-channel stream per MCS (frames/s metric) ---
for mcs in range(8):
    n = DENSE_BLOCKS * BLOCK
    burst_len = tx.tx_plan(mcs, PSDU_LEN).n_samples
    spacing = max(burst_len + 500, BLOCK // DENSE_MAX_FRAMES + 1)
    positions = list(range(300, n - burst_len - 800, spacing))
    frames = rng.integers(0, 256, (len(positions), PSDU_LEN), dtype=np.uint8)
    bursts = np.array(tx.transmit(
        jnp.asarray(frames), mcs,
        scrambler_seed=jnp.asarray(np.arange(len(positions)) % 127 + 1)))
    x = np.zeros(n, np.complex64)
    for pos, b in zip(positions, bursts):
        x[pos : pos + b.size] += 0.5 * b
    x += 0.01 * (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)
    out[f"dense{{mcs}}"] = x.astype(np.complex64)
    out[f"dense{{mcs}}_payloads"] = frames
np.savez({path!r}, **out)
print("streams written")
"""


def build_streams() -> dict:
    if not os.path.exists(STREAM_CACHE):
        snippet = _GEN_SNIPPET.format(
            params=(MCS, PSDU_LEN, BLOCK, CHANNELS, TIME_BLOCKS,
                    FRAMES_PER_BLOCK, DENSE_BLOCKS, DENSE_MAX_FRAMES),
            path=STREAM_CACHE,
        )
        subprocess.run([sys.executable, "-c", snippet], check=True,
                       capture_output=True, timeout=1200)
    return dict(np.load(STREAM_CACHE))


def _perturb(stream: np.ndarray, i: int) -> np.ndarray:
    """Flip one noise-floor sample so dispatch i is byte-distinct from
    dispatch i-1 — defeats the tunnel's identical-dispatch memoization
    without affecting decodability (one sample of extra noise)."""
    if i == 0:
        return stream
    v = stream.copy()
    v.flat[7] += 0.001 * i
    return v


def bench_device_step(ex, stream, k_hi=8, channels=None):
    """On-chip RX-chain compute rate, measured memoization-proof.

    The relay backend both memoizes byte-identical dispatches AND has a
    per-dispatch overhead of tens of ms, so neither repeat-timing nor
    distinct-buffer dispatch loops measure the chip (verified 2026-08-20:
    repeats read ~1000x high, per-dispatch loops read overhead, not
    compute). Instead ONE dispatch runs the full RX step k times inside
    a lax.scan, each iteration on a differently-scaled copy of the input
    (so no iteration can be folded or cached), and every iteration's
    output is sum-reduced into the fetched result (so none can be dead-
    code-eliminated). The marginal rate (t(k_hi) - t(1)) / (k_hi - 1)
    cancels the dispatch/fetch overhead. Timing is synchronized by
    FETCHING the (tiny) result — block_until_ready under-reports here."""
    import jax
    import jax.numpy as jnp
    from gnuradio_wifi_imagetransfer_tpu.utils.xfer import to_riq

    if channels is not None:
        stream = stream[:channels]
    blocks = jnp.asarray(to_riq(ex._layout(stream, 0)))

    def make(k):
        @jax.jit
        def fn(b):
            def body(carry, i):
                out = ex._step(b * (1.0 + 1e-5 * i))
                return carry, jnp.sum(out)
            _, sums = jax.lax.scan(
                body, 0.0, jnp.arange(1, k + 1, dtype=jnp.float32))
            return sums
        return fn

    def timed(fn):
        _ = np.asarray(fn(blocks))         # compile + warmup (memoized after)
        best = float("inf")
        for r in range(2):                 # two timed reps, keep the best
            bp = blocks * (1.0 + 1e-6 * (r + 1))   # new bytes -> no memo
            jax.block_until_ready(bp)
            t0 = time.perf_counter()
            _ = np.asarray(fn(bp))
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo, t_hi = timed(make(1)), timed(make(k_hi))
    marginal = max((t_hi - t_lo) / (k_hi - 1), 1e-9)
    samples = stream.shape[0] * TIME_BLOCKS * BLOCK
    return samples / marginal / 1e6, (t_lo, t_hi)


def _probe_backend(timeout_s: float = 180.0) -> str:
    """Return the usable backend name, flipping this process to the CPU
    backend if the (tunneled) accelerator does not answer a trivial op in
    time — a dead tunnel must yield an honest CPU number, not a hung
    bench. The probe runs in a SUBPROCESS: a wedged PJRT call can hang
    while holding the GIL, which would deadlock any in-process timeout."""
    code = ("import jax, jax.numpy as jnp;"
            "jax.jit(lambda x: x * 2)(jnp.ones(2)).block_until_ready();"
            "print('BACKEND', jax.default_backend())")
    err = "probe failed"
    try:
        r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                           text=True, timeout=timeout_s)
        for line in r.stdout.splitlines():
            if line.startswith("BACKEND "):
                return line.split()[1]
        err = (r.stderr or r.stdout)[-300:]
    except subprocess.TimeoutExpired:
        err = f"no response in {timeout_s:.0f}s (tunnel wedged)"
    sys.stderr.write(f"bench: accelerator probe failed ({err}); "
                     "falling back to the CPU backend\n")
    # no jax op has run in THIS process yet, so the lazy backend can still
    # be redirected (same trick as tests/conftest.py)
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["GWT_BENCH_CPU_FALLBACK"] = "1"
    import jax

    jax.config.update("jax_platforms", "cpu")
    return "cpu"


def _progress(msg: str):
    sys.stderr.write(f"bench[{time.strftime('%H:%M:%S')}] {msg}\n")
    sys.stderr.flush()


def main():
    backend = _probe_backend()
    _progress("backend probed")
    data = build_streams()
    _progress("streams ready")
    stream = data["primary"]
    payloads = data["primary_payloads"]

    from gnuradio_wifi_imagetransfer_tpu.config import ExecutorConfig
    from gnuradio_wifi_imagetransfer_tpu.parallel.executor import (
        AdaptiveStreamExecutor,
        StreamExecutor,
    )
    from gnuradio_wifi_imagetransfer_tpu.phy import tx

    plan = tx.tx_plan(MCS, PSDU_LEN)
    cfg = ExecutorConfig(block_size=BLOCK, time_shards=TIME_BLOCKS,
                         channels=CHANNELS, max_frames_per_block=MAX_FRAMES,
                         wire_format="sc16")
    ex = StreamExecutor(plan, mesh=None, exec_cfg=cfg)

    # --- 1. device step (PRIMARY) + channel sweep ---
    device_msps, (t_lo, t_hi) = bench_device_step(ex, stream)
    _progress(f"device step {device_msps:.0f} Msps "
              f"(t1={t_lo*1e3:.0f}ms t8={t_hi*1e3:.0f}ms)")
    sweep = {}
    for c in (1, CHANNELS):
        msps, _ = bench_device_step(ex, stream, k_hi=4, channels=c)
        sweep[f"channels={c}"] = round(msps, 2)
    _progress(f"sweep {sweep}")

    # --- 2. end-to-end pipeline: run() incl. ingest + collect ---
    # wire format = sc16 (UHD's native int16 I/Q): the primary number
    # reflects what an SDR front-end actually ships to the device
    def time_pipeline(executor, n_iters=2):
        recs = executor.run(stream)        # warmup (compile already done)
        variants = [_perturb(stream, i + 1) for i in range(n_iters)]
        t0 = time.perf_counter()
        for v in variants:
            recs = executor.run(v)
        return stream.size * n_iters / (time.perf_counter() - t0) / 1e6, recs

    want = {tuple(f) for ch in payloads for f in ch}
    pipeline_msps, records = time_pipeline(ex)
    got = {tuple(r.psdu) for r in records if r.parity_ok}
    n_embedded = CHANNELS * TIME_BLOCKS * FRAMES_PER_BLOCK
    assert got >= want, (
        f"pipeline sanity: only {len(got & want)}/{n_embedded} embedded "
        f"frames recovered bit-exact")
    _progress(f"pipeline sc16 {pipeline_msps:.2f} Msps")
    ex_f32 = StreamExecutor(plan, mesh=None, exec_cfg=dataclasses_replace(
        cfg, wire_format="f32"))
    pipeline_f32_msps, _ = time_pipeline(ex_f32, n_iters=1)
    _progress(f"pipeline f32 {pipeline_f32_msps:.2f} Msps")

    # --- 3. frames/s per MCS through the SIGNAL-steered executor ---
    fps = {}
    acfg = ExecutorConfig(block_size=BLOCK, time_shards=DENSE_BLOCKS,
                          max_frames_per_block=DENSE_MAX_FRAMES,
                          wire_format="sc16")
    aex = AdaptiveStreamExecutor(mesh=None, exec_cfg=acfg)
    for mcs in range(8):
        x = data[f"dense{mcs}"][None]
        frames = data[f"dense{mcs}_payloads"]
        aex.run(x)                         # warmup/compile for this plan
        x_timed = _perturb(x, 1)           # byte-distinct: defeat memoization
        t0 = time.perf_counter()
        recs = aex.run(x_timed)
        dt = time.perf_counter() - t0
        got = {tuple(r.psdu) for r in recs if r.parity_ok and r.rate_idx == mcs}
        want = {tuple(f) for f in frames}
        assert got >= want, (
            f"MCS{mcs} sanity: {len(got & want)}/{len(want)} frames recovered")
        fps[f"mcs{mcs}"] = round(len(frames) / dt, 1)
        _progress(f"adaptive mcs{mcs} {fps[f'mcs{mcs}']} f/s")

    print(json.dumps({
        "metric": "rx_chain_throughput_per_chip",
        "value": round(device_msps, 2),
        "unit": "Msamples/s",
        "vs_baseline": round(device_msps / TARGET_PER_CHIP_MSPS, 4),
        "detail": {
            "backend": backend + (
                " (CPU FALLBACK: accelerator tunnel unresponsive)"
                if os.environ.get("GWT_BENCH_CPU_FALLBACK") else ""),
            "device_step_sweep": sweep,
            "pipeline_sc16_msps": round(pipeline_msps, 2),
            "pipeline_f32_msps": round(pipeline_f32_msps, 2),
            "adaptive_frames_per_s": fps,
            "note": "value = marginal on-chip rate of the jitted RX chain "
                    "(k-step scan, fetch-synced; defeats the relay's "
                    "dispatch memoization and cancels its per-dispatch "
                    "overhead). "
                    "pipeline = StreamExecutor.run() end-to-end (ingest + "
                    "step + collect) with sc16 int16-I/Q wire format; on "
                    "this rig it is bound by the network tunnel's "
                    "per-transfer round trips, which a host-attached TPU's "
                    "PCIe DMA does not pay. All embedded frames verified "
                    "bit-exact; frames/s = dense 50B-PSDU streams through "
                    "the SIGNAL-steered AdaptiveStreamExecutor",
        },
    }))


if __name__ == "__main__":
    main()
