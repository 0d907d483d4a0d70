"""bench.py output contract: the driver parses the LAST stdout line of a
bench run as one JSON object with metric/value/unit/vs_baseline keys
(VERDICT r4 item 10 — protect the clean driver capture from drift).

The orchestrator half of bench.py never imports jax, so importing it here
is cheap and hermetic.
"""

import importlib.util
import io
import json
import os
import sys

import pytest

_BENCH = os.path.join(os.path.dirname(__file__), os.pardir, "bench.py")


@pytest.fixture(scope="module")
def bench():
    spec = importlib.util.spec_from_file_location("gwt_bench", _BENCH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _last_line_json(out: str) -> dict:
    lines = [ln for ln in out.strip().splitlines() if ln.strip()]
    assert lines, "no output"
    return json.loads(lines[-1])


def test_result_line_is_valid_json_with_contract_keys(bench):
    res = bench._Result()
    res.absorb({"name": "backend", "backend": "tpu"})
    res.absorb({"name": "device_step", "msps": 835.4, "t_lo_s": 0.07,
                "t_hi_s": 0.21, "k": 8, "shape": "4x16x262144",
                "tiny": False})
    res.absorb({"name": "adaptive", "mcs": 2, "fps": 2875.0})
    cap = io.StringIO()
    old = sys.stdout
    sys.stdout = cap
    try:
        res.print_line()
        # simulate a later phase landing and re-printing: the LAST line
        # must still be the full, current record
        res.absorb({"name": "adaptive_mixed", "fps": 2847.0})
        res.print_line()
    finally:
        sys.stdout = old
    obj = _last_line_json(cap.getvalue())
    assert obj["metric"] == "rx_chain_throughput_per_chip"
    assert obj["value"] == 835.4
    assert obj["unit"] == "Msamples/s"
    assert obj["vs_baseline"] == pytest.approx(
        835.4 / bench.TARGET_PER_CHIP_MSPS, rel=1e-3)
    assert obj["detail"]["adaptive_frames_per_s"]["mixed"] == 2847.0


def test_partial_run_still_produces_a_number(bench):
    """A run killed after only the early small-shape phase must still
    leave an honest value on the last line."""
    res = bench.__dict__["_Result"]()
    res.absorb({"name": "backend", "backend": "tpu"})
    res.absorb({"name": "device_small", "msps": 109.1, "tiny": False})
    cap = io.StringIO()
    old = sys.stdout
    sys.stdout = cap
    try:
        res.print_line()
    finally:
        sys.stdout = old
    obj = _last_line_json(cap.getvalue())
    assert obj["value"] == 109.1
