"""Generate tests/golden/annex_g_stages.npz — FROZEN per-stage TX vectors.

VERDICT r3 item 5: the Annex G per-stage DATA bit tables (scrambled /
coded / interleaved bits, Tables G.13-G.24) could not be typed in from
the standard (text unavailable; transcription risk — see
test_annex_g.py's scope note). The oracle-vs-package cross-check leaves
one regression hole: a future edit could drift BOTH implementations the
same way ("symmetric oracle drift") and still pass. Closing it: this
script ran ONCE (2026-08-21) against tests/oracle_modem.py and froze
every intermediate product of the Annex G frame (16-QAM 3/4, 100-octet
PSDU, seed 1011101) as committed data; test_annex_g.py asserts both the
oracle and the package against the frozen copies, and hardcoded SHA-256
digests in the test pin the npz itself.

Deliberately NOT run by the test suite. Re-running it regenerates
byte-identical output only while the oracle is unchanged — if you need
to regenerate, the digests in test_annex_g.py must be re-derived and the
change justified in review.
"""

import hashlib
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import oracle_modem as oracle  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "golden", "annex_g_stages.npz")


def main():
    psdu = oracle.annex_g_psdu()
    st = oracle.transmit(psdu, 36, oracle.ANNEX_G_SEED)
    stages = {
        "psdu": np.frombuffer(psdu, dtype=np.uint8),
        "data_bits": st.data_bits.astype(np.uint8),
        "scrambled": st.scrambled.astype(np.uint8),
        "coded": st.coded.astype(np.uint8),
        "punctured": st.punctured.astype(np.uint8),
        "interleaved": st.interleaved.astype(np.uint8),
        "data_points": st.data_points.astype(np.complex128),
        "signal_bits": st.signal_bits.astype(np.uint8),
        "signal_points": st.signal_points.astype(np.complex128),
        "freq_symbols": st.freq_symbols.astype(np.complex128),
        "samples": st.samples.astype(np.complex128),
    }
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    # uncompressed npz: byte-stable across numpy zlib versions
    np.savez(OUT, **stages)
    for k, v in stages.items():
        digest = hashlib.sha256(np.ascontiguousarray(v).tobytes()).hexdigest()
        print(f'    "{k}": "{digest}",')
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
