"""Hot-path ops: FIR/polyphase resampler + Pallas TPU kernels
(pallas_viterbi, pallas_fir, pallas_sync)."""

from gnuradio_wifi_imagetransfer_tpu.ops.resampler import (  # noqa: F401
    correct_sample_clock,
    design_lowpass,
    fir_filter,
    polyphase_resample,
    rational_resampler,
)
