"""Hot-path ops: FIR/polyphase resampler, Pallas TPU kernels."""

from gnuradio_wifi_imagetransfer_tpu.ops.resampler import (  # noqa: F401
    design_lowpass, polyphase_resample, rational_resampler,
)
