"""Channel simulation: waveform impairments, Saleh-Valenzuela geometry,
IRS steering-vector channels."""

from gnuradio_wifi_imagetransfer_tpu.channel.model import channel_model, awgn, apply_cfo  # noqa: F401
from gnuradio_wifi_imagetransfer_tpu.channel.sv import SVChannel  # noqa: F401
from gnuradio_wifi_imagetransfer_tpu.channel.irs import IRSChannel, ClusteredIRSChannel  # noqa: F401
