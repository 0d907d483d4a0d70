"""JSCE semantic codec (SOMA-DSCN) and the SOMANet multi-user models, in Flax."""

from gnuradio_wifi_imagetransfer_tpu.models.jsce import JSCE  # noqa: F401
from gnuradio_wifi_imagetransfer_tpu.models.encoder import Encoder  # noqa: F401
from gnuradio_wifi_imagetransfer_tpu.models.decoder import Decoder, DecoderPE, DecoderSA  # noqa: F401
