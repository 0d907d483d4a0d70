"""TPU-native IEEE 802.11a/g OFDM software-radio framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
``OedonLestrange42/GNURadio-WiFI-ImageTransfer``: the full 802.11a PHY
(scrambler, K=7 convolutional coding + puncturing, interleaving, BPSK-64QAM
mapping, 64-point IFFT/FFT with cyclic prefix, Schmidl-Cox preamble sync,
pilot-tracked LS equalization, soft Viterbi decoding), the MAC framer, the
image-transfer application layer (Socket-PDU UDP bridge, image patchization,
SOMA-DSCN JSCE semantic codec), and a batched block-streaming executor that
replaces the GNU Radio thread-per-block scheduler with `shard_map` over a
(channel, time) TPU mesh with overlap-save halo exchange.

Design stance (see SURVEY.md section 7): batch-first, frame-parallel,
statically shaped. Sync statistics are computed densely for every sample of
a time-block; frame starts are gathered into fixed-size slots; modem stages
are jit-compiled over frame batches.
"""

__version__ = "0.1.0"

from gnuradio_wifi_imagetransfer_tpu import phy  # noqa: F401
from gnuradio_wifi_imagetransfer_tpu.config import PhyConfig, Encoding  # noqa: F401
