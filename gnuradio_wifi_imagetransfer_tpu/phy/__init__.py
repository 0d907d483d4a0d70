"""IEEE 802.11a PHY: parameters, TX chain, RX chain, sync, Viterbi."""

from gnuradio_wifi_imagetransfer_tpu.phy import params  # noqa: F401
