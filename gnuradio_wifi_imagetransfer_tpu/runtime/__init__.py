"""Runtime layer: UDP socket-PDU bridge, loopback radio, web apps."""

from gnuradio_wifi_imagetransfer_tpu.runtime.bridge import LoopbackRadio, UdpSink, UdpSource  # noqa: F401
