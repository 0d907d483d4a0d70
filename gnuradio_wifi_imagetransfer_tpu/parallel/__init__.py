"""Parallel runtime: device meshes, halo exchange, streaming executor."""

from gnuradio_wifi_imagetransfer_tpu.parallel.mesh import make_mesh  # noqa: F401
from gnuradio_wifi_imagetransfer_tpu.parallel.executor import (  # noqa: F401
    AdaptiveStreamExecutor,
    FrameRecord,
    StreamExecutor,
)
from gnuradio_wifi_imagetransfer_tpu.parallel.adaptive import (  # noqa: F401
    AdaptiveFrame,
    AdaptiveReceiver,
)
