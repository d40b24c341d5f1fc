"""mediastreamer2_tpu — a TPU-native real-time media-processing framework.

A ground-up re-design of the capabilities of mediastreamer2 (the Linphone
media engine) for TPU hardware:

* The reference's MSFilter/MSTicker pull-graph (one POSIX thread per stream,
  10 ms tick, refcounted mblk_t queues — see reference src/base/msticker.c,
  src/base/msfilter.c) becomes a **declarative dataflow graph compiled to a
  single batched XLA program**: thousands of concurrent call legs are rows of
  a ``[legs, samples]`` tick block, and one device step advances every leg by
  one (or K fused) 10 ms tick(s).
* Hot DSP filters (resampler, AEC, AGC, mixer, tone gen/detect, companding)
  are vectorized jnp/Pallas kernels that map onto the MXU/VPU.
* Branchy, byte-oriented work (RTP, jitter buffer, ICE, containers) stays on
  the host and exchanges fixed-shape tick buffers with the device.

Public entry points mirror the reference's layering:

* :mod:`mediastreamer2_tpu.core`      — factory / filter / graph / ticker (L1)
* :mod:`mediastreamer2_tpu.ops`       — the filter library (L3)
* :mod:`mediastreamer2_tpu.models`    — session-level graph builders (L6)
* :mod:`mediastreamer2_tpu.net`       — RTP/RTCP/jitter buffer/netsim (L4, host)
* :mod:`mediastreamer2_tpu.parallel`  — multi-chip leg sharding
"""

__version__ = "0.1.0"

from mediastreamer2_tpu.core.block import TICK_MS, Format, tick_samples  # noqa: F401
from mediastreamer2_tpu.core.filter import FilterDef, FilterCtx, register_filter  # noqa: F401
from mediastreamer2_tpu.core.factory import Factory  # noqa: F401
from mediastreamer2_tpu.core.graph import GraphBuilder  # noqa: F401
