"""Filter library — importing this package registers all builtin filters
(the analogue of the reference's awk-generated basedescs.h/voipdescs.h
tables, src/base/msfactory.c:193-194, src/voip/msvoip.c:297-298)."""

from mediastreamer2_tpu.ops import boundary    # noqa: F401
from mediastreamer2_tpu.ops import misc        # noqa: F401
from mediastreamer2_tpu.ops import g711        # noqa: F401
from mediastreamer2_tpu.ops import fileio      # noqa: F401
from mediastreamer2_tpu.ops import resample    # noqa: F401
from mediastreamer2_tpu.ops import volume      # noqa: F401
from mediastreamer2_tpu.ops import mixer       # noqa: F401
from mediastreamer2_tpu.ops import tones       # noqa: F401
from mediastreamer2_tpu.ops import aec         # noqa: F401
from mediastreamer2_tpu.ops import plc         # noqa: F401
from mediastreamer2_tpu.ops import vad         # noqa: F401
from mediastreamer2_tpu.ops import flowcontrol # noqa: F401
from mediastreamer2_tpu.ops import eq          # noqa: F401
from mediastreamer2_tpu.ops import video       # noqa: F401
from mediastreamer2_tpu.ops import baudot      # noqa: F401
from mediastreamer2_tpu.ops import adpcm       # noqa: F401
from mediastreamer2_tpu.ops import g722        # noqa: F401
from mediastreamer2_tpu.ops import g726        # noqa: F401
