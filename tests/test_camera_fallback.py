"""Dead-camera watchdog: ext camera stops feeding -> static fallback
(reference: videostream.c dead_camera_check + nowebcam substitution)."""
import numpy as np

from mediastreamer2_tpu.core.block import Format
from mediastreamer2_tpu.models.video_stream import VideoStreamBatch


def test_dead_camera_falls_back(factory):
    fmt = Format(kind="yuv420", width=64, height=48, fps=25.0)
    vs = VideoStreamBatch(factory, 1, fmt=fmt, camera="ext", fps=25.0)
    vs.ticker.realtime = False
    vs.ticker.warm_up()
    live = np.full((48 * 3 // 2, 64), 0.25, np.float32)
    outs = []
    vs.ticker.set_io(pull=vs._pull,
                     push=lambda t, o: outs.append(np.asarray(o["tx_frames"])))
    for t in range(220):
        if t < 50:
            vs.feed_camera_frame(0, live)
        vs.ticker.do_tick()
    assert vs.stats[0].camera_fallbacks == 1
    assert vs._cam_dead[0]
    # early frames show the live feed; late frames show the fallback card
    # tx_frames cross the boundary as uint8 now (u8 ext contract)
    assert abs(float(outs[10][0].mean()) / 255.0 - 0.25) < 0.02
    assert abs(float(outs[-1][0].mean()) / 255.0 - 0.25) > 0.05
    # camera recovery clears the dead flag
    vs.feed_camera_frame(0, live)
    vs.ticker.do_tick()
    assert not vs._cam_dead[0]
