"""CLI tool parity (reference tools/: tones.c, msaudiocmp.c,
mtudiscover.c, pcap_playback.c, recorder.c, mkvstream.c — each has a
subcommand in tools/mediastream.py)."""
import os
import socket
import sys
import threading
import types

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
import mediastream as cli  # noqa: E402

SCEN = "/root/reference/tester/scenarios"


def _ns(**kw):
    return types.SimpleNamespace(**kw)


def test_tones_generate_detect(tmp_path):
    out = str(tmp_path / "tones.wav")
    with pytest.raises(SystemExit) as e:
        cli.cmd_tones(_ns(digits="14#", rate=8000, duration_ms=80,
                          outfile=out))
    assert e.value.code == 0
    assert os.path.exists(out)


def test_audiocmp(tmp_path):
    from mediastreamer2_tpu.io.wav import write_wav
    sig = np.sin(2 * np.pi * 440 * np.arange(4000) / 8000).astype(np.float32)
    a, b = str(tmp_path / "a.wav"), str(tmp_path / "b.wav")
    write_wav(a, sig, 8000)
    write_wav(b, np.roll(sig, 80) * 0.7, 8000)   # shifted + gain
    with pytest.raises(SystemExit) as e:
        cli.cmd_audiocmp(_ns(file1=a, file2=b, max_shift_percent=10,
                             threshold=0.9))
    assert e.value.code == 0                      # audio_diff is shift/gain
                                                  # invariant (msaudiocmp.c)


def test_mtu_discover(capsys):
    cli.cmd_mtu(_ns(host="127.0.0.1", port=5060))
    assert "mtu to 127.0.0.1" in capsys.readouterr().out


def test_pcap_playback(tmp_path, capsys):
    pcap = os.path.join(SCEN, "pcmu_8k_no_jitter.pcap")
    if not os.path.exists(pcap):
        pytest.skip("reference scenario missing")
    out = str(tmp_path / "pcap.wav")
    cli.cmd_pcap_play(_ns(file=pcap, pt=0, rate=8000, outfile=out))
    assert "RTP packets" in capsys.readouterr().out
    from mediastreamer2_tpu.io.wav import read_wav
    audio, rate = read_wav(out)
    assert rate == 8000 and len(audio) > 8000     # > 1 s decoded


def test_record_wav(tmp_path):
    out = str(tmp_path / "rec.wav")
    cli.cmd_record(_ns(outfile=out, rate=8000, seconds=1, card=""))
    from mediastreamer2_tpu.io.wav import read_wav
    audio, rate = read_wav(out)
    assert rate == 8000 and len(audio) >= 7000
    assert float(np.abs(audio).max()) > 0.1       # the tone is there


@pytest.mark.slow
def test_mkvstream_vp8(tmp_path, factory, capsys):
    from mediastreamer2_tpu.ops.vp8 import vp8_available
    if not vp8_available():
        pytest.skip("libvpx missing")
    from mediastreamer2_tpu.models.media_player import MediaRecorder
    mkv = str(tmp_path / "av.mkv")
    rec = MediaRecorder(factory, rate=16000, max_seconds=2)
    tt = np.arange(160) / 16000
    rec.set_input(lambda t: (0.3 * np.sin(
        2 * np.pi * 440 * (tt + t * 0.01))).astype(np.float32))
    rec.enable_video(64, 64)
    for k in range(10):
        y = ((np.arange(64 * 64).reshape(64, 64) // 64 + 6 * k) % 255) / 255.0
        uv = np.full((32, 64), 0.5)
        rec.push_video_frame(
            np.concatenate([y, uv], axis=0).astype(np.float32))
    rec.run(60)
    rec.stop_and_save(mkv)

    got = []

    def rx():
        s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        s.bind(("127.0.0.1", 0))
        got.append(s.getsockname()[1])
        s.settimeout(5.0)
        n = 0
        try:
            while True:
                s.recvfrom(4096)
                n += 1
        except socket.timeout:
            pass
        got.append(n)

    th = threading.Thread(target=rx)
    th.start()
    while len(got) < 1:
        pass
    cli.cmd_mkvstream(_ns(file=mkv, dest=f"127.0.0.1:{got[0]}",
                          local_port=0, pt=102, mtu=1400))
    th.join()
    assert got[1] >= 10                           # one packet per frame min
    assert "streamed" in capsys.readouterr().out


@pytest.mark.slow
def test_cli_two_process_call(tmp_path):
    """The softphone story end to end: two `mediastream.py call` PROCESSES
    exchange G.711 over real localhost UDP; each records what the peer
    sent (tools/mediastream.c's basic usage)."""
    import subprocess
    import sys as _sys
    from mediastreamer2_tpu.io.wav import write_wav, read_wav
    from mediastreamer2_tpu.utils.audiodiff import audio_diff
    from conftest import make_speechlike
    repo = os.path.join(os.path.dirname(__file__), "..")
    tool = os.path.join(repo, "tools", "mediastream.py")
    sig_a = make_speechlike(8000 * 4, 8000, seed=71)
    sig_b = make_speechlike(8000 * 4, 8000, seed=72)
    in_a, in_b = str(tmp_path / "a.wav"), str(tmp_path / "b.wav")
    out_a, out_b = str(tmp_path / "ra.wav"), str(tmp_path / "rb.wav")
    write_wav(in_a, sig_a, 8000)
    write_wav(in_b, sig_b, 8000)
    pa, pb = 7510, 7512
    cmd = [_sys.executable, tool, "call", "--seconds", "5"]
    procs = [
        subprocess.Popen(cmd + ["--local-port", str(pa),
                                "--remote", f"127.0.0.1:{pb}",
                                "--infile", in_a, "--outfile", out_a],
                         cwd=repo, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT),
        subprocess.Popen(cmd + ["--local-port", str(pb),
                                "--remote", f"127.0.0.1:{pa}",
                                "--infile", in_b, "--outfile", out_b],
                         cwd=repo, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT),
    ]
    for p in procs:
        out, _ = p.communicate(timeout=120)
        assert p.returncode == 0, out.decode()[-800:]
    ra, _ = read_wav(out_a)
    rb, _ = read_wav(out_b)
    sim_a, _ = audio_diff(sig_b, ra)           # A recorded B's speech
    sim_b, _ = audio_diff(sig_a, rb)
    assert sim_a > 0.8, sim_a
    assert sim_b > 0.8, sim_b
