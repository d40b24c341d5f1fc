"""Offer/answer codec negotiation (SDP-level payload matching).

Reference: src/voip/offeranswer.c + the factory's offer-answer provider
registry (ms_factory_register_offer_answer_provider,
include/mediastreamer2/msfactory.h:418-434): per-codec contexts that match
fmtp parameters between an offer and the local capability list.

Here: PayloadTypeDesc carries mime/rate/channels/fmtp; providers are
per-mime matcher functions registered on the Factory; `negotiate` produces
the answer list the session layer feeds to AudioStreamBatch/VideoStream.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional


@dataclasses.dataclass
class PayloadTypeDesc:
    mime: str
    clock_rate: int
    channels: int = 1
    number: int = -1                # RTP payload type number
    fmtp: str = ""

    def key(self):
        return (self.mime.lower(), self.clock_rate, self.channels)


MatchFn = Callable[[PayloadTypeDesc, PayloadTypeDesc], Optional[PayloadTypeDesc]]
_PROVIDERS: Dict[str, MatchFn] = {}


def register_offer_answer_provider(mime: str, fn: MatchFn):
    """cf. ms_factory_register_offer_answer_provider."""
    _PROVIDERS[mime.lower()] = fn


def default_match(offered: PayloadTypeDesc, local: PayloadTypeDesc
                  ) -> Optional[PayloadTypeDesc]:
    if offered.key() != local.key():
        return None
    return PayloadTypeDesc(local.mime, local.clock_rate, local.channels,
                           offered.number, local.fmtp)


def _opus_match(offered, local):
    if offered.mime.lower() != "opus" or local.mime.lower() != "opus":
        return None
    # opus is always 48000/2 on the wire; fmtp carries real config
    fmtp = {}
    for part in (offered.fmtp or "").split(";"):
        if "=" in part:
            k, v = part.strip().split("=", 1)
            fmtp[k] = v
    answer_fmtp = []
    if fmtp.get("useinbandfec") == "1":
        answer_fmtp.append("useinbandfec=1")
    if "maxplaybackrate" in fmtp:
        answer_fmtp.append(f"maxplaybackrate={fmtp['maxplaybackrate']}")
    return PayloadTypeDesc("opus", 48000, 2, offered.number,
                           ";".join(answer_fmtp))


register_offer_answer_provider("opus", _opus_match)


def negotiate(offered: List[PayloadTypeDesc], local: List[PayloadTypeDesc]
              ) -> List[PayloadTypeDesc]:
    """Produce the answer payload list (first-match priority order)."""
    answer = []
    for off in offered:
        for loc in local:
            fn = _PROVIDERS.get(off.mime.lower(), default_match)
            m = fn(off, loc)
            if m is not None:
                answer.append(m)
                break
    return answer


# the framework's default local capability set, mirroring what the factory
# registers (device codecs + host codecs when their libs are present)
def local_capabilities() -> List[PayloadTypeDesc]:
    caps = [
        PayloadTypeDesc("PCMU", 8000, 1, 0),
        PayloadTypeDesc("PCMA", 8000, 1, 8),
        PayloadTypeDesc("L16", 44100, 1, 11),
    ]
    from mediastreamer2_tpu.ops import host_codecs as hc
    if hc.gsm_available():
        caps.append(PayloadTypeDesc("GSM", 8000, 1, 3))
    if hc.opus_available():
        caps.append(PayloadTypeDesc("opus", 48000, 2, 96, "useinbandfec=1"))
    return caps
