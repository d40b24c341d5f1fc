from mediastreamer2_tpu.core.block import TICK_MS, Format, tick_samples
from mediastreamer2_tpu.core.filter import FilterDef, FilterCtx, register_filter, FILTER_REGISTRY
from mediastreamer2_tpu.core.factory import Factory
from mediastreamer2_tpu.core.graph import GraphBuilder, CompiledGraph
from mediastreamer2_tpu.core.ticker import Ticker, TickerStats
from mediastreamer2_tpu.core.events import EventQueue, Event

__all__ = [
    "TICK_MS", "Format", "tick_samples",
    "FilterDef", "FilterCtx", "register_filter", "FILTER_REGISTRY",
    "Factory", "GraphBuilder", "CompiledGraph",
    "Ticker", "TickerStats", "EventQueue", "Event",
]
