"""Realtime GC guard (core/rtgc.py): paced sections run with cycle
collection off (a gen-2 pause measured ~110 ms on the bench host — one
pause blows every co-resident member's 10 ms edge at once)."""
import gc

from mediastreamer2_tpu.core import rtgc


def test_paused_gc_disables_and_restores():
    assert gc.isenabled()
    with rtgc.paused_gc():
        assert not gc.isenabled()
    assert gc.isenabled()


def test_paused_gc_nests_reentrantly():
    with rtgc.paused_gc():
        with rtgc.paused_gc():
            assert not gc.isenabled()
        # inner exit must NOT re-enable mid-run (fleet wraps members
        # that themselves wrap their paced loops)
        assert not gc.isenabled()
    assert gc.isenabled()


def test_paused_gc_restores_on_error():
    try:
        with rtgc.paused_gc():
            raise RuntimeError("member died")
    except RuntimeError:
        pass
    assert gc.isenabled()


def test_collects_deferred_cycles_at_exit():
    class Node:
        pass

    with rtgc.paused_gc():
        a, b = Node(), Node()
        a.other, b.other = b, a
        del a, b                 # cyclic garbage created while GC is off
    # exit collected: no Node survives
    assert not any(isinstance(o, Node) for o in gc.get_objects())
