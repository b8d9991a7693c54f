"""Unit tests for the PreemptionWatcher (utils/preemption.py) — the
flag-only signal handling under the SIGTERM -> exact-checkpoint path.
The end-to-end behavior (save + clean return + --resume) is covered by
tests/test_cli_smoke.py::test_sigterm_preemption_saves_and_resumes."""

import os
import signal
import threading

from hmmc_tpu.utils.preemption import PreemptionWatcher


def test_sets_flag_and_restores_previous_handler():
    prev = signal.getsignal(signal.SIGTERM)
    with PreemptionWatcher() as w:
        assert not w.triggered
        os.kill(os.getpid(), signal.SIGTERM)
        # delivery is synchronous for a self-directed signal on the main
        # thread: handled before the next statement runs
        assert w.triggered
        # a second signal while triggered is absorbed, not fatal
        os.kill(os.getpid(), signal.SIGTERM)
        assert w.triggered
    assert signal.getsignal(signal.SIGTERM) is prev


def test_nested_watchers_restore_in_order():
    prev = signal.getsignal(signal.SIGTERM)
    with PreemptionWatcher() as outer:
        with PreemptionWatcher() as inner:
            os.kill(os.getpid(), signal.SIGTERM)
            assert inner.triggered and not outer.triggered
        # inner exit restores the OUTER watcher's handler
        os.kill(os.getpid(), signal.SIGTERM)
        assert outer.triggered
    assert signal.getsignal(signal.SIGTERM) is prev


def test_off_main_thread_watcher_is_inert():
    result = {}

    def worker():
        with PreemptionWatcher() as w:
            result["installed"] = bool(w._prev)

    prev = signal.getsignal(signal.SIGTERM)
    t = threading.Thread(target=worker)
    t.start()
    t.join()
    assert result["installed"] is False
    assert signal.getsignal(signal.SIGTERM) is prev
