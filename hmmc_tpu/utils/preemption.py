"""Preemption-safe training: SIGTERM -> exact mid-epoch checkpoint.

Cloud TPU spot/preemptible VMs receive SIGTERM shortly before eviction.
The reference has no recovery story — a killed run loses the optimizer
state and the data position entirely (reference
main_task_retrieval.py:215-222 saves model weights only, per epoch).
Here the train loops poll a :class:`PreemptionWatcher` after every step;
when the signal arrives they write the exact (epoch, batch_in_epoch)
state through the existing ``--save_steps`` machinery and return
cleanly, so the next invocation with ``--resume`` fast-forwards the
deterministic loader order and consumes every remaining batch of the
interrupted epoch exactly once.

The handler only sets a flag — checkpointing happens on the main loop's
schedule, never inside the signal context — and repeated SIGTERMs while
the save is in flight are absorbed rather than killing the process
mid-write.
"""

from __future__ import annotations

import signal
import threading


class PreemptionWatcher:
    """Install handlers for ``signals`` while active; ``triggered`` flips
    true when one arrives. Signals can only be routed to the main thread;
    constructed off the main thread the watcher is inert (never
    triggered) rather than an error, so library callers embedding the
    runner in worker threads keep their own handling."""

    def __init__(self, signals=(signal.SIGTERM,)):
        self._signals = tuple(signals)
        self._prev = {}
        self._event = threading.Event()

    @property
    def triggered(self) -> bool:
        return self._event.is_set()

    def _on_signal(self, signum, frame):
        self._event.set()

    def install(self) -> "PreemptionWatcher":
        if threading.current_thread() is not threading.main_thread():
            return self
        for s in self._signals:
            try:
                self._prev[s] = signal.signal(s, self._on_signal)
            except (ValueError, OSError):  # exotic hosts / missing signal
                pass
        return self

    def uninstall(self) -> None:
        for s, prev in self._prev.items():
            try:
                signal.signal(s, prev)
            except (ValueError, OSError):
                pass
        self._prev.clear()

    def __enter__(self) -> "PreemptionWatcher":
        return self.install()

    def __exit__(self, *exc) -> bool:
        self.uninstall()
        return False
