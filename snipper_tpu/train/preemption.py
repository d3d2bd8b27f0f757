"""Preemption-safe checkpointing.

The reference has no failure handling: training aborts on non-finite loss
and recovery is a manual ``--resume`` (reference ``engine.py:68-71``,
``main.py:242-248``; SURVEY.md §5 flags checkpoint-on-signal as the standard
addition for TPU fleets, where preemptions are routine)."""

from __future__ import annotations

import signal
from typing import Callable, Optional


class PreemptionGuard:
    """Registers SIGTERM/SIGINT handlers that set a flag; the training loop
    checks ``should_stop`` each step and writes a final checkpoint.

    Usage:
        guard = PreemptionGuard()
        for step in ...:
            ...
            if guard.should_stop:
                save_checkpoint(...); break
    """

    def __init__(self, on_signal: Optional[Callable[[int], None]] = None):
        self.should_stop = False
        self._sigint_seen = False
        self._on_signal = on_signal
        self._prev = {}
        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                self._prev[sig] = signal.signal(sig, self._handle)
            except (ValueError, OSError):  # non-main thread etc.
                pass

    def _handle(self, signum, frame):
        if signum == signal.SIGINT:
            if self._sigint_seen:
                # SECOND Ctrl-C: the flag is only polled between steps, and
                # a TPU compile (20-300 s) or a wedged tunnel never reaches
                # the poll — escalate so the user can actually interrupt.
                # (Keyed on a prior SIGINT, not on should_stop: a single
                # Ctrl-C after a SIGTERM preemption must NOT abort the
                # preemption checkpoint save.)
                signal.signal(signal.SIGINT,
                              self._prev.get(signal.SIGINT, signal.SIG_DFL))
                raise KeyboardInterrupt
            self._sigint_seen = True
        self.should_stop = True
        if self._on_signal is not None:
            self._on_signal(signum)

    def restore(self):
        for sig, prev in self._prev.items():
            signal.signal(sig, prev)
