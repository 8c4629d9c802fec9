"""Minimal host-side progress reporting (indicatif analog).

The reference shows a progress bar in the counter
(counter/src/lib.rs:71-78) and a spinner ticking every 10k reads in the
minimiser binners (misc/src/minimisers.rs:56-62). We emit plain stderr
updates, rate-limited, and silence them under pytest / non-tty.
"""

from __future__ import annotations

import os
import sys
import time


class Progress:
    def __init__(self, total: int | None = None, label: str = "", quiet: bool | None = None):
        self.total = total
        self.label = label
        self.n = 0
        self._last = 0.0
        if quiet is None:
            quiet = not sys.stderr.isatty() or bool(os.environ.get("KMERTOOLS_QUIET"))
        self.quiet = quiet
        self._t0 = time.time()

    def update(self, inc: int = 1) -> None:
        self.n += inc
        if self.quiet:
            return
        now = time.time()
        if now - self._last < 0.25:
            return
        self._last = now
        if self.total:
            pct = 100.0 * self.n / max(1, self.total)
            sys.stderr.write(f"\r{self.label} {self.n}/{self.total} ({pct:.0f}%)")
        else:
            sys.stderr.write(f"\r{self.label} {self.n}")
        sys.stderr.flush()

    def set_message(self, msg: str) -> None:
        if not self.quiet:
            sys.stderr.write(f"\r{self.label} {msg}")
            sys.stderr.flush()

    def finish(self) -> None:
        if not self.quiet:
            dt = time.time() - self._t0
            sys.stderr.write(f"\r{self.label} done: {self.n} in {dt:.1f}s\n")
            sys.stderr.flush()
