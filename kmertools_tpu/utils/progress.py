"""Host-side progress reporting (indicatif analog).

The reference renders indicatif bars with the template
``[{elapsed_precise}] {bar:40.cyan/blue} {pos:>7}/{len:7} ({percent}%)
{msg}`` in the counter (counter/src/lib.rs:71-78,179-186) and a spinner
ticking every 10k reads in the minimiser binners
(misc/src/minimisers.rs:56-62). This renders the same template shape —
elapsed clock, 40-char cyan bar, right-aligned pos/len, percent,
message — rate-limited, and silenced under pytest / non-tty /
KMERTOOLS_QUIET.
"""

from __future__ import annotations

import os
import sys
import time

_BAR_W = 40
_CYAN = "\x1b[36m"
_BLUE = "\x1b[34m"
_RESET = "\x1b[0m"


def _elapsed_precise(secs: float) -> str:
    s = int(secs)
    return f"{s // 3600:02d}:{(s // 60) % 60:02d}:{s % 60:02d}"


class Progress:
    def __init__(self, total: int | None = None, label: str = "",
                 quiet: bool | None = None):
        self.total = total
        self.label = label
        self.n = 0
        self._last = 0.0
        if quiet is None:
            quiet = not sys.stderr.isatty() or bool(
                os.environ.get("KMERTOOLS_QUIET")
            )
        self.quiet = quiet
        self._msg = label
        self._t0 = time.time()

    def _render(self) -> None:
        elapsed = _elapsed_precise(time.time() - self._t0)
        if self.total:
            frac = min(1.0, self.n / max(1, self.total))
            filled = int(_BAR_W * frac)
            # progress_chars("#>-"): filled '#', current '>', rest '-'
            # (counter/src/lib.rs:77). indicatif draws the current
            # char whenever the bar is incomplete — including at 0%
            # (an all '-' bar only renders before the first tick)
            head = ">" if filled < _BAR_W else ""
            bar = (
                f"{_CYAN}{'#' * filled}{head}{_RESET}"
                f"{_BLUE}{'-' * (_BAR_W - filled - len(head))}{_RESET}"
            )
            sys.stderr.write(
                f"\r[{elapsed}] {bar} {self.n:>7}/{self.total:<7} "
                f"({frac * 100:.0f}%) {self._msg}"
            )
        else:
            sys.stderr.write(f"\r[{elapsed}] {self.n:>7} {self._msg}")
        sys.stderr.flush()

    def update(self, inc: int = 1) -> None:
        self.n += inc
        if self.quiet:
            return
        now = time.time()
        if now - self._last < 0.25:
            return
        self._last = now
        self._render()

    def set_message(self, msg: str) -> None:
        self._msg = f"{self.label} {msg}" if self.label else msg
        if not self.quiet:
            self._render()

    def finish(self) -> None:
        if not self.quiet:
            self._render()
            dt = time.time() - self._t0
            sys.stderr.write(
                f"\r[{_elapsed_precise(dt)}] {self.label} done: "
                f"{self.n} in {dt:.1f}s{' ' * _BAR_W}\n"
            )
            sys.stderr.flush()
