"""Timestamped logging helpers.

Mirrors the reference's `log` / `log_timing` print helpers
(Inference/chat_finetuned.py:12-13, Training/Training_0to1k/train.py:58-61)
with the same `[YYYY-MM-DD HH:MM:SS] msg` line format, so downstream log
scrapers keep working.
"""

from __future__ import annotations

import sys
from datetime import datetime


def log(msg: str) -> None:
    print(f"[{datetime.now().strftime('%Y-%m-%d %H:%M:%S')}] {msg}")
    sys.stdout.flush()


# The training scripts call this `log_timing`; keep both names.
log_timing = log
