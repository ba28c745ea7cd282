"""Timestamped stderr logging (reference: base/multithread_io.h mt_log +
currentDateTime, base/global.cpp:14-21)."""

from __future__ import annotations

import sys
import time


def current_datetime() -> str:
    return time.strftime("%Y-%m-%d.%X", time.localtime())


def log(msg: str) -> None:
    print(f"[{current_datetime()}] {msg}", file=sys.stderr, flush=True)
