"""Logging / observability (SURVEY.md §5.5).

The reference mixes stdlib logging with bare prints and rank-gates via
`accelerator.print`.  Here: one `get_logger` with a consistent format, rank-0
gating built in (multi-process JAX), and a `log_once` helper for warnings that
would otherwise spam every step."""

from __future__ import annotations

import logging
import sys
from functools import lru_cache

import jax

_FORMAT = "%(asctime)s %(levelname).1s %(name)s] %(message)s"


@lru_cache(maxsize=None)
def get_logger(name: str = "ctpa", level: int = logging.INFO,
               all_processes: bool = False) -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(logging.Formatter(_FORMAT, datefmt="%H:%M:%S"))
        logger.addHandler(handler)
        logger.setLevel(level)
        logger.propagate = False
    if not all_processes and jax.process_index() != 0:
        logger.setLevel(logging.CRITICAL)   # rank gating (is_main_process analog)
    return logger


_seen: set[str] = set()


def log_once(logger: logging.Logger, key: str, message: str,
             level: int = logging.WARNING):
    """Emit `message` only the first time `key` is seen."""
    if key in _seen:
        return
    _seen.add(key)
    logger.log(level, message)
