"""Dual console+file logging (reference O8, ``dags/utils/logger.py:4-26``).

The reference builds a logger that tees to stdout and a log file; same here
with the path made configurable (the reference hardcodes it)."""

from __future__ import annotations

import logging
import os

DEFAULT_FORMAT = "%(asctime)s - %(name)s - %(levelname)s - %(message)s"


def get_logger(name: str = "nyc_taxi_spark", log_file: str | None = None,
               level: int = logging.INFO) -> logging.Logger:
    """Console logger, optionally teed to ``log_file`` (created on demand).
    Idempotent: repeated calls never duplicate handlers."""
    logger = logging.getLogger(name)
    logger.setLevel(level)
    fmt = logging.Formatter(DEFAULT_FORMAT)

    if not any(isinstance(h, logging.StreamHandler)
               and not isinstance(h, logging.FileHandler)
               for h in logger.handlers):
        sh = logging.StreamHandler()
        sh.setFormatter(fmt)
        logger.addHandler(sh)

    if log_file is not None:
        target = os.path.abspath(log_file)
        if not any(isinstance(h, logging.FileHandler)
                   and getattr(h, "baseFilename", None) == target
                   for h in logger.handlers):
            os.makedirs(os.path.dirname(target) or ".", exist_ok=True)
            fh = logging.FileHandler(target)
            fh.setFormatter(fmt)
            logger.addHandler(fh)
    return logger
