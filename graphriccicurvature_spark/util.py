"""Logging / verbosity control (reference util.py:7-37).

Adds the reference's custom TRACE level between DEBUG and INFO and the same
four-level ``set_verbose`` contract. Executor-side visibility comes from
Spark's own task metrics/UI, not Python logging.
"""

from __future__ import annotations

import logging
from functools import partial, partialmethod

TRACE = logging.DEBUG + 5
if not hasattr(logging, "TRACE"):
    logging.TRACE = TRACE
    logging.addLevelName(TRACE, "TRACE")
    logging.Logger.trace = partialmethod(logging.Logger.log, TRACE)
    logging.trace = partial(logging.log, TRACE)

logger = logging.getLogger("graphriccicurvature_spark")


def set_verbose(verbose: str = "ERROR") -> None:
    """Verbose level: INFO | TRACE | DEBUG | ERROR (reference util.py:15-37)."""
    levels = {
        "INFO": logging.INFO,
        "TRACE": TRACE,
        "DEBUG": logging.DEBUG,
        "ERROR": logging.ERROR,
    }
    if verbose not in levels:
        print('Incorrect verbose level, option:["INFO","DEBUG","ERROR"], use "ERROR instead."')
        verbose = "ERROR"
    logger.setLevel(levels[verbose])
