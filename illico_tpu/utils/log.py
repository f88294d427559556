"""Logging shim with a loguru-like interface.

The reference depends on ``loguru`` (``pyproject.toml:17``); this environment
does not ship it, so we expose the same call surface (``logger.info``,
``logger.trace``...) over the stdlib.  Set ``ILLICO_TPU_LOG=TRACE`` to see
trace-level messages (batching decisions, compile times, memory estimates),
mirroring the reference's trace logging (``asymptotic_wilcoxon.py:228-235``).
"""

from __future__ import annotations

import logging
import os

TRACE = 5
logging.addLevelName(TRACE, "TRACE")

_logger = logging.getLogger("illico_tpu")
if not _logger.handlers:
    _handler = logging.StreamHandler()
    _handler.setFormatter(
        logging.Formatter("%(asctime)s | %(levelname)s | illico_tpu | %(message)s")
    )
    _logger.addHandler(_handler)
    _logger.setLevel(os.environ.get("ILLICO_TPU_LOG", "WARNING").upper())
    _logger.propagate = False


class _Logger:
    def trace(self, msg, *args):
        _logger.log(TRACE, msg, *args)

    def debug(self, msg, *args):
        _logger.debug(msg, *args)

    def info(self, msg, *args):
        _logger.info(msg, *args)

    def warning(self, msg, *args):
        _logger.warning(msg, *args)

    def error(self, msg, *args):
        _logger.error(msg, *args)


logger = _Logger()
