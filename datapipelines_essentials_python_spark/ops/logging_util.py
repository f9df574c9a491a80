"""Structured logging + audit decorator.

Capability parity (SURVEY.md §2.13 X5): reference ships dictConfig JSON
logging with queue handler + colored console + a Kafka log handler
(``utils/comprehensive_logging.py``, ``kafka/Logger.py``) and an
``audit_action`` decorator (``utils/audit_util.py:4-13``). Kafka is
optional here (import-gated); everything else is stdlib.
"""

from __future__ import annotations

import functools
import json
import logging
import logging.config
import time
from collections.abc import Callable


def init_logging(level: str = "INFO", json_lines: bool = False) -> logging.Logger:
    """Configure root logging once; returns the engine logger."""
    fmt = (
        '{"ts": "%(asctime)s", "level": "%(levelname)s", "logger": "%(name)s", "msg": "%(message)s"}'
        if json_lines
        else "%(asctime)s %(levelname)-7s %(name)s - %(message)s"
    )
    logging.config.dictConfig(
        {
            "version": 1,
            "disable_existing_loggers": False,
            "formatters": {"engine": {"format": fmt}},
            "handlers": {
                "console": {
                    "class": "logging.StreamHandler",
                    "formatter": "engine",
                    "level": level,
                }
            },
            "root": {"handlers": ["console"], "level": level},
        }
    )
    return logging.getLogger("datapipelines_essentials_python_spark")


def audit_action(action: str | None = None) -> Callable:
    """Decorator logging start/end/duration/failure of a pipeline action
    (parity: ``audit_util.py:4-13``)."""

    def wrap(fn: Callable) -> Callable:
        label = action or fn.__qualname__
        log = logging.getLogger("datapipelines_essentials_python_spark.audit")

        @functools.wraps(fn)
        def inner(*args, **kwargs):
            t0 = time.time()
            log.info("start %s", label)
            try:
                result = fn(*args, **kwargs)
            except Exception:
                log.exception("failed %s after %.2fs", label, time.time() - t0)
                raise
            log.info("done %s in %.2fs", label, time.time() - t0)
            return result

        return inner

    return wrap


class KafkaLogHandler(logging.Handler):
    """Log-to-Kafka handler (parity: ``kafka/Logger.py:17-45``), gated on
    kafka-python being installed; constructing without it raises cleanly."""

    def __init__(self, topic: str, bootstrap_servers: str):
        super().__init__()
        try:
            from kafka import KafkaProducer  # type: ignore[import-not-found]
        except ImportError as exc:  # pragma: no cover - env without kafka
            raise ImportError(
                "KafkaLogHandler requires the kafka-python package"
            ) from exc
        self.topic = topic
        self.producer = KafkaProducer(
            bootstrap_servers=bootstrap_servers,
            value_serializer=lambda v: json.dumps(v).encode("utf-8"),
        )

    def emit(self, record: logging.LogRecord) -> None:  # pragma: no cover
        self.producer.send(
            self.topic,
            {
                "level": record.levelname,
                "logger": record.name,
                "message": record.getMessage(),
                "ts": record.created,
            },
        )
