"""Environment/zone resolution.

Capability parity (SURVEY.md §2.13 X6): the reference infers environment
and zone from the *hostname* (``objects/enums/Environments.py:22-50``,
``Zones.py:2-6``) — brittle. Re-derived config-first: explicit env var wins,
hostname patterns are a documented fallback.
"""

from __future__ import annotations

import os
import re
import socket
from enum import Enum


class Environment(str, Enum):
    LOCAL = "local"
    DEV = "dev"
    TEST = "test"
    STAGE = "stage"
    PROD = "prod"


# hostname-regex fallback, mirroring the reference's substring conventions
_HOST_PATTERNS: list[tuple[str, Environment]] = [
    (r"(^|[-.])prd|prod", Environment.PROD),
    (r"(^|[-.])stg|stage", Environment.STAGE),
    (r"(^|[-.])tst|test", Environment.TEST),
    (r"(^|[-.])dev", Environment.DEV),
]

ENV_VAR = "PIPELINE_ENV"


def detect_environment(hostname: str | None = None) -> Environment:
    """Explicit ``PIPELINE_ENV`` beats hostname heuristics; unknown → LOCAL."""
    explicit = os.environ.get(ENV_VAR, "").strip().lower()
    if explicit:
        try:
            return Environment(explicit)
        except ValueError:
            pass
    host = (hostname or socket.gethostname()).lower()
    for pattern, env in _HOST_PATTERNS:
        if re.search(pattern, host):
            return env
    return Environment.LOCAL
