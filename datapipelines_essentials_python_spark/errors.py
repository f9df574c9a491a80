"""Typed errors for the engine.

Parity with the reference's custom error classes used by schema/contract
validation (``MetaModel.py:471-511`` raises required/prohibited/mismatch
errors) and reader dispatch (``utils/spark.py:99-102`` raises on unknown
filetype).
"""

from __future__ import annotations


class EngineError(Exception):
    """Base class for all engine errors."""


class UnknownFileTypeError(EngineError):
    """Reader/writer dispatch got a filetype it does not support."""


class MetadataValidationError(EngineError):
    """A metadata row / column spec failed validation."""


class RequiredColumnsMissingError(EngineError):
    """DataFrame is missing required columns (reference MetaModel.py:490-497)."""

    def __init__(self, missing: list[str]):
        self.missing = sorted(missing)
        super().__init__(f"required columns missing: {self.missing}")


class ProhibitedColumnsPresentError(EngineError):
    """DataFrame contains prohibited columns (reference MetaModel.py:499-505)."""

    def __init__(self, present: list[str]):
        self.present = sorted(present)
        super().__init__(f"prohibited columns present: {self.present}")


class SchemaMismatchError(EngineError):
    """StructField subset check failed (reference MetaModel.py:507-511)."""


class ColumnMismatchError(EngineError):
    """Two columns expected to be equal differ (reference MetaModel.py:527-544)."""


class FilterDSLError(EngineError):
    """Filter mini-DSL expression could not be parsed."""


class JoinPlanError(EngineError):
    """pk/fk graph join planning failed (cycle, unknown table, bad keys)."""
