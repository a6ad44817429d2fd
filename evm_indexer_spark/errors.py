"""Facade-level errors mirroring the reference's API error branches."""

from __future__ import annotations


class EngineError(Exception):
    """Base class for engine facade errors."""


class ValidationError(EngineError):
    """Bad input shape — reference REST 400 branches (app/rest/rest.go:100,135,...)."""


class RangeTooWideError(ValidationError):
    """Range guardrail exceeded — RangeChecker, app/common/common.go:66-84."""


class NotFoundError(EngineError):
    """Empty result — reference REST 404 branches (app/rest/rest.go:106 etc.)."""
