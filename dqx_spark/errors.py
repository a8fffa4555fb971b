"""Typed exception hierarchy, name-compatible with the reference engine
(reference errors.py:1-53) so code written against it can keep its
``except`` clauses when switching.

Every class also subclasses the builtin exception this package raised
historically (``ValueError`` / ``TypeError``), so existing callers that
catch builtins keep working — the hierarchy only *narrows* what can be
caught, it never changes what propagates.
"""

from __future__ import annotations

__all__ = [
    "DQXError",
    "ParameterError",
    "InvalidParameterError",
    "MissingParameterError",
    "InvalidConfigError",
    "UnsafeSqlQueryError",
    "InvalidCheckError",
    "CheckDownloadError",
    "ODCSContractError",
    "InvalidPhysicalTypeError",
    "ComputationError",
    "ModelLoadError",
    "MissingResourceError",
]


class DQXError(Exception):
    """Base class for every error this package raises deliberately."""


class ParameterError(DQXError, ValueError):
    """A caller-supplied argument is unusable."""


class InvalidParameterError(ParameterError):
    """An argument has the right shape but an invalid value."""


class MissingParameterError(ParameterError):
    """A required argument (or one of a required group) was not supplied."""


class InvalidConfigError(DQXError, ValueError):
    """A run/input/output/storage config is inconsistent."""


class UnsafeSqlQueryError(DQXError, ValueError):
    """User-supplied SQL contains forbidden DDL/DML keywords
    (the safety gate in front of every ``spark.sql`` call)."""


class InvalidCheckError(DQXError, ValueError):
    """A check definition (metadata dict, YAML entry, or DQRule) failed
    structural or semantic validation."""


class CheckDownloadError(InvalidCheckError):
    """A checks definition could not be fetched from its storage location."""


class ODCSContractError(DQXError, ValueError):
    """A data-contract document cannot be converted to quality rules."""


class InvalidPhysicalTypeError(ODCSContractError):
    """A contract property's physical type has no Spark equivalent."""


class ComputationError(DQXError, RuntimeError):
    """A driver-side computation the engine performs on the user's behalf
    (profiling statistics, anomaly training) failed."""


class ModelLoadError(DQXError, ValueError):
    """A persisted anomaly model could not be found or deserialized."""


class MissingResourceError(DQXError, FileNotFoundError, ValueError):
    """A referenced external resource (file, table, registry entry) does
    not exist.  Also subclasses ``FileNotFoundError`` so callers that catch
    the builtin raised historically by file-backed storage keep working."""
