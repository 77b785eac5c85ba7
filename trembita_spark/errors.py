"""Engine errors.

The reference catches illegal pipelines at Scala compile time (typeclass
resolution failure). Python has no compile step, so the engine's builders
validate eagerly at construction time and raise these — the moral
equivalent of trembita's compile-time safety.
"""

from __future__ import annotations


class TrembitaSparkError(Exception):
    """Base class for engine errors."""


class SchemaError(TrembitaSparkError):
    """A column reference or type did not validate against the schema."""


class QueryBuildError(TrembitaSparkError):
    """An aggregation query was assembled illegally (e.g. ``having`` on an
    undeclared aggregate name)."""
