from .rules import (
    QualifiedTable,
    ReplicationFilter,
    RuleConflictError,
    TableRules,
    normalize_time_window,
)

__all__ = [
    "QualifiedTable",
    "ReplicationFilter",
    "RuleConflictError",
    "TableRules",
    "normalize_time_window",
]
