from .checks import (
    DuplicateKeyError,
    EmptyInputError,
    SchemaMismatchError,
    validate_unique,
    validate_non_empty,
    validate_schema,
)

__all__ = [
    "DuplicateKeyError",
    "EmptyInputError",
    "SchemaMismatchError",
    "validate_unique",
    "validate_non_empty",
    "validate_schema",
]
