from .metadata import is_offloaded, metadata_from_json, metadata_to_json
from .serde import (
    default_literal,
    deserialize_value,
    placeholder_struct,
    serialize_value,
    with_placeholders,
)

__all__ = [
    "default_literal",
    "deserialize_value",
    "is_offloaded",
    "metadata_from_json",
    "metadata_to_json",
    "placeholder_struct",
    "serialize_value",
    "with_placeholders",
]
