"""Alias package: ``hierarchical_to_relational_ray`` → :mod:`raycdc`.

The engine lives in the ``raycdc`` package (see README.md and SURVEY.md);
this alias exposes the same public API under the project's long name.
"""

from raycdc import (  # noqa: F401
    FlattenConfig,
    derive_output_schema,
    flatten_hierarchy,
    validate_config,
)
from raycdc.flatten import flatten_hierarchy_table  # noqa: F401
from raycdc.record_flatten import flatten_records  # noqa: F401
from raycdc.cdc import apply_changelog, generate_changelog, read_lake  # noqa: F401
