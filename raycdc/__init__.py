"""raycdc — a Ray-Data-native hierarchical-to-relational + CDC ingest engine.

Built from scratch against the capability surface of the CDAP
``hierarchical-to-relational`` Spark plugin (reference at /root/reference, see
SURVEY.md for the operator inventory with file:line citations) and extended to
a CDC / incremental-ingest engine over Common-Crawl-style web pages
(BASELINE.json ``north_star``).

Layers
------
- :mod:`raycdc.schema`   — flattener config, validation, output-schema derivation
- :mod:`raycdc.expr`     — restricted SQL-boolean predicate grammar (START WITH)
- :mod:`raycdc.flatten`  — edge-list hierarchy flattener (CONNECT BY semantics)
- :mod:`raycdc.record_flatten` — recursive schema-walk flattener for nested Arrow
- :mod:`raycdc.cdc`      — changelog generation, LWW merge, 2PC lake sink, engine
- :mod:`raycdc.ops`      — training-data operators (dedup, ANN, text analysis)
"""

from raycdc.schema import (
    FlattenConfig,
    config_from_properties,
    derive_output_schema,
    validate_config,
)
from raycdc.flatten import flatten_hierarchy, flatten_hierarchy_table

__all__ = [
    "FlattenConfig",
    "config_from_properties",
    "derive_output_schema",
    "validate_config",
    "flatten_hierarchy",
    "flatten_hierarchy_table",
]
