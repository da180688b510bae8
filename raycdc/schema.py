"""Flattener configuration, validation and output-schema derivation.

Capability parity with the reference plugin's config layer
(``HierarchyConfig.java``):

- defaults: level column "Level", bottom column "Bottom", max depth 50, path
  separator "/" (HierarchyConfig.java:43-53)
- ``connect_by_root`` parsed from a ``;``/``=`` key-value list
  (HierarchyConfig.java:220-232)
- validation rules (HierarchyConfig.java:127-173): parent != child, both
  non-empty, max depth >= 1, path/path-alias pairing, referenced fields must
  exist in the input schema; failures are *collected*, not raised one at a
  time
- output schema = input fields + level:int32 + bottom:bool
  [+ path_alias:string] [+ one field per root alias, typed like its source]
  (HierarchyConfig.java:239-253)

Everything here is pure Python over ``pyarrow.Schema`` — it runs at
pipeline-build time, before any Ray work starts.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Mapping, Optional

import pyarrow as pa

DEFAULT_LEVEL_FIELD = "Level"
DEFAULT_BOTTOM_FIELD = "Bottom"
DEFAULT_MAX_DEPTH = 50
DEFAULT_PATH_SEPARATOR = "/"


def parse_connect_by_root(spec: Optional[str]) -> dict[str, str]:
    """Parse ``"srcField=alias;srcField2=alias2"`` into ``{src: alias}``.

    Mirrors the reference's KeyValueListParser(";", "=") usage
    (HierarchyConfig.java:225-231). Whitespace around tokens is tolerated.
    """
    out: dict[str, str] = {}
    if not spec:
        return out
    for pair in spec.split(";"):
        pair = pair.strip()
        if not pair:
            continue
        if "=" not in pair:
            raise ValueError(
                f"Invalid connect-by-root entry {pair!r}: expected 'field=alias'"
            )
        key, _, value = pair.partition("=")
        key, value = key.strip(), value.strip()
        if not key or not value:
            raise ValueError(
                f"Invalid connect-by-root entry {pair!r}: empty field or alias"
            )
        out[key] = value
    return out


@dataclass(frozen=True)
class FlattenConfig:
    """Configuration of the hierarchy flattener.

    Field-for-field parity with the reference plugin's properties
    (HierarchyConfig.java:56-119); names are snake_cased. ``connect_by_root``
    may be given either as the reference's string syntax
    (``"parent=root1;child=root2"``) or as an already-parsed mapping.
    """

    parent_field: str
    child_field: str
    level_field: str = DEFAULT_LEVEL_FIELD
    bottom_field: str = DEFAULT_BOTTOM_FIELD
    max_depth: int = DEFAULT_MAX_DEPTH
    start_with: Optional[str] = None
    connect_by_root: Mapping[str, str] | str | None = None
    path_field: Optional[str] = None
    path_alias_field: Optional[str] = None
    path_separator: str = DEFAULT_PATH_SEPARATOR

    def roots(self) -> dict[str, str]:
        """connect-by-root as ``{source_field: alias}`` (insertion-ordered)."""
        if self.connect_by_root is None:
            return {}
        if isinstance(self.connect_by_root, str):
            return parse_connect_by_root(self.connect_by_root)
        return dict(self.connect_by_root)

    @property
    def has_path(self) -> bool:
        # Reference requires BOTH path field and alias (HierarchyFlattener.java:390-392).
        return bool(self.path_field) and bool(self.path_alias_field)


_MACRO_RE = None


def resolve_macros(value: str, resolver: Mapping[str, str]) -> str:
    """Resolve ``${name}`` placeholders (the reference's @Macro properties,
    HierarchyConfig.java:59-119) from a mapping (e.g. os.environ)."""
    global _MACRO_RE
    import re

    if _MACRO_RE is None:
        _MACRO_RE = re.compile(r"\$\{([^}]+)\}")

    def sub(m):
        name = m.group(1)
        if name not in resolver:
            raise KeyError(f"Unresolved macro ${{{name}}}")
        return str(resolver[name])

    return _MACRO_RE.sub(sub, value)


#: reference plugin property name -> FlattenConfig field
_PROPERTY_MAP = {
    "parentField": "parent_field",
    "childField": "child_field",
    "levelField": "level_field",
    "bottomField": "bottom_field",
    "maxDepthField": "max_depth",
    "maxDepth": "max_depth",
    "startWith": "start_with",
    "connectByRootField": "connect_by_root",
    "pathField": "path_field",
    "pathAliasField": "path_alias_field",
    "pathSeparator": "path_separator",
}


def config_from_properties(props: Mapping[str, str],
                           resolver: Mapping[str, str] | None = None
                           ) -> FlattenConfig:
    """Build a FlattenConfig from the reference plugin's property dict
    (the CDAP pipeline-JSON ``properties`` block), resolving ``${macro}``
    placeholders at build time (O19)."""
    kwargs = {}
    for prop, value in props.items():
        if prop not in _PROPERTY_MAP:
            raise ValueError(f"Unknown property {prop!r}")
        if isinstance(value, str) and resolver is not None:
            value = resolve_macros(value, resolver)
        field_name = _PROPERTY_MAP[prop]
        if field_name == "max_depth":
            value = int(value)
        kwargs[field_name] = value
    return FlattenConfig(**kwargs)


def validate_config(cfg: FlattenConfig, input_schema: pa.Schema) -> list[str]:
    """Validate ``cfg`` against ``input_schema``; return collected failures.

    Mirrors HierarchyConfig.validate (HierarchyConfig.java:127-173): failures
    accumulate into a list (the reference's FailureCollector); the caller
    raises if the list is non-empty.
    """
    failures: list[str] = []
    names = set(input_schema.names)

    if cfg.parent_field and cfg.parent_field == cfg.child_field:
        failures.append("Parent field is same as child field.")
    if not cfg.parent_field:
        failures.append("Parent field is null/empty.")
    elif cfg.parent_field not in names:
        failures.append(f"Parent field {cfg.parent_field!r} not found in the input schema.")
    if not cfg.child_field:
        failures.append("Child field is null/empty.")
    elif cfg.child_field not in names:
        failures.append(f"Child field {cfg.child_field!r} not found in the input schema.")
    if cfg.max_depth < 1:
        failures.append("Invalid max depth. Max depth must be at least 1.")

    if cfg.path_field:
        if not cfg.path_alias_field:
            failures.append("Path alias field name is null/empty.")
        if cfg.path_field not in names:
            failures.append(f"Field {cfg.path_field} not found in the input schema.")
    if cfg.path_alias_field and not cfg.path_field:
        failures.append("Path field name is null/empty.")

    try:
        roots = cfg.roots()
    except ValueError as exc:
        failures.append(str(exc))
        roots = {}
    for src in roots:
        if src not in names:
            failures.append(f"Field {src} not found in the input schema.")

    # generated output names must not collide with input columns or each
    # other — derive_output_schema would otherwise emit duplicate fields
    # that pass validation but crash any downstream name lookup
    generated = [cfg.level_field, cfg.bottom_field]
    if cfg.path_alias_field:
        generated.append(cfg.path_alias_field)
    generated += list(roots.values())
    seen: set = set()
    for g in generated:
        if not g:
            continue
        if g in names:
            failures.append(
                f"Output field {g!r} already exists in the input schema.")
        if g in seen:
            failures.append(f"Output field {g!r} is generated twice.")
        seen.add(g)
    return failures


def derive_output_schema(input_schema: pa.Schema, cfg: FlattenConfig) -> pa.Schema:
    """Output schema of the flattener, derived statically from the input.

    Parity with HierarchyConfig.generateOutputSchema
    (HierarchyConfig.java:239-253): input fields in order, then
    ``level:int32`` and ``bottom:bool`` (non-null), then the path alias
    (string) when configured, then one field per connect-by-root alias typed
    like its source field.
    """
    if input_schema is None or len(input_schema) == 0:
        raise ValueError("Input schema is required.")
    fields = list(input_schema)
    fields.append(pa.field(cfg.level_field, pa.int32(), nullable=False))
    fields.append(pa.field(cfg.bottom_field, pa.bool_(), nullable=False))
    if cfg.has_path:
        fields.append(pa.field(cfg.path_alias_field, pa.string()))
    for src, alias in cfg.roots().items():
        idx = input_schema.get_field_index(src)
        if idx < 0:
            raise ValueError(f"Field {src} not found in the input schema")
        fields.append(pa.field(alias, input_schema.field(idx).type))
    return pa.schema(fields)
