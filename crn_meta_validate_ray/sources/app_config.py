"""Versioned multi-table app-schema bootstrap (SURVEY §2.1 S10 extension).

Mirrors the reference's ``load_and_validate_schema``
(utils/load_and_validate_schema.py:156-306) minus the UI/network surface:
a versioned ``app_schema_{version}.json`` binds

- the registry version (and an optional *old* registry version gated by
  ``allow_old_registry`` — the dual-validation toggle, app.py:865-932);
- the table set (required + optional table names);
- mandatory column lists for the rule registry and the category table;
- the default input delimiter;
- local file pointers for the registry and category CSVs (the engine is
  offline: ``use_local`` is the only mode — the reference's Google-Sheets
  URLs have no analogue here).

Load behavior parity: missing schema file → ``FileNotFoundError``; missing
required JSON key → ``ValueError`` naming the key; a category table whose
status rows are not all synced → ``RuntimeError``
(utils/load_and_validate_schema.py:193-216, read_ValidCategories); the
"Other" option is always injected into every category list
(ensure_step1_other_options analogue).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

import pandas as pd

from crn_meta_validate_ray.registry import ConstraintSet, TableRules
from crn_meta_validate_ray.sources.registry_io import (
    split_status_rows,
    table_rules_from_csv,
)

OTHER_OPTION = "Other"
STATUS_COLUMN = "Status"
STATUS_OK_PREFIX = "OK"

_REQUIRED_KEYS = (
    "registry_version",
    "default_input_delimiter",
    "table_names",
    "registry_mandatory_fields",
    "category_mandatory_fields",
    "registry_csv",
    "categories_csv",
)


@dataclass
class SchemaConfig:
    """Fully populated engine configuration (reference SchemaConfig)."""

    app_schema: dict
    version: str
    version_display: str
    default_delimiter: str
    registry_version: str
    old_registry_version: str | None
    allow_old_registry: bool
    required_tables: list[str]
    optional_tables: list[str]
    registry_mandatory_fields: list[str]
    category_mandatory_fields: list[str]
    registry_csv: str
    categories_csv: str
    category_lists: dict[str, list[str]] = field(default_factory=dict)

    def constraint_set(self, locators: dict[str, tuple] | None = None,
                       *, old: bool = False) -> ConstraintSet:
        """Build the per-table constraint set from the registry CSV for
        every table this version binds.  ``old=True`` loads the previous
        registry version's CSV (dual-validation path) — only legal when
        ``allow_old_registry``."""
        if old:
            if not (self.allow_old_registry and self.old_registry_version):
                raise ValueError(
                    "old-registry validation requested but allow_old_registry "
                    "is off or old_registry_version is unset")
            path = self.registry_csv.replace(self.registry_version,
                                             self.old_registry_version)
        else:
            path = self.registry_csv
        cs = ConstraintSet()
        for table in self.required_tables + self.optional_tables:
            loc = (locators or {}).get(table, ())
            cs.add(table_rules_from_csv(path, table, locator=loc))
        return cs

    def tables(self) -> list[str]:
        return self.required_tables + self.optional_tables


def _read_categories(path: str, mandatory: list[str]) -> dict[str, list[str]]:
    """Load the category table: mandatory columns must exist, every row's
    Status must carry the synced prefix (else RuntimeError — the reference
    refuses to boot on a half-synced sheet), and each category column
    yields its de-duplicated non-null option list."""
    df = pd.read_csv(path)
    missing = [c for c in mandatory if c not in df.columns]
    if missing:
        raise RuntimeError(
            f"category table {path} missing mandatory columns: {missing}")
    if STATUS_COLUMN in df.columns:
        not_ok, _, _ = split_status_rows(df, STATUS_COLUMN,
                                         STATUS_OK_PREFIX, transient=[])
        if len(not_ok):
            raise RuntimeError(
                f"category table {path} has {len(not_ok)} rows with "
                f"unsynced status (expected prefix {STATUS_OK_PREFIX!r})")
    out: dict[str, list[str]] = {}
    for col in mandatory:
        if col == STATUS_COLUMN:
            continue
        vals = [str(v).strip() for v in df[col].dropna().tolist()
                if str(v).strip()]
        seen: list[str] = []
        for v in vals:
            if v not in seen:
                seen.append(v)
        out[col] = seen
    return out


def ensure_other_options(category_lists: dict[str, list[str]]
                         ) -> dict[str, list[str]]:
    """Every category list always offers "Other" (reference
    ensure_step1_other_options)."""
    return {k: (v if OTHER_OPTION in v else [*v, OTHER_OPTION])
            for k, v in category_lists.items()}


def load_and_validate_schema(config_root: str, version: str
                             ) -> SchemaConfig:
    """Load ``{config_root}/app_schema_{version}.json`` and bootstrap the
    versioned table/registry/category configuration (reference
    utils/load_and_validate_schema.py:156-306, offline analogue)."""
    path = os.path.join(config_root, f"app_schema_{version}.json")
    if not os.path.isfile(path):
        raise FileNotFoundError(
            f"App schema not found at expected path: {path}")
    with open(path) as f:
        app_schema = json.load(f)

    missing = [k for k in _REQUIRED_KEYS if k not in app_schema]
    if missing:
        raise ValueError(
            f"Required key missing from app_schema JSON ({path}): {missing}")
    tables = app_schema["table_names"]
    if "required" not in tables:
        raise ValueError(
            f"Required key missing from app_schema JSON ({path}): "
            "table_names.required")

    registry_version = str(app_schema["registry_version"])
    old_version = app_schema.get("old_registry_version")
    allow_old = bool(app_schema.get("allow_old_registry", False))

    def _resolve(p: str) -> str:
        return p if os.path.isabs(p) else os.path.join(config_root, p)

    categories_csv = _resolve(app_schema["categories_csv"])
    category_lists = ensure_other_options(_read_categories(
        categories_csv, list(app_schema["category_mandatory_fields"])))

    return SchemaConfig(
        app_schema=app_schema,
        version=version,
        version_display=f"Engine {version} - registry {registry_version}",
        default_delimiter=str(app_schema["default_input_delimiter"]),
        registry_version=registry_version,
        old_registry_version=(str(old_version) if old_version else None),
        allow_old_registry=allow_old,
        required_tables=list(tables["required"]),
        optional_tables=list(tables.get("optional", [])),
        registry_mandatory_fields=list(
            app_schema["registry_mandatory_fields"]),
        category_mandatory_fields=list(
            app_schema["category_mandatory_fields"]),
        registry_csv=_resolve(app_schema["registry_csv"]),
        categories_csv=categories_csv,
        category_lists=category_lists,
    )
