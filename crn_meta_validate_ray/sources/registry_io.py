"""Registry I/O + config plumbing (SURVEY §2.1 S8-S10, §2.4 J4, §2.10 W3).

The reference's rule registry is a spreadsheet (one row per (Table, Field))
loaded, completeness-checked, deduplicated and filtered at startup
(utils/cde.py:258-469); templates for data authors are generated from it
(utils/template_files.py:30-107); an eventually-consistent source is polled
with a bounded status retry (utils/validate_core.py:534-627).  Same
observable behavior here, CSV/DataFrame-based and Streamlit-free.
"""

from __future__ import annotations

import time

import pandas as pd

from crn_meta_validate_ray.registry import (
    FieldRule,
    RegistryError,
    TableRules,
    parse_allow_multi,
)

MANDATORY_COLUMNS = ("Table", "Field", "DataType", "Required")
OPTIONAL_COLUMNS = ("Validation", "FillNull", "AllowMultiEnum", "Description")


def table_rules_from_dataframe(df: pd.DataFrame, table: str,
                               locator: tuple = ()) -> TableRules:
    """Build TableRules from a CDE-style rule table.

    Load behavior matching the reference: mandatory columns must exist
    (utils/cde.py:471-524), duplicate rows are dropped (:467), `Alias` rows
    are dropped at load (:454-456) while `Assigned` rows are kept but
    skipped at validation (utils/validate_core.py:210-211)."""
    missing = [c for c in MANDATORY_COLUMNS if c not in df.columns]
    if missing:
        raise RegistryError(f"registry missing mandatory columns: {missing}")
    sub = df[df["Table"].astype(str) == table].copy()
    sub = sub.drop_duplicates()
    bad_fields = sub["Field"].isna() | (sub["Field"].astype(str).str.strip() == "")
    if bad_fields.any():
        raise RegistryError(f"registry has {int(bad_fields.sum())} rows with "
                            f"empty Field for table {table!r}")
    fields = []
    for _, row in sub.iterrows():
        required = str(row["Required"]).strip()
        if required == "Alias":
            continue
        fields.append(FieldRule(
            field=str(row["Field"]).strip(),
            required=required,
            datatype=str(row["DataType"]).strip(),
            validation=(row.get("Validation")
                        if pd.notna(row.get("Validation")) else None),
            fillnull=(row.get("FillNull")
                      if pd.notna(row.get("FillNull")) else ()),
            allow_multi=parse_allow_multi(row.get("AllowMultiEnum")),
            description=(str(row.get("Description"))
                         if pd.notna(row.get("Description")) else ""),
        ))
    return TableRules(table=table, fields=fields, locator=locator)


def table_rules_from_csv(path: str, table: str, locator: tuple = ()
                         ) -> TableRules:
    return table_rules_from_dataframe(
        pd.read_csv(path, dtype=str, keep_default_na=False, na_values=[]),
        table, locator)


def rules_to_dataframe(rules: TableRules) -> pd.DataFrame:
    """Inverse of table_rules_from_dataframe (round-trippable)."""
    rows = []
    for r in rules.fields:
        rows.append({
            "Table": rules.table, "Field": r.field, "DataType": r.datatype,
            "Required": r.required,
            "Validation": (str(list(r.validation))
                           if r.datatype == "Enum" and r.validation
                           else (r.validation or "")),
            "FillNull": str(list(r.fillnull)) if r.fillnull else "",
            "AllowMultiEnum": "True" if r.allow_multi else "",
            "Description": r.description,
        })
    return pd.DataFrame(rows)


def template_rows(rules: TableRules) -> pd.DataFrame:
    """Author-facing template (reference utils/template_files.py:30-107:
    per field — Field / Description / DataType / Required / Validation-or-
    marker / FillNull), deterministic field order."""
    rows = []
    for r in sorted(rules.active_fields(), key=lambda x: x.field):
        if r.datatype == "Enum":
            validation = ";".join(str(v) for v in r.enum_vocab()) \
                if r.allow_multi else " | ".join(str(v) for v in r.enum_vocab())
        elif r.datatype == "Regex":
            validation = f"/{r.regex_pattern()}/"
        else:
            validation = f"<{r.datatype.lower()}>"
        rows.append({
            "Field": r.field,
            "Description": r.description,
            "DataType": r.datatype,
            "Required": r.required,
            "Validation": validation,
            "FillNull": ", ".join(str(f) for f in r.fillnull),
        })
    return pd.DataFrame(rows)


def split_status_rows(df: pd.DataFrame, column: str, expected_prefix: str,
                      transient: list[str]
                      ) -> tuple[pd.DataFrame, pd.DataFrame, pd.DataFrame]:
    """Partition rows by a trimmed status column into (not-ok, transient,
    hard-invalid) — reference get_invalid_status_rows
    (utils/validate_core.py:534-577)."""
    status = df[column].fillna("").astype(str).str.strip()
    not_ok = df[~status.str.startswith(expected_prefix)]
    transient_rows = df[status.isin(transient)]
    hard = df[(~status.str.startswith(expected_prefix))
              & (~status.isin(transient))]
    return not_ok, transient_rows, hard


def load_with_status_retry(load_fn, *, max_tries: int = 5,
                           sleep_seconds: float = 2.0,
                           expected_prefix: str = "Ok: ",
                           status_column: str = "Status",
                           transient: list[str] | None = None
                           ) -> pd.DataFrame:
    """Bounded retry for an eventually-consistent registry source
    (reference read_valid_categories_with_status_retry,
    utils/validate_core.py:580-627): retry only while every failing row is
    transient; hard-invalid statuses return immediately for the caller to
    handle."""
    transient = ["Loading...", ""] if transient is None else transient
    last = None
    for attempt in range(1, max_tries + 1):
        last = load_fn()
        not_ok, _, hard = split_status_rows(last, status_column,
                                            expected_prefix, transient)
        if not_ok.empty:
            return last
        if not hard.empty:
            return last
        if attempt < max_tries:
            time.sleep(sleep_seconds)
    return last


def reconcile_vocab(rules: TableRules, config_lists: dict[str, list]
                    ) -> list[str]:
    """Registry-vs-config consistency check (reference
    utils/validate_ui.py:244-340): per field, symmetric difference between
    the registry Enum vocabulary and the externally-configured list.
    Returns mismatch messages (empty = consistent)."""
    problems = []
    by_field = {r.field: r for r in rules.active_fields()}
    for field, values in sorted(config_lists.items()):
        rule = by_field.get(field)
        if rule is None:
            problems.append(f"config lists values for unknown field '{field}'")
            continue
        if rule.datatype != "Enum":
            problems.append(f"field '{field}' is {rule.datatype}, not Enum")
            continue
        reg = set(str(v) for v in rule.enum_vocab())
        cfg = set(str(v) for v in values)
        only_reg = sorted(reg - cfg)
        only_cfg = sorted(cfg - reg)
        if only_reg or only_cfg:
            problems.append(
                f"field '{field}': registry-only {only_reg}, "
                f"config-only {only_cfg}")
    return problems
