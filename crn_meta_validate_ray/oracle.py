"""Single-process pandas oracle of the reference validation semantics.

An independent, deliberately-simple implementation of the reference's
``normalize → validate_table_eval → compose_validation_report`` chain
(utils/validate_core.py:143-355, utils/find_missing_values.py) used by the
pytest suite as the ground truth the distributed engine must match
verdict-for-verdict and violation-row-for-violation-row.  It holds whole
tables in memory and loops per rule — fine at test scale, never used in the
engine's hot path.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from crn_meta_validate_ray.registry import (
    NULL_LIKE_TOKENS,
    NULL_SENTINEL,
    FieldRule,
    TableRules,
)
from crn_meta_validate_ray.report import (
    ReportCollector,
    TableEvalResult,
    compose_validation_report,
)
from crn_meta_validate_ray.pipelines.validate_pipeline import expected_description


def oracle_normalize(df: pd.DataFrame, sentinel: str = NULL_SENTINEL
                     ) -> pd.DataFrame:
    """Null-normalize every column to the sentinel (reference:
    utils/find_missing_values.py:37-70)."""
    out = df.copy()
    for col in out.columns:
        s = out[col].astype("string")
        s = s.mask(s.str.fullmatch(r"\s*").fillna(False), sentinel)
        s = s.fillna(sentinel)
        s = s.replace({t: sentinel for t in NULL_LIKE_TOKENS})
        out[col] = s
    return out


def _cell_valid(rule: FieldRule, s: pd.Series) -> pd.Series:
    specials = set(str(f) for f in rule.fillnull) | {NULL_SENTINEL}
    if rule.datatype == "String":
        return pd.Series(True, index=s.index)
    if rule.datatype in ("Integer", "Float"):
        num = pd.to_numeric(s, errors="coerce")
        ok = num.notna() if rule.datatype == "Float" else (
            num.notna() & ((num % 1) == 0))
        return s.isin(specials) | ok
    if rule.datatype == "Enum":
        vocab = set(str(v) for v in rule.enum_vocab())
        if rule.allow_multi:
            fillnull = set(str(f) for f in rule.fillnull)

            def one(v):
                if v in fillnull or v == NULL_SENTINEL:
                    return True
                toks = [t.strip() for t in str(v).split(";") if t.strip()]
                return bool(toks) and all(t in vocab for t in toks)

            return s.map(one)
        accept = vocab | set(str(f) for f in rule.fillnull)
        return s.isin(accept)
    if rule.datatype == "Regex":
        try:
            pat = re.compile(rule.regex_pattern())
        except re.error:
            return s.isin(specials)
        return s.isin(specials) | s.map(
            lambda v: pat.fullmatch(str(v)) is not None)
    if rule.datatype == "Timestamp":
        parsed = pd.to_datetime(s, errors="coerce", format="ISO8601")
        return s.isin(specials) | parsed.notna()
    raise AssertionError(rule.datatype)


def oracle_validate(df_normalized: pd.DataFrame, rules: TableRules
                    ) -> TableEvalResult:
    """Field-by-field evaluation with reference-parity outputs; also returns
    engine-style violation rows via ``oracle_violations``."""
    res = TableEvalResult(total_required=rules.total_required,
                          total_optional=rules.total_optional,
                          n_rows=len(df_normalized))
    all_fields = {str(r.field) for r in rules.fields}
    res.extra_columns = sorted(set(map(str, df_normalized.columns)) - all_fields)

    for rule in rules.active_fields():
        col = rule.field
        if col not in df_normalized.columns:
            (res.missing_required if rule.is_required
             else res.missing_optional).append(col)
            continue
        s = df_normalized[col].astype("string")
        n_null = int((s == NULL_SENTINEL).sum())
        if n_null == len(s) and len(s) > 0:
            (res.all_null_required if rule.is_required
             else res.all_null_optional).append(col)
        elif n_null > 0:
            res.null_columns.append((rule.opt_req, col, n_null))
        valid = _cell_valid(rule, s)
        failing = s[~valid.to_numpy(dtype=bool)].unique()
        if len(failing):
            found = ", ".join(f"'{v}'" for v in failing)
            res.invalid_entries.append(
                (rule.opt_req, col, len(failing), expected_description(rule),
                 found))
            (res.invalid_required if rule.is_required
             else res.invalid_optional).append(col)
    return res


def oracle_violation_rows(df_normalized: pd.DataFrame, rules: TableRules
                          ) -> set[tuple]:
    """The engine-comparable violation set:
    {(column, constraint_id, row_key, value)}."""
    out: set[tuple] = set()
    loc_cols = [c for c in rules.locator if c in df_normalized.columns]
    if loc_cols:
        row_key = df_normalized[loc_cols].astype(str).agg("|".join, axis=1)
    else:
        row_key = pd.Series(np.arange(len(df_normalized)).astype(str),
                            index=df_normalized.index)
    for rule in rules.active_fields():
        col = rule.field
        if col not in df_normalized.columns:
            continue
        s = df_normalized[col].astype("string")
        valid = _cell_valid(rule, s).to_numpy(dtype=bool)
        for i in np.nonzero(~valid)[0]:
            out.add((col, rule.constraint_id, row_key.iloc[i], s.iloc[i]))
    return out


def oracle_group_checks(df: pd.DataFrame, rules: TableRules) -> dict:
    """Exact in-memory sequence / uniqueness / referential ground truth."""
    out: dict = {}
    for seq in rules.sequences:
        bad = []
        for g, grp in df.groupby(seq.group_col, sort=True):
            idx = pd.to_numeric(grp[seq.index_col], errors="coerce").dropna()
            uniq = np.unique(idx.to_numpy())
            contiguous = (len(uniq) > 0 and uniq[0] == seq.start
                          and len(uniq) == uniq[-1] - seq.start + 1)
            if not contiguous:
                bad.append(str(g))
        out[seq.constraint_id] = sorted(bad)
    for u in rules.unique:
        counts = df.groupby(list(u.columns)).size()
        dups = counts[counts > 1]
        out[u.constraint_id] = sorted(
            "|".join(str(p) for p in (k if isinstance(k, tuple) else (k,)))
            for k in dups.index)
    return out


def oracle_report(df: pd.DataFrame, rules: TableRules,
                  include_details: bool = True) -> dict:
    """validate_table_core analogue: normalize → eval → compose."""
    norm = oracle_normalize(df)
    res = oracle_validate(norm, rules)
    rep = ReportCollector()
    errors, warnings = compose_validation_report(res, rules.table, rep,
                                                 include_details)
    return {"report": rep, "errors": errors, "warnings": warnings,
            "result": res, "normalized": norm}


def validate_table_core(df: pd.DataFrame, table_name: str,
                        rules: TableRules | None = None,
                        report: ReportCollector | None = None,
                        include_details: bool = True) -> dict:
    """Single-process convenience mirroring the reference's Streamlit-free
    public API (utils/validate_core.py:488-531, added "for external calls"
    per its CHANGELOG): normalize → evaluate → compose.  Returns
    {"report", "errors", "warnings"}.  For distributed inputs use
    pipelines.validate_pipeline.validate_dataset."""
    if rules is None:
        raise ValueError("rules (TableRules) is required")
    if rules.table != table_name:
        rules = TableRules(table=table_name, fields=rules.fields,
                           locator=rules.locator)
    out = oracle_report(df, rules, include_details=include_details)
    if report is not None:
        report.entries.extend(out["report"].entries)
        out["report"] = report
    return {"report": out["report"], "errors": out["errors"],
            "warnings": out["warnings"]}
