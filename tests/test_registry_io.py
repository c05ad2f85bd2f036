"""Registry I/O: CSV load gates, templates, status retry, vocab
reconciliation (reference utils/cde.py, template_files.py,
validate_core.py:534-627, validate_ui.py:244-340)."""

import pandas as pd
import pytest

from crn_meta_validate_ray.registry import RegistryError, transcript_rules
from crn_meta_validate_ray.sources.registry_io import (
    load_with_status_retry,
    reconcile_vocab,
    rules_to_dataframe,
    split_status_rows,
    table_rules_from_dataframe,
    template_rows,
)


def _cde_df():
    return pd.DataFrame([
        {"Table": "turns", "Field": "role", "DataType": "Enum",
         "Required": "Required", "Validation": "['user','assistant']",
         "FillNull": "['NA']", "AllowMultiEnum": "", "Description": "who"},
        {"Table": "turns", "Field": "tool", "DataType": "Enum",
         "Required": "Optional", "Validation": "['code','search']",
         "FillNull": "['NA']", "AllowMultiEnum": "1.0", "Description": ""},
        {"Table": "turns", "Field": "legacy", "DataType": "String",
         "Required": "Alias", "Validation": "", "FillNull": "",
         "AllowMultiEnum": "", "Description": ""},
        {"Table": "turns", "Field": "assigned_id", "DataType": "String",
         "Required": "Assigned", "Validation": "", "FillNull": "",
         "AllowMultiEnum": "", "Description": ""},
        {"Table": "other", "Field": "x", "DataType": "String",
         "Required": "Required", "Validation": "", "FillNull": "",
         "AllowMultiEnum": "", "Description": ""},
    ])


def test_load_from_dataframe_drops_alias_keeps_assigned():
    tr = table_rules_from_dataframe(_cde_df(), "turns")
    names = [r.field for r in tr.fields]
    assert "legacy" not in names            # Alias dropped at load
    assert "assigned_id" in names           # Assigned kept...
    assert [r.field for r in tr.active_fields()] == ["role", "tool"]  # ...but inactive
    assert tr.fields[1].allow_multi         # "1.0" Excel quirk truthy


def test_load_gates():
    with pytest.raises(RegistryError):
        table_rules_from_dataframe(pd.DataFrame({"Table": [], "Field": []}),
                                   "turns")
    bad = _cde_df()
    bad.loc[0, "Field"] = "  "
    with pytest.raises(RegistryError):
        table_rules_from_dataframe(bad, "turns")


def test_roundtrip():
    tr = table_rules_from_dataframe(_cde_df(), "turns")
    df = rules_to_dataframe(tr)
    tr2 = table_rules_from_dataframe(df, "turns")
    assert [r.field for r in tr2.fields] == [r.field for r in tr.fields]
    assert tr2.fields[0].enum_vocab() == tr.fields[0].enum_vocab()


def test_template_rows():
    t = template_rows(transcript_rules())
    assert list(t.columns) == ["Field", "Description", "DataType", "Required",
                               "Validation", "FillNull"]
    by_field = t.set_index("Field")
    assert by_field.loc["role", "Validation"].count("|") == 3
    assert ";" in by_field.loc["tool", "Validation"]     # multi-enum marker
    assert by_field.loc["conv_id", "Validation"].startswith("/")


def test_split_status_rows():
    df = pd.DataFrame({"Status": ["Ok: fine", " Loading...", "", "Broken"],
                       "v": [1, 2, 3, 4]})
    not_ok, transient, hard = split_status_rows(df, "Status", "Ok: ",
                                                ["Loading...", ""])
    assert not_ok["v"].tolist() == [2, 3, 4]
    assert transient["v"].tolist() == [2, 3]
    assert hard["v"].tolist() == [4]


def test_status_retry_semantics():
    calls = {"n": 0}

    def transient_then_ok():
        calls["n"] += 1
        status = "Loading..." if calls["n"] < 3 else "Ok: ready"
        return pd.DataFrame({"Status": [status]})

    out = load_with_status_retry(transient_then_ok, sleep_seconds=0)
    assert calls["n"] == 3 and out["Status"].iloc[0] == "Ok: ready"

    def hard_invalid():
        calls["n"] += 1
        return pd.DataFrame({"Status": ["Error: nope"]})

    calls["n"] = 0
    out = load_with_status_retry(hard_invalid, sleep_seconds=0)
    assert calls["n"] == 1          # hard failure → no retry


def test_reconcile_vocab():
    tr = transcript_rules()
    ok = reconcile_vocab(tr, {"role": ["system", "user", "assistant", "tool"]})
    assert ok == []
    bad = reconcile_vocab(tr, {"role": ["system", "user", "operator"],
                               "text": ["x"], "nope": ["y"]})
    assert len(bad) == 3
    assert any("registry-only ['assistant', 'tool']" in m for m in bad)
    assert any("config-only ['operator']" in m for m in bad)
