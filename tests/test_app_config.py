"""Versioned app-schema bootstrap (reference
utils/load_and_validate_schema.py:156-306, offline analogue)."""

import json

import pandas as pd
import pytest

from crn_meta_validate_ray.sources.app_config import (
    SchemaConfig,
    ensure_other_options,
    load_and_validate_schema,
)


def _write_fixture(root, version="v1.2", old_version="v1.1",
                   allow_old=True, status=("OK: synced", "OK: synced")):
    reg = pd.DataFrame({
        "Table": ["turns", "turns", "conversations"],
        "Field": ["conv_id", "role", "conv_id"],
        "DataType": ["Regex", "Enum", "Regex"],
        "Required": ["Required", "Required", "Required"],
        "Validation": [r"conv_[0-9]+", "['user','assistant']",
                       r"conv_[0-9]+"],
        "FillNull": ["", "", ""],
        "AllowMultiEnum": ["", "", ""],
        "Description": ["", "", ""],
    })
    reg.to_csv(root / f"registry_{version}.csv", index=False)
    if old_version:
        reg2 = reg.copy()
        reg2.loc[1, "Validation"] = "['user']"  # stricter old vocab
        reg2.to_csv(root / f"registry_{old_version}.csv", index=False)
    cats = pd.DataFrame({
        "Species": ["human", "mouse"],
        "SampleSource": ["brain", "blood"],
        "Status": list(status),
    })
    cats.to_csv(root / "categories.csv", index=False)
    schema = {
        "registry_version": version,
        "old_registry_version": old_version,
        "allow_old_registry": allow_old,
        "default_input_delimiter": ",",
        "table_names": {"required": ["turns"],
                        "optional": ["conversations"]},
        "registry_mandatory_fields": ["Table", "Field", "DataType",
                                      "Required"],
        "category_mandatory_fields": ["Species", "SampleSource", "Status"],
        "registry_csv": f"registry_{version}.csv",
        "categories_csv": "categories.csv",
    }
    with open(root / f"app_schema_{version}.json", "w") as f:
        json.dump(schema, f)
    return version


def test_bootstrap_binds_tables_options_and_versions(tmp_path):
    v = _write_fixture(tmp_path)
    cfg = load_and_validate_schema(str(tmp_path), v)
    assert isinstance(cfg, SchemaConfig)
    assert cfg.version_display == "Engine v1.2 - registry v1.2"
    assert cfg.default_delimiter == ","
    assert cfg.tables() == ["turns", "conversations"]
    # "Other" always injected into every category list
    assert cfg.category_lists["Species"] == ["human", "mouse", "Other"]
    assert cfg.category_lists["SampleSource"][-1] == "Other"

    cs = cfg.constraint_set(locators={"turns": ("conv_id",)})
    turns = cs.for_table("turns")
    assert {f.field for f in turns.fields} == {"conv_id", "role"}
    assert turns.locator == ("conv_id",)
    assert set(cs.tables) == {"turns", "conversations"}

    # dual-validation path loads the OLD registry version
    old_turns = cfg.constraint_set(old=True).for_table("turns")
    role = [f for f in old_turns.fields if f.field == "role"][0]
    assert list(role.enum_vocab()) == ["user"]


def test_bootstrap_error_surfaces(tmp_path):
    v = _write_fixture(tmp_path)
    with pytest.raises(FileNotFoundError):
        load_and_validate_schema(str(tmp_path), "v9.9")

    # missing required key → ValueError naming it
    p = tmp_path / f"app_schema_{v}.json"
    schema = json.loads(p.read_text())
    del schema["default_input_delimiter"]
    p.write_text(json.dumps(schema))
    with pytest.raises(ValueError, match="default_input_delimiter"):
        load_and_validate_schema(str(tmp_path), v)


def test_bootstrap_refuses_unsynced_categories(tmp_path):
    v = _write_fixture(tmp_path, status=("OK: synced", "PENDING"))
    with pytest.raises(RuntimeError, match="unsynced"):
        load_and_validate_schema(str(tmp_path), v)


def test_old_registry_gate(tmp_path):
    v = _write_fixture(tmp_path, allow_old=False)
    cfg = load_and_validate_schema(str(tmp_path), v)
    with pytest.raises(ValueError, match="allow_old_registry"):
        cfg.constraint_set(old=True)


def test_ensure_other_idempotent():
    lists = {"a": ["x", "Other"], "b": ["y"]}
    out = ensure_other_options(lists)
    assert out["a"] == ["x", "Other"] and out["b"] == ["y", "Other"]
