"""Registry self-validation, serialization and hashing
(reference analogue: utils/cde.py:471-524 completeness gate)."""

import pytest

from crn_meta_validate_ray.registry import (
    ConstraintSet,
    FieldRule,
    RegistryError,
    TableRules,
    conversation_rules,
    parse_literal_list,
    transcript_rules,
)


def test_parse_literal_list():
    assert parse_literal_list("['a', 'b']") == ["a", "b"]
    assert parse_literal_list("'x'") == ["x"]
    assert parse_literal_list("") == []
    assert parse_literal_list(None) == []
    assert parse_literal_list(["a"]) == ["a"]


def test_rule_validation_gates():
    with pytest.raises(RegistryError):
        FieldRule("x", "Mandatory", "String")
    with pytest.raises(RegistryError):
        FieldRule("x", "Required", "Whatever")
    with pytest.raises(RegistryError):
        FieldRule("x", "Required", "Enum", "[]")
    with pytest.raises(RegistryError):
        FieldRule("x", "Required", "Regex", "  ")
    with pytest.raises(RegistryError):
        TableRules("t", fields=[FieldRule("a"), FieldRule("a")])


def test_assigned_and_alias_rules_are_inactive():
    tr = TableRules("t", fields=[
        FieldRule("a", "Required"),
        FieldRule("b", "Assigned"),
        FieldRule("c", "Alias"),
        FieldRule("d", "Optional"),
    ])
    assert [r.field for r in tr.active_fields()] == ["a", "d"]
    assert tr.total_required == 1 and tr.total_optional == 1


def test_constraint_set_hash_and_json_roundtrip():
    cs = ConstraintSet().add(transcript_rules()).add(conversation_rules())
    h1 = cs.content_hash()
    cs2 = ConstraintSet.from_json(cs.to_json())
    assert cs2.content_hash() == h1
    # changing any rule changes the hash
    cs3 = ConstraintSet.from_json(cs.to_json())
    cs3.tables["turns"].fields[0] = FieldRule("conv_id", "Required", "Regex",
                                              r"conv_[0-9]{9}")
    assert cs3.content_hash() != h1


def test_fillnull_parsed_from_literal():
    r = FieldRule("x", "Optional", "Enum", ["a"], fillnull="['NA', 'Other']")
    assert r.fillnull == ("NA", "Other")
