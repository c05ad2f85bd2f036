"""Declarative constraint registry (the CDE analogue).

The reference drives validation from a rule spreadsheet with one row per
(Table, Field) and columns ``Table, Field, DataType, Required, Validation,
FillNull, AllowMultiEnum`` (reference: ``resource/app_schema_v0.9.3.json:9-22``,
``utils/cde.py:258-339``).  Here the registry is a set of frozen dataclasses
compiled once on the driver into vectorized per-batch checkers; the compiled
set is tiny (KBs) and ships to workers inside task closures / actor args.

Beyond the reference's per-cell rules we add the distributed rule kinds the
engine needs at scale (absent from the reference, which validates tables
independently and in-memory): uniqueness, referential integrity, sequence
contiguity and distribution drift.
"""

from __future__ import annotations

import ast
import hashlib
import json
import re
from dataclasses import dataclass, field, asdict

# Canonical sentinel for null-like values (reference:
# utils/find_missing_values.py:4  NULL_SENTINEL = "NA").
NULL_SENTINEL = "NA"

# Textual tokens normalized to the sentinel (reference:
# utils/find_missing_values.py:7-15).  Note "NA" itself is NOT in this set —
# it is already the sentinel.
NULL_LIKE_TOKENS = ("none", "None", "nan", "NaN", "NAN", "N/A", "n/a")

VALID_REQUIRED = ("Required", "Optional", "Assigned", "Alias")
VALID_DATATYPES = ("Integer", "Float", "Enum", "Regex", "String", "Timestamp",
                   "Custom")

# --- user-extension surface (SURVEY §2.11): custom constraint kinds -------
# A custom check is registered by NAME and referenced from a FieldRule as
# ``FieldRule(col, "Required", "Custom", "name")`` — the rule stays
# JSON-serializable and the constraint-set content hash stays stable (the
# hash covers the name, so renaming/re-pointing a check invalidates
# checkpoint lineage, as a semantic change should).  The callable receives
# the null-normalized string view of the column (pa.Array) and returns a
# boolean validity mask (np.ndarray or pa.Array) — vectorize it; it runs
# once per batch inside the fused validation pass.  Register at module
# import time so Ray workers (which import the library) see it too.
CUSTOM_CHECKS: dict = {}


def register_custom_check(name: str, fn) -> None:
    CUSTOM_CHECKS[str(name)] = fn


def get_custom_check(name: str):
    try:
        return CUSTOM_CHECKS[str(name)]
    except KeyError:
        raise RegistryError(
            f"custom check {name!r} is not registered (register_custom_check "
            "must run at import time in every worker)") from None

# Truthiness set for AllowMultiEnum — reference utils/validate_core.py:284-285
# (Excel stores 1 as float, so str() gives "1.0").
_MULTI_TRUTHY = ("true", "1", "1.0", "yes")


def parse_allow_multi(raw: object) -> bool:
    """Parse an AllowMultiEnum cell the way the reference does
    (utils/validate_core.py:283-285)."""
    if raw is None:
        return False
    if isinstance(raw, bool):
        return raw
    return str(raw).strip().lower() in _MULTI_TRUTHY


def parse_literal_list(raw: object) -> list:
    """Parse a rule cell holding a Python-list literal; scalars become a
    one-element list (reference semantics: utils/validate_core.py:65-76)."""
    if raw is None:
        return []
    if isinstance(raw, (list, tuple)):
        return list(raw)
    text = str(raw).strip()
    if not text:
        return []
    val = ast.literal_eval(text)
    return val if isinstance(val, list) else [val]


class RegistryError(ValueError):
    """Raised when the registry itself fails self-validation (the analogue of
    the reference's CDE completeness gate, utils/cde.py:471-524)."""


@dataclass(frozen=True)
class FieldRule:
    """One per-column rule row (reference CDE row; semantics per
    utils/validate_core.py:143-355).

    ``datatype`` semantics (applied to the null-normalized string view of
    the column):

    - ``Integer``  — valid iff special or numeric-parseable with no
      fractional part (reference :238-252).
    - ``Float``    — valid iff special or numeric-parseable (:254-268).
    - ``Enum``     — valid iff value in Validation ∪ FillNull (:270-315);
      note the sentinel "NA" is *not* automatically allowed for single-value
      enums (only multi-enums allow it, :291), replicated exactly.
    - ``Regex``    — valid iff special or fullmatch(Validation) (:317-339);
      an unparseable pattern makes every non-special cell invalid (:324-327).
    - ``String``   — no restriction (:341).
    - ``Timestamp``— engine extension: valid iff special or the value parses
      as a timestamp (native timestamp columns trivially pass).

    "special" = FillNull ∪ {"NA"} (reference :228-229).
    """

    field: str
    required: str = "Required"  # Required | Optional | Assigned | Alias
    datatype: str = "String"
    validation: object = None   # enum vocab (list / list-literal) or regex pattern
    fillnull: tuple = ()
    allow_multi: bool = False
    description: str = ""

    def __post_init__(self):
        if self.required not in VALID_REQUIRED:
            raise RegistryError(f"rule {self.field!r}: bad Required {self.required!r}")
        if self.datatype not in VALID_DATATYPES:
            raise RegistryError(f"rule {self.field!r}: bad DataType {self.datatype!r}")
        object.__setattr__(self, "fillnull", tuple(parse_literal_list(self.fillnull)))
        if self.datatype == "Enum":
            vocab = parse_literal_list(self.validation)
            if not vocab:
                raise RegistryError(f"Enum rule {self.field!r} has empty Validation")
            object.__setattr__(self, "validation", tuple(str(v) for v in vocab))
        elif self.datatype == "Regex":
            if self.validation is None or not str(self.validation).strip():
                raise RegistryError(f"Regex rule {self.field!r} has empty Validation")
            object.__setattr__(self, "validation", str(self.validation).strip())
        elif self.datatype == "Custom":
            if self.validation is None or not str(self.validation).strip():
                raise RegistryError(
                    f"Custom rule {self.field!r} needs the registered check "
                    "name in Validation")
            object.__setattr__(self, "validation", str(self.validation).strip())

    @property
    def is_required(self) -> bool:
        return self.required == "Required"

    @property
    def opt_req(self) -> str:
        # Reference renders "REQUIRED"/"OPTIONAL" (utils/validate_core.py:214).
        return "REQUIRED" if self.is_required else "OPTIONAL"

    @property
    def constraint_id(self) -> str:
        return f"{self.datatype.lower()}:{self.field}"

    def enum_vocab(self) -> tuple:
        return tuple(self.validation) if self.datatype == "Enum" else ()

    def regex_pattern(self) -> str:
        return str(self.validation) if self.datatype == "Regex" else ""

    def pattern_is_valid(self) -> bool:
        if self.datatype != "Regex":
            return True
        try:
            re.compile(self.regex_pattern())
            return True
        except re.error:
            return False


@dataclass(frozen=True)
class UniqueRule:
    """Engine extension: no duplicate rows on ``columns`` (north-star
    uniqueness; the reference never checks per-row PK uniqueness)."""

    columns: tuple
    severity: str = "error"

    def __post_init__(self):
        object.__setattr__(self, "columns", tuple(self.columns))

    @property
    def constraint_id(self) -> str:
        return f"unique:{','.join(self.columns)}"


@dataclass(frozen=True)
class RefRule:
    """Engine extension: every value of ``column`` must resolve to a row of
    ``target_table``.``target_column`` (anti-join survivors are violations)."""

    column: str
    target_table: str
    target_column: str
    severity: str = "error"

    @property
    def constraint_id(self) -> str:
        return f"ref:{self.column}->{self.target_table}.{self.target_column}"


@dataclass(frozen=True)
class SeqRule:
    """Engine extension: within each group keyed by ``group_col``,
    ``index_col`` must form the contiguous sequence start..start+n-1
    (no gaps, no duplicates, correct start)."""

    group_col: str
    index_col: str
    start: int = 0
    severity: str = "error"

    @property
    def constraint_id(self) -> str:
        return f"seq:{self.index_col}@{self.group_col}"


@dataclass(frozen=True)
class CondRule:
    """Engine extension: cross-column conditional constraint — when the
    null-normalized value of ``if_col`` is in ``if_values``, the
    null-normalized value of ``then_col`` must be in ``then_values``
    (or merely non-missing, i.e. != "NA", when ``then_values`` is empty).

    The reference validates columns independently; conditional
    (row-level, cross-column) rules are the standard next step for a
    schema registry — e.g. role='tool' implies a concrete tool value.
    Evaluated inside the fused per-cell pass (stages/validate.py), so the
    check costs one extra vectorized mask per batch and no extra read."""

    if_col: str
    if_values: tuple
    then_col: str
    then_values: tuple = ()
    severity: str = "error"

    def __post_init__(self):
        iv = tuple(str(v) for v in parse_literal_list(self.if_values))
        if not iv:
            raise RegistryError(
                f"cond rule {self.if_col!r}->{self.then_col!r}: empty "
                "if_values")
        tv = tuple(str(v) for v in parse_literal_list(self.then_values))
        object.__setattr__(self, "if_values", iv)
        object.__setattr__(self, "then_values", tv)
        if not self.if_col or not self.then_col:
            raise RegistryError("cond rule needs both if_col and then_col")

    @property
    def constraint_id(self) -> str:
        return f"cond:{self.if_col}->{self.then_col}"


@dataclass(frozen=True)
class NullRateRule:
    """Engine extension: global null-rate of ``column`` must be <=
    ``max_rate`` (fraction in [0,1])."""

    column: str
    max_rate: float
    severity: str = "warning"

    @property
    def constraint_id(self) -> str:
        return f"null_rate:{self.column}"


@dataclass(frozen=True)
class DriftRule:
    """Engine extension: distribution-drift check on a derived quantity
    (``metric`` in {"ts_gap", "group_size", "column"}), comparing observed
    t-digest quantiles against declared expectations.

    ``expected_quantiles`` maps q (e.g. "0.5") -> expected value;
    ``tolerance`` is the allowed relative deviation.
    """

    metric: str
    column: str = ""
    group_col: str = ""
    expected_quantiles: tuple = ()   # tuple of (q, value) pairs
    tolerance: float = 0.5           # relative tolerance for global quantiles
    # when set, individual groups whose mean metric deviates from the
    # declared median by more than this relative factor are flagged as
    # per-group drift outliers (V14); None disables per-group flagging
    group_tolerance: float | None = None
    severity: str = "warning"

    def __post_init__(self):
        object.__setattr__(
            self,
            "expected_quantiles",
            tuple((float(q), float(v)) for q, v in self.expected_quantiles),
        )

    @property
    def constraint_id(self) -> str:
        tgt = self.column or self.group_col
        return f"drift:{self.metric}:{tgt}"


@dataclass
class TableRules:
    """All rules for one logical table, plus the row-locator columns used to
    address violations (the scalable replacement for the reference's dense
    ``invalid_cell_mask``, utils/validate_core.py:202)."""

    table: str
    fields: list = field(default_factory=list)
    locator: tuple = ()          # e.g. ("conv_id", "turn_idx")
    unique: list = field(default_factory=list)
    references: list = field(default_factory=list)
    sequences: list = field(default_factory=list)
    null_rates: list = field(default_factory=list)
    drift: list = field(default_factory=list)
    conditionals: list = field(default_factory=list)

    def __post_init__(self):
        self.locator = tuple(self.locator)
        self._validate()

    def _validate(self):
        # Registry self-validation, the analogue of the reference's
        # validate_cde_completeness gate (utils/cde.py:471-524): mandatory
        # attributes present, no empty field names, no duplicate rules.
        seen = set()
        for r in self.fields:
            if not isinstance(r, FieldRule):
                raise RegistryError(f"{self.table}: field rule {r!r} is not a FieldRule")
            if not r.field or not str(r.field).strip():
                raise RegistryError(f"{self.table}: rule with empty Field")
            if r.field in seen:
                raise RegistryError(f"{self.table}: duplicate rule for field {r.field!r}")
            seen.add(r.field)

    def active_fields(self) -> list:
        """Rules participating in validation: Assigned rows are skipped
        (utils/validate_core.py:210-211) and Alias rows are dropped at load
        (utils/cde.py:454-456)."""
        return [r for r in self.fields if r.required in ("Required", "Optional")]

    def referenced_columns(self) -> set:
        """Every input column any rule of this registry touches — the
        minimal projection a pruned read must carry (prune-at-the-read:
        unruled columns contribute only their NAME to the schema verdict,
        so their bytes never need to leave storage)."""
        cols = set(self.locator)
        cols |= {r.field for r in self.fields}
        cols |= {c for u in self.unique for c in u.columns}
        cols |= {r.column for r in self.references}
        cols |= {c for s in self.sequences for c in (s.group_col, s.index_col)}
        cols |= {r.column for r in self.null_rates}
        cols |= {d.column for d in self.drift if d.column}
        cols |= {d.group_col for d in self.drift if d.group_col}
        cols |= {c for r in self.conditionals for c in (r.if_col, r.then_col)}
        return cols

    @property
    def total_required(self) -> int:
        return sum(1 for r in self.active_fields() if r.is_required)

    @property
    def total_optional(self) -> int:
        return sum(1 for r in self.active_fields() if not r.is_required)

    def to_dict(self) -> dict:
        return asdict(self)


@dataclass
class ConstraintSet:
    """A collection of TableRules; hashable for checkpoint lineage."""

    tables: dict = field(default_factory=dict)  # name -> TableRules

    def add(self, rules: TableRules) -> "ConstraintSet":
        self.tables[rules.table] = rules
        return self

    def for_table(self, name: str) -> TableRules:
        return self.tables[name]

    def content_hash(self) -> str:
        """Stable hash of the full rule set — recorded in every checkpoint
        manifest so a resume run can detect registry changes."""
        payload = json.dumps(
            {name: tr.to_dict() for name, tr in sorted(self.tables.items())},
            sort_keys=True,
            default=str,
        )
        return hashlib.sha256(payload.encode()).hexdigest()[:16]

    def to_json(self) -> str:
        return json.dumps({name: tr.to_dict() for name, tr in self.tables.items()},
                          indent=2, default=list)

    @classmethod
    def from_json(cls, text: str) -> "ConstraintSet":
        raw = json.loads(text)
        cs = cls()
        for name, td in raw.items():
            cs.add(
                TableRules(
                    table=td["table"],
                    fields=[FieldRule(**fr) for fr in td.get("fields", [])],
                    locator=tuple(td.get("locator", ())),
                    unique=[UniqueRule(**u) for u in td.get("unique", [])],
                    references=[RefRule(**r) for r in td.get("references", [])],
                    sequences=[SeqRule(**s) for s in td.get("sequences", [])],
                    null_rates=[NullRateRule(**n) for n in td.get("null_rates", [])],
                    drift=[DriftRule(**d) for d in td.get("drift", [])],
                    conditionals=[CondRule(**c)
                                  for c in td.get("conditionals", [])],
                )
            )
        return cs


def transcript_rules() -> TableRules:
    """The flagship registry for the transcript `turns` table
    (shape per BASELINE.json:input_hint / FIXTURES.md)."""
    return TableRules(
        table="turns",
        locator=("conv_id", "turn_idx"),
        fields=[
            FieldRule("conv_id", "Required", "Regex", r"conv_[0-9]{8}"),
            FieldRule("turn_idx", "Required", "Integer"),
            FieldRule("role", "Required", "Enum",
                      ["system", "user", "assistant", "tool"], fillnull=["NA"]),
            FieldRule("text", "Required", "String", fillnull=["Not available", "NA"]),
            FieldRule("tool", "Optional", "Enum",
                      ["none", "search", "code", "browser", "calculator"],
                      fillnull=["NA", "Other"], allow_multi=True),
            FieldRule("ts", "Required", "Timestamp"),
        ],
        unique=[UniqueRule(("conv_id", "turn_idx"))],
        references=[RefRule("conv_id", "conversations", "conv_id")],
        sequences=[SeqRule("conv_id", "turn_idx", start=0)],
        null_rates=[NullRateRule("text", max_rate=0.05)],
        drift=[
            DriftRule(metric="group_size", group_col="conv_id",
                      expected_quantiles=((0.5, 12.0),), tolerance=1.0),
            DriftRule(metric="ts_gap", column="ts", group_col="conv_id",
                      expected_quantiles=((0.5, 16.0),), tolerance=1.0,
                      group_tolerance=10.0),
        ],
    )


def conversation_rules() -> TableRules:
    """Registry for the `conversations` header table."""
    return TableRules(
        table="conversations",
        locator=("conv_id",),
        fields=[
            FieldRule("conv_id", "Required", "Regex", r"conv_[0-9]{8}"),
            FieldRule("n_turns", "Required", "Integer"),
            FieldRule("started_ts", "Required", "Timestamp"),
        ],
        unique=[UniqueRule(("conv_id",))],
    )
