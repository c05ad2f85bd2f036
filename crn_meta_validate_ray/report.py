"""Report composition with reference-parity counting and rendering.

Replicates the observable behavior of the reference's ReportCollector and
compose_validation_report (utils/validate_core.py:79-140, :358-485):

- entries are ordered ``(msg_type, msg)`` tuples;
- the plain-text log renders only markdown / error / header / subheader /
  divider entries — success and warning lines are dropped (:118-133);
- error counting: +len(missing_required) +len(all_null_required)
  +len(invalid_required); warning counting: optional counterparts plus one
  per partial-null column (:405-471);
- the per-column "N invalid values" count is the number of *distinct*
  failing values, not failing rows (:244, :250).
"""

from __future__ import annotations

from dataclasses import dataclass, field

EMOJI_SUCCESS = "✅"
EMOJI_ERROR = "❌"
EMOJI_WARNING = "⚠️"


class ReportCollector:
    """Ordered message collector, serialisable to the reference's text-log
    format (utils/validate_core.py:79-140)."""

    def __init__(self):
        self.entries: list[tuple[str, str | None]] = []
        self.filename: str | None = None

    def add_markdown(self, msg: str):
        self.entries.append(("markdown", msg))

    def add_success(self, msg: str):
        self.entries.append(("success", msg))

    def add_error(self, msg: str):
        self.entries.append(("error", msg))

    def add_warning(self, msg: str):
        self.entries.append(("warning", msg))

    def add_header(self, msg: str):
        self.entries.append(("header", msg))

    def add_subheader(self, msg: str):
        self.entries.append(("subheader", msg))

    def add_divider(self):
        self.entries.append(("divider", None))

    def get_log(self) -> str:
        """Render to plain text; success/warning entries are intentionally
        omitted (reference :118-133)."""
        parts: list[str] = []
        for msg_type, msg in self.entries:
            if msg_type in ("markdown", "error"):
                parts.append(f"{msg}\n")
            elif msg_type == "header":
                parts.append(f"# {msg}\n")
            elif msg_type == "subheader":
                parts.append(f"## {msg}\n")
            elif msg_type == "divider":
                parts.append(60 * "-" + "\n")
        return "".join(parts)

    def write_to_file(self, filename: str):
        self.filename = filename
        with open(filename, "w") as f:
            f.write(self.get_log())

    def reset(self):
        self.entries = []
        self.filename = None


@dataclass
class TableEvalResult:
    """The distributed analogue of validate_table_eval's result dict
    (utils/validate_core.py:343-355), produced by merging per-batch partials.

    ``invalid_entries`` tuples are ``(opt_req, column, n_distinct_invalid,
    expected_descr, found_descr)``; ``null_columns`` tuples are
    ``(opt_req, column, n_null)``.
    """

    missing_required: list = field(default_factory=list)
    missing_optional: list = field(default_factory=list)
    invalid_required: list = field(default_factory=list)
    invalid_optional: list = field(default_factory=list)
    all_null_required: list = field(default_factory=list)
    all_null_optional: list = field(default_factory=list)
    null_columns: list = field(default_factory=list)
    invalid_entries: list = field(default_factory=list)
    total_required: int = 0
    total_optional: int = 0
    # engine extensions (not part of the reference dict):
    extra_columns: list = field(default_factory=list)
    extension_errors: list = field(default_factory=list)    # (constraint_id, msg)
    extension_warnings: list = field(default_factory=list)  # (constraint_id, msg)
    n_rows: int = 0

    def to_dict(self) -> dict:
        return {
            "missing_required": self.missing_required,
            "missing_optional": self.missing_optional,
            "invalid_required": self.invalid_required,
            "invalid_optional": self.invalid_optional,
            "all_null_required": self.all_null_required,
            "all_null_optional": self.all_null_optional,
            "null_columns": self.null_columns,
            "invalid_entries": self.invalid_entries,
            "total_required": self.total_required,
            "total_optional": self.total_optional,
        }


def quote(x: object) -> str:
    return f"'{x}'"


def compose_validation_report(
    result: TableEvalResult,
    table_name: str,
    report: ReportCollector | None = None,
    include_details: bool = True,
) -> tuple[int, int]:
    """Append verdict messages for one table and return
    ``(errors, warnings)`` with the reference's exact counting rules
    (utils/validate_core.py:358-485)."""
    if report is None:
        report = ReportCollector()
    errors = 0
    warnings = 0
    r = result

    if r.missing_required:
        report.add_error(
            f"{EMOJI_ERROR} -- Missing {len(r.missing_required)}/{r.total_required} "
            f"**required** columns in *{table_name}*: {', '.join(r.missing_required)}"
        )
        errors += len(r.missing_required)
    if r.missing_optional:
        report.add_warning(
            f"{EMOJI_WARNING} -- Missing {len(r.missing_optional)}/{r.total_optional} "
            f"**optional** columns in *{table_name}*: {', '.join(r.missing_optional)}"
        )
        warnings += len(r.missing_optional)

    if r.all_null_required:
        report.add_error(
            f"{EMOJI_ERROR} -- {len(r.all_null_required)} **required** columns are "
            f"completely NULL in *{table_name}*: {', '.join(r.all_null_required)}"
        )
        errors += len(r.all_null_required)
    if r.all_null_optional:
        report.add_warning(
            f"{EMOJI_WARNING} -- {len(r.all_null_optional)} **optional** columns are "
            f"completely NULL in *{table_name}*: {', '.join(r.all_null_optional)}"
        )
        warnings += len(r.all_null_optional)

    if not r.missing_required and not r.all_null_required:
        report.add_success(
            f"{EMOJI_SUCCESS} -- All {r.total_required} **required** columns "
            f"present with data in *{table_name}*"
        )
    if not r.missing_optional and not r.all_null_optional:
        report.add_success(
            f"{EMOJI_SUCCESS} -- All {r.total_optional} **optional** columns "
            f"present with data in *{table_name}*"
        )

    for _opt_req, column, count in r.null_columns:
        report.add_warning(
            f"{EMOJI_WARNING} -- column _**{column}**_ has {count} empty values")
        warnings += 1
    if not r.null_columns:
        report.add_success(
            f"{EMOJI_SUCCESS} -- No columns with partial empty values were found")

    if r.invalid_required:
        report.add_error(
            f"{EMOJI_ERROR} -- {len(r.invalid_required)} **required** columns with "
            f"invalid values in *{table_name}*: {', '.join(r.invalid_required)}"
        )
        errors += len(r.invalid_required)
    else:
        report.add_success(f"{EMOJI_SUCCESS} -- No invalid values in required columns")
    if r.invalid_optional:
        report.add_warning(
            f"{EMOJI_WARNING} -- {len(r.invalid_optional)} **optional** columns with "
            f"invalid values in *{table_name}*: {', '.join(r.invalid_optional)}"
        )
        warnings += len(r.invalid_optional)
    else:
        report.add_success(f"{EMOJI_SUCCESS} -- No invalid values in optional columns")

    if include_details and r.invalid_entries:
        report.add_markdown("**Details of invalid values by column:**")
        for opt_req, column, n_invalid, valid_descr, invalid_descr in r.invalid_entries:
            column_type = opt_req.capitalize()
            report.add_markdown(
                f"- **{column_type}** column `{column}` has {n_invalid} invalid values:\n"
                f"  - **Invalid values:** {invalid_descr}\n"
                f"  - **Expected:** {valid_descr}"
            )

    # ---- engine extensions (distributed checks; not in the reference) ----
    for cid, msg in r.extension_errors:
        report.add_error(f"{EMOJI_ERROR} -- [{cid}] {msg}")
        errors += 1
    for cid, msg in r.extension_warnings:
        report.add_warning(f"{EMOJI_WARNING} -- [{cid}] {msg}")
        warnings += 1
    if r.extra_columns:
        report.add_warning(
            f"{EMOJI_WARNING} -- {len(r.extra_columns)} columns in *{table_name}* are "
            f"not in the schema registry and were skipped: {', '.join(r.extra_columns)}"
        )

    return errors, warnings
