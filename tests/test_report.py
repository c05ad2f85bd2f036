"""Report counting + rendering parity (utils/validate_core.py:79-140,
:358-485)."""

from crn_meta_validate_ray.report import (
    ReportCollector,
    TableEvalResult,
    compose_validation_report,
)


def test_text_log_drops_success_and_warning_entries():
    rep = ReportCollector()
    rep.add_header("H")
    rep.add_subheader("S")
    rep.add_success("should not appear")
    rep.add_warning("nor this")
    rep.add_error("an error line")
    rep.add_markdown("md line")
    rep.add_divider()
    log = rep.get_log()
    assert "should not appear" not in log
    assert "nor this" not in log
    assert "# H\n" in log and "## S\n" in log
    assert "an error line\n" in log and "md line\n" in log
    assert "-" * 60 + "\n" in log


def test_error_warning_counting_rules():
    res = TableEvalResult(
        missing_required=["a", "b"],
        missing_optional=["c"],
        all_null_required=["d"],
        all_null_optional=["e", "f"],
        null_columns=[("REQUIRED", "g", 3), ("OPTIONAL", "h", 1)],
        invalid_required=["i"],
        invalid_optional=["j", "k"],
        invalid_entries=[("REQUIRED", "i", 2, "exp", "'x', 'y'")],
        total_required=10,
        total_optional=5,
    )
    rep = ReportCollector()
    errors, warnings = compose_validation_report(res, "T", rep)
    # errors: 2 missing_req + 1 all_null_req + 1 invalid_req = 4
    assert errors == 4
    # warnings: 1 missing_opt + 2 all_null_opt + 2 partial-null + 2 invalid_opt
    assert warnings == 7


def test_clean_table_report_has_success_entries_and_empty_text_log():
    res = TableEvalResult(total_required=6, total_optional=1)
    rep = ReportCollector()
    errors, warnings = compose_validation_report(res, "turns", rep)
    assert (errors, warnings) == (0, 0)
    # 5 success entries: required present, optional present, no partial
    # nulls, no invalid required, no invalid optional
    kinds = [k for k, _ in rep.entries]
    assert kinds.count("success") == 5
    assert rep.get_log() == ""  # success-only report renders to nothing


def test_detail_bullets_and_message_formats():
    res = TableEvalResult(
        invalid_required=["role"],
        invalid_entries=[("REQUIRED", "role", 2, "'a', 'b'", "'x', 'y'")],
        total_required=3, total_optional=0,
    )
    rep = ReportCollector()
    compose_validation_report(res, "turns", rep, include_details=True)
    log = rep.get_log()
    assert ("1 **required** columns with invalid values in *turns*: role"
            in log)
    assert "**Details of invalid values by column:**" in log
    assert "- **Required** column `role` has 2 invalid values:" in log
    assert "  - **Invalid values:** 'x', 'y'" in log
    assert "  - **Expected:** 'a', 'b'" in log
