"""CSV ingest parity helpers (SURVEY §2.1 S1–S7).

The reference validates user-uploaded CSVs; its ingest pre-pass — encoding
fallback ladder, statistical delimiter detection, row-count probe,
header/row field-count structure check, invalid-file gating, delimiter
conversion — is reproduced here Streamlit-free, with the same observable
semantics (reference: utils/delimiter_handler.py:41-46 encoding order,
:185-274 detection scoring, :276-316 row-count probe, :318-376 structure
check, :385-392 validity predicate; utils/processed_data_loader.py:121-171
string-typed read with fallbacks).

At engine scale these are driver-side, per-file manifest operations; the
heavy step (CSV → Parquet normalization) is a Ray Data job
(``csv_to_parquet``).
"""

from __future__ import annotations

import csv
import io
import os
import re
from dataclasses import dataclass
from statistics import median

import pandas as pd

# Encoding ladder — utf-8-sig first (Excel BOM), latin-1 last (decodes
# anything, so it must not mask problems); reference
# utils/delimiter_handler.py:41-46.
ENCODINGS_TO_TRY = ("utf-8-sig", "utf-8", "cp1252", "latin-1")
SUPPORTED_DELIMITERS = (",", ";", "\t", "|")
LINES_TO_EVALUATE = 50
DELIMITER_NAMES = {",": "comma", ";": "semicolon", "\t": "tab", "|": "pipe"}


def decode_bytes_with_fallbacks(content: bytes) -> tuple[str, str, str]:
    """Decode with the ladder; returns (text, encoding, errors_mode).
    'ignore' only as the last resort — 'replace' could mutate separators
    (reference :143-168)."""
    if not isinstance(content, (bytes, bytearray)):
        return str(content), "text", "strict"
    for enc in ENCODINGS_TO_TRY:
        try:
            return bytes(content).decode(enc), enc, "strict"
        except (UnicodeDecodeError, Exception):  # noqa: BLE001 - parity
            continue
    return bytes(content).decode("utf-8", errors="ignore"), "utf-8", "ignore"


def detect_delimiter(content: bytes, num_lines: int = LINES_TO_EVALUATE
                     ) -> tuple[str, float, pd.DataFrame | None]:
    """Line-statistics delimiter detection (reference :185-274):
    candidate must appear in the header; scored by consistency of per-line
    counts against the median (0-100) plus the median count as tiebreaker;
    clamped confidence.  Returns (delimiter, confidence, preview_df)."""
    decoded, _, _ = decode_bytes_with_fallbacks(content)
    lines = [ln for ln in decoded.splitlines() if ln.strip()]
    if not lines:
        return ",", 0.0, None
    header = lines[0]
    candidates = lines[: max(2, min(len(lines), num_lines))]

    scores: dict[str, float] = {}
    for delim in SUPPORTED_DELIMITERS:
        if delim not in header:
            scores[delim] = -1.0
            continue
        counts = [ln.count(delim) for ln in candidates]
        med = median(counts)
        if med <= 0 or header.count(delim) + 1 <= 1:
            scores[delim] = -1.0
            continue
        consistency = sum(1 for c in counts if c == med) / len(counts)
        scores[delim] = consistency * 100.0 + float(med)

    best = max(scores, key=scores.get)
    if scores[best] < 0:
        best, confidence = ",", 0.0
    else:
        confidence = min(100.0, max(0.0, scores[best]))

    preview = None
    try:
        preview = pd.read_csv(io.StringIO(decoded), sep=best, dtype=str,
                              engine="python", on_bad_lines="skip", nrows=20)
    except Exception:
        preview = None
    return best, float(confidence), preview


def get_row_count(content: bytes, delimiter: str) -> int:
    """Row-count probe (reference :276-316): 0 = empty/header-only,
    -1 = has data lines but unparseable even forgivingly, else n rows."""
    if not content:
        return 0
    decoded, _, _ = decode_bytes_with_fallbacks(content)
    non_empty = [ln for ln in decoded.splitlines() if ln.strip()]
    if len(non_empty) <= 1:
        return 0
    try:
        return max(0, len(pd.read_csv(io.StringIO(decoded), sep=delimiter,
                                      dtype=str)))
    except Exception:
        pass
    try:
        return max(0, len(pd.read_csv(io.StringIO(decoded), sep=delimiter,
                                      dtype=str, engine="python",
                                      on_bad_lines="skip")))
    except Exception:
        return -1


@dataclass
class StructureReport:
    ok: bool
    message: str = ""
    line_number: int | None = None
    expected_fields: int | None = None
    saw_fields: int | None = None


def validate_structure(content: bytes, delimiter: str,
                       filename: str = "file") -> StructureReport:
    """Field-count structure check (reference :318-376): strict parse, then
    locate the first offending line via the pandas ParserError message or a
    csv.reader re-scan."""
    decoded, _, _ = decode_bytes_with_fallbacks(content)
    try:
        pd.read_csv(io.StringIO(decoded), sep=delimiter, dtype=str)
        return StructureReport(ok=True)
    except pd.errors.ParserError as exc:
        msg = str(exc)
        m = re.search(r"Expected\s+(\d+)\s+fields\s+in\s+line\s+(\d+),"
                      r"\s+saw\s+(\d+)", msg)
        if m:
            exp, line_no, saw = int(m.group(1)), int(m.group(2)), int(m.group(3))
            return StructureReport(
                ok=False, line_number=line_no, expected_fields=exp,
                saw_fields=saw,
                message=(f"File {filename} has {saw} fields in row {line_no}, "
                         f"but {exp} fields in header"))
        reader = csv.reader(io.StringIO(decoded), delimiter=delimiter)
        try:
            header = next(reader)
        except StopIteration:
            return StructureReport(ok=False,
                                   message=f"File {filename} appears to be empty")
        for row_no, row in enumerate(reader, start=2):
            if not row:
                continue
            if len(row) != len(header):
                return StructureReport(
                    ok=False, line_number=row_no,
                    expected_fields=len(header), saw_fields=len(row),
                    message=(f"File {filename} has {len(row)} fields in row "
                             f"{row_no}, but {len(header)} fields in header"))
        return StructureReport(ok=False,
                               message=f"File {filename} could not be parsed: {msg}")


def is_file_valid(preview_df, row_count: int) -> bool:
    """Validity gate (reference :385-392): header-only → invalid;
    row_count == -1 with data → still treated valid (forgiving)."""
    if row_count == 0:
        return False
    if preview_df is None:
        return row_count != 0
    return True


def read_csv_with_fallbacks(content: bytes, separator: str = ","
                            ) -> tuple[pd.DataFrame, str, str, str]:
    """String-typed forgiving read (reference
    utils/processed_data_loader.py:121-171): dtype="string",
    keep_default_na=False, bad lines skipped, encoding ladder, last-resort
    latin-1 + errors="replace".  Returns (df, encoding, engine, errors)."""
    engine = "c" if separator in {",", "\t", ";", "|"} else "python"
    for enc in ENCODINGS_TO_TRY:
        try:
            df = pd.read_csv(io.BytesIO(content), sep=separator,
                             dtype="string", keep_default_na=False,
                             na_values=[], on_bad_lines="skip",
                             encoding=enc, engine=engine)
            return df, enc, engine, "strict"
        except Exception:
            continue
    df = pd.read_csv(io.BytesIO(content), sep=separator, dtype="string",
                     keep_default_na=False, na_values=[],
                     on_bad_lines="skip", encoding="latin-1",
                     encoding_errors="replace", engine="python")
    return df, "latin-1", "python", "replace"


def convert_delimiter(content: bytes, from_delim: str) -> bytes:
    """Re-parse with the detected delimiter and rewrite as comma CSV
    (reference :547-598 apply_decisions)."""
    df, _, _, _ = read_csv_with_fallbacks(content, from_delim)
    buf = io.StringIO()
    df.to_csv(buf, index=False)
    return buf.getvalue().encode("utf-8")


def sanitize_table_name(filename: str) -> str:
    """filename → table name (reference utils/processed_data_loader.py:173-177):
    non-alphanumerics collapse to '_', default 'table'."""
    stem = filename.rsplit("/", 1)[-1]
    stem = stem.rsplit(".", 1)[0] if "." in stem else stem
    name = re.sub(r"[^A-Za-z0-9]+", "_", stem).strip("_")
    return name or "table"


def ingest_manifest(files: dict[str, bytes]) -> list[dict]:
    """The driver-side pre-pass over a set of CSV payloads (reference
    check_delimiter_decisions, :459-545): detect → count → structure-check →
    mark validity.  Returns one manifest row per file."""
    out = []
    for filename, content in sorted(files.items()):
        delim, confidence, preview = detect_delimiter(content)
        rows = get_row_count(content, delim)
        structure = validate_structure(content, delim, filename)
        out.append({
            "filename": filename,
            "table_name": sanitize_table_name(filename),
            "delimiter": delim,
            "delimiter_name": DELIMITER_NAMES.get(delim, delim),
            "confidence": confidence,
            "row_count": rows,
            "structure_ok": structure.ok,
            "structure_message": structure.message,
            "valid": is_file_valid(preview, rows) and structure.ok,
            "skipped_reason": ("header-only" if rows == 0 else
                               "" if structure.ok else "structure"),
        })
    return out


def csv_to_parquet(csv_paths: list[str], out_dir: str,
                   separator: str = ",") -> int:
    """The scale path: CSV → string-typed, null-normalized Parquet via a Ray
    Data job (read_csv → normalize → write_parquet).  Returns row count."""
    import pyarrow as pa
    from pyarrow import csv as pacsv

    import ray.data as rd

    from crn_meta_validate_ray.stages.normalize import normalize_stage

    ds = rd.read_csv(
        csv_paths,
        parse_options=pacsv.ParseOptions(delimiter=separator),
        convert_options=pacsv.ConvertOptions(
            column_types={}, strings_can_be_null=False),
    )

    def stringify(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        for i, name in enumerate(t.column_names):
            if not pa.types.is_string(t[name].type):
                t = t.set_column(i, name, pc.cast(t[name], pa.string()))
        return t

    out = normalize_stage(ds.map_batches(stringify, batch_format="pyarrow"))
    # the writer names files per-run: a re-run into a non-empty directory
    # would blend old and new output (and the count below reads the dir)
    if os.path.isdir(out_dir):
        import shutil
        shutil.rmtree(out_dir, ignore_errors=True)
    out.write_parquet(out_dir)
    return rd.read_parquet(out_dir).count()
