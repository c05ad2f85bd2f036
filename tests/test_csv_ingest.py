"""CSV ingest pre-pass parity (reference utils/delimiter_handler.py +
processed_data_loader.py; mirrors the tester-file corpus outcomes,
resource/tester_files/README.md)."""

import pandas as pd

from crn_meta_validate_ray.sources.csv_ingest import (
    convert_delimiter,
    decode_bytes_with_fallbacks,
    detect_delimiter,
    get_row_count,
    ingest_manifest,
    is_file_valid,
    read_csv_with_fallbacks,
    sanitize_table_name,
    validate_structure,
)

COMMA = b"a,b,c\n1,2,3\n4,5,6\n"
SEMI = b"a;b;c\n1;2;3\n4;5;6\n7;8;9\n"
HEADER_ONLY = b"a,b,c\n"
MALFORMED = b"a,b,c\n1,2,3\n1,2,3,4,5\n6,7,8\n"
EMPTY = b""


def test_encoding_fallback_ladder():
    assert decode_bytes_with_fallbacks("héllo".encode("utf-8"))[1] == "utf-8-sig"
    text, enc, mode = decode_bytes_with_fallbacks("héllo".encode("cp1252"))
    assert enc in ("cp1252", "latin-1") and "h" in text and mode == "strict"
    bom = b"\xef\xbb\xbfa,b\n1,2\n"
    text, enc, _ = decode_bytes_with_fallbacks(bom)
    assert enc == "utf-8-sig" and text.startswith("a,b")


def test_detect_delimiter_scoring():
    d, conf, preview = detect_delimiter(SEMI)
    assert d == ";" and conf > 90
    assert list(preview.columns) == ["a", "b", "c"]
    d, conf, _ = detect_delimiter(COMMA)
    assert d == ","
    # delimiter absent from header is disqualified even if present in rows
    tricky = b"a,b\n1;2,3\n4;5,6\n"
    assert detect_delimiter(tricky)[0] == ","
    assert detect_delimiter(EMPTY) == (",", 0.0, None)


def test_row_count_probe():
    assert get_row_count(COMMA, ",") == 2
    assert get_row_count(HEADER_ONLY, ",") == 0   # header-only → 0
    assert get_row_count(EMPTY, ",") == 0
    # malformed but has data → forgiving parse skips bad lines
    assert get_row_count(MALFORMED, ",") == 2


def test_validate_structure_locates_offending_row():
    assert validate_structure(COMMA, ",").ok
    rep = validate_structure(MALFORMED, ",", "CLINPATH.csv")
    assert not rep.ok
    assert rep.line_number == 3 and rep.saw_fields == 5 \
        and rep.expected_fields == 3
    assert "CLINPATH.csv" in rep.message


def test_validity_gate():
    assert not is_file_valid(pd.DataFrame(), 0)   # header-only skipped
    assert is_file_valid(None, -1)                # data but messy → keep
    assert is_file_valid(pd.DataFrame({"a": [1]}), 3)


def test_read_with_fallbacks_string_typed():
    df, enc, engine, errors = read_csv_with_fallbacks(COMMA, ",")
    assert df.dtypes.astype(str).unique().tolist() == ["string"]
    assert errors == "strict" and len(df) == 2
    # empty string cells survive (keep_default_na=False)
    df2, *_ = read_csv_with_fallbacks(b"a,b\n,x\n", ",")
    assert df2.iloc[0, 0] == ""


def test_convert_delimiter_roundtrip():
    out = convert_delimiter(SEMI, ";")
    df, *_ = read_csv_with_fallbacks(out, ",")
    assert list(df.columns) == ["a", "b", "c"] and len(df) == 3


def test_sanitize_table_name():
    assert sanitize_table_name("My File (v2).csv") == "My_File_v2"
    assert sanitize_table_name("weird..///..") == "table"
    assert sanitize_table_name("SAMPLE.csv") == "SAMPLE"


def test_ingest_manifest_mirrors_tester_corpus_outcomes():
    files = {
        "PROTOCOL.csv": SEMI,        # semicolon file → detected, valid
        "SUBJECT.csv": HEADER_ONLY,  # header-only → skipped
        "CLINPATH.csv": MALFORMED,   # structural failure
        "SAMPLE.csv": COMMA,         # clean
    }
    rows = {r["filename"]: r for r in ingest_manifest(files)}
    assert rows["PROTOCOL.csv"]["delimiter"] == ";"
    assert rows["PROTOCOL.csv"]["valid"]
    assert not rows["SUBJECT.csv"]["valid"]
    assert rows["SUBJECT.csv"]["skipped_reason"] == "header-only"
    assert not rows["CLINPATH.csv"]["valid"]
    assert rows["CLINPATH.csv"]["skipped_reason"] == "structure"
    assert rows["SAMPLE.csv"]["valid"]
    assert rows["SAMPLE.csv"]["table_name"] == "SAMPLE"


def test_csv_to_parquet_job(ray_session, tmp_path):
    from crn_meta_validate_ray.sources.csv_ingest import csv_to_parquet
    p = tmp_path / "in.csv"
    p.write_bytes(b"a,b\n1,\n2,none\n3,x\n")
    n = csv_to_parquet([str(p)], str(tmp_path / "out"))
    assert n == 3
    import ray.data as rd
    rows = rd.read_parquet(str(tmp_path / "out")).take_all()
    vals = {r["a"]: r["b"] for r in rows}
    # null-like cells normalized to the sentinel, all columns string-typed
    assert vals == {"1": "NA", "2": "NA", "3": "x"}
    # re-running into the same directory must replace, not blend (the
    # writer names files per-run, and the returned count reads the dir)
    assert csv_to_parquet([str(p)], str(tmp_path / "out")) == 3
