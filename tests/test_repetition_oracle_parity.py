"""Cross-engine parity for repetition_signals on adversarial fixtures
(CRLF separators, exact gram ties, empty docs, the \\s dialect gap).
The SQL is the SHARED oracle builder from plans/curation.py — the same
one the `ext_repetition_signals` driver row declares — so engine and
oracle cannot drift."""

from __future__ import annotations

import duckdb

from token_etl_spark.operators.text import repetition_signals
from token_etl_spark.plans.curation import sql_repetition_signals

SQL_REPETITION_SIGNALS = sql_repetition_signals()

_FIXTURES = [
    (1, "a b c\na b c\nd e f"),
    (2, "p q\n\np q\n\nr s"),
    (3, "x y x y x y"),
    (4, ""),
    (5, "a b a c a b a c"),  # exact top-2-gram tie
    (6, "para A words\r\n\r\npara B words\r\n\r\npara A words"),  # CRLF
    (7, "the unique tokens appear once only here today"),
    # the \s dialect gap: a vertical-tab 'line' must be blank-filtered
    # identically on both engines (parity-review-found r11)
    (8, "dup line\n \x0b \ndup line"),
]

_COLS = [
    "dup_line_frac", "dup_line_char_frac", "dup_para_frac",
    "dup_para_char_frac", "top_2gram_char_frac", "top_3gram_char_frac",
    "top_4gram_char_frac",
]


def test_repetition_signals_oracle_parity(spark):
    sdf = spark.createDataFrame(_FIXTURES, "doc_id long, text string")
    got = {
        r["doc_id"]: tuple(round(r[c], 9) for c in _COLS)
        for r in repetition_signals(sdf).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", _FIXTURES)
    exp = {
        row[0]: tuple(round(float(x), 9) for x in row[1:])
        for row in con.execute(SQL_REPETITION_SIGNALS).fetchall()
    }
    assert set(got) == set(exp)
    for did in sorted(got):
        assert got[did] == exp[did], (did, got[did], exp[did])
