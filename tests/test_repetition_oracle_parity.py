"""Cross-engine parity for repetition_signals — the planned r12 driver
row's oracle, proven ahead of declaration (the test_html_oracle_parity
pattern): SQL_REPETITION_SIGNALS replays the dup-line/para fractions
and top-n-gram coverage in DuckDB to 9 decimals on adversarial
fixtures (CRLF separators, exact gram ties, empty docs). Round 12
lifts this SQL into plans/ as `ext_repetition_signals`."""

from __future__ import annotations

import duckdb

from token_etl_spark.operators.text import repetition_signals

_TOKS = (
    "list_filter(string_split_regex(trim(regexp_replace(lower(text),"
    " '[^a-z0-9\\s]', ' ', 'g')), '\\s+'), t -> t <> '')"
)

SQL_REPETITION_SIGNALS = rf"""
WITH du AS (
  SELECT doc_id, unnest(list_filter(string_split_regex(text, '\r?\n'),
    x -> NOT regexp_matches(x, '^[ \t\r\n\x0b\f]*$'))) AS u FROM documents),
dl AS (
  SELECT doc_id, coalesce(sum(c - 1)::DOUBLE / sum(c), 0.0) AS dup_line_frac,
         coalesce(sum((c - 1) * length(u))::DOUBLE
                  / nullif(sum(c * length(u)), 0), 0.0) AS dup_line_char_frac
  FROM (SELECT doc_id, u, count(*) AS c FROM du GROUP BY 1, 2) GROUP BY doc_id),
pu AS (
  SELECT doc_id, unnest(list_filter(string_split_regex(text, '(?:\r?\n){{2,}}'),
    x -> NOT regexp_matches(x, '^[ \t\r\n\x0b\f]*$'))) AS u FROM documents),
dp AS (
  SELECT doc_id, coalesce(sum(c - 1)::DOUBLE / sum(c), 0.0) AS dup_para_frac,
         coalesce(sum((c - 1) * length(u))::DOUBLE
                  / nullif(sum(c * length(u)), 0), 0.0) AS dup_para_char_frac
  FROM (SELECT doc_id, u, count(*) AS c FROM pu GROUP BY 1, 2) GROUP BY doc_id),
tk AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
tc AS (SELECT doc_id,
       coalesce(list_sum(list_transform(toks, t -> length(t))), 0) AS tok_chars
       FROM tk),
grams AS (
  SELECT doc_id, n, unnest(
    CASE WHEN len(toks) >= n
      THEN list_transform(range(1, len(toks) - n + 2),
                          i -> array_to_string(toks[i:i+n-1], ' '))
      ELSE [] END) AS g
  FROM tk, (SELECT unnest([2, 3, 4]) AS n)),
gc AS (SELECT doc_id, n, g, count(*) AS c FROM grams GROUP BY 1, 2, 3),
top AS (
  SELECT doc_id, n, c * (length(g) - (n - 1)) AS covered,
         row_number() OVER (PARTITION BY doc_id, n ORDER BY c DESC, g ASC) AS rk
  FROM gc),
tw AS (
  SELECT doc_id,
    max(CASE WHEN n = 2 THEN covered END) AS c2,
    max(CASE WHEN n = 3 THEN covered END) AS c3,
    max(CASE WHEN n = 4 THEN covered END) AS c4
  FROM top WHERE rk = 1 GROUP BY doc_id)
SELECT d.doc_id,
  coalesce(dl.dup_line_frac, 0.0) AS dup_line_frac,
  coalesce(dl.dup_line_char_frac, 0.0) AS dup_line_char_frac,
  coalesce(dp.dup_para_frac, 0.0) AS dup_para_frac,
  coalesce(dp.dup_para_char_frac, 0.0) AS dup_para_char_frac,
  coalesce(tw.c2::DOUBLE / nullif(tc.tok_chars, 0), 0.0) AS top_2gram_char_frac,
  coalesce(tw.c3::DOUBLE / nullif(tc.tok_chars, 0), 0.0) AS top_3gram_char_frac,
  coalesce(tw.c4::DOUBLE / nullif(tc.tok_chars, 0), 0.0) AS top_4gram_char_frac
FROM documents d
LEFT JOIN dl USING (doc_id) LEFT JOIN dp USING (doc_id)
LEFT JOIN tc USING (doc_id) LEFT JOIN tw USING (doc_id)
ORDER BY d.doc_id
"""

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
