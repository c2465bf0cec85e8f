"""Cross-engine parity for extract_html_text — the r12 driver row's
oracle, proven ahead of declaration: SQL_HTML_EXTRACT replays the
extraction in DuckDB byte-for-byte (blocks, anchor chars, Unicode
alpha gate, entity decode, NULL degrade, block ORDER). Round 12 lifts
this SQL into plans/ as `ext_html_extract` (ROADMAP carry item); until
then this test keeps engine and oracle from drifting."""

from __future__ import annotations

import duckdb
import pytest

from token_etl_spark.operators.text import extract_html_text

# entity decode runs BEFORE the whitespace collapse/trim (the engine's
# _strip_tags order since the ADVICE r11 fix — a decoded '&nbsp;' folds
# into the single-space normalization), and the whitespace collapse
# uses the explicit ASCII class (Java \s includes \x0b/\f, RE2 \s does
# not) — parity-review-found r11
_STRIP = (
    "trim(regexp_replace("
    "replace(replace(replace(replace(replace(replace("
    "regexp_replace({col}, '<[^>]*>', ' ', 'g'),"
    "'&lt;', '<'), '&gt;', '>'), '&quot;', '\"'), '&#39;', chr(39)), "
    "'&nbsp;', ' '), '&amp;', '&'),"
    " '[ \t\r\n\x0b\f]+', ' ', 'g'))"
)

SQL_HTML_EXTRACT = rf"""
WITH cleaned AS (
  SELECT doc_id,
    regexp_replace(regexp_replace(regexp_replace(text,
      '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
      '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
      '(?s)<!--.*?-->', ' ', 'g') AS t
  FROM documents),
flat AS (
  SELECT doc_id, string_split(
    regexp_replace(regexp_replace(t, '[\r\n\t]+', ' ', 'g'),
      '(?i)</?(p|div|br|li|ul|ol|h1|h2|h3|h4|h5|h6|tr|td|th|table|section|article|header|footer|blockquote|nav|aside|form|figure)([ \t\r\n\x0b\f][^>]*)?/?>',
      chr(10), 'g'), chr(10)) AS bl
  FROM cleaned),
blocks AS (
  SELECT doc_id, unnest(range(1, len(bl) + 1)) AS pos, unnest(bl) AS b FROM flat),
feats AS (
  SELECT doc_id, pos,
    {_STRIP.format(col='b')} AS txt,
    coalesce(list_sum(list_transform(
      regexp_extract_all(b, '(?is)<a([ \t\r\n\x0b\f][^>]*)?>(.*?)</a>', 2),
      a -> length({_STRIP.format(col='a')})
    )), 0) AS anchor_chars
  FROM blocks),
f2 AS (
  SELECT doc_id, pos, txt, anchor_chars, length(txt) AS tlen,
         length(regexp_replace(txt, '[^\p{{L}}\p{{N}}]', '', 'g')) AS alpha
  FROM feats WHERE length(txt) > 0),
kept AS (
  SELECT * FROM f2
  WHERE tlen >= 30 AND anchor_chars <= 0.35 * tlen AND alpha >= 0.5 * tlen),
agg AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept_blocks,
         string_agg(txt, chr(10) ORDER BY pos) AS extracted
  FROM kept GROUP BY doc_id),
nb AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_blocks FROM f2 GROUP BY doc_id)
SELECT d.doc_id,
  CASE WHEN d.text IS NULL THEN NULL ELSE coalesce(nb.n_blocks, 0) END AS n_blocks,
  CASE WHEN d.text IS NULL THEN NULL ELSE coalesce(a.n_kept_blocks, 0) END AS n_kept_blocks,
  CASE WHEN d.text IS NULL THEN NULL ELSE coalesce(a.extracted, '') END AS extracted,
  CASE WHEN d.text IS NULL THEN NULL ELSE length(coalesce(a.extracted, '')) END AS extracted_chars
FROM documents d LEFT JOIN agg a USING (doc_id) LEFT JOIN nb USING (doc_id)
ORDER BY doc_id
"""

_FIXTURES = [
    (
        1,
        """<html><head><style>body { color: red; }</style>
<script type="text/javascript">var nav = "<div>not real</div>";</script>
</head><body><!-- boilerplate -->
<nav><a href="/">Home</a> <a href="/a">About</a></nav>
<p>This is the first real paragraph of the article, long enough to keep
and mostly letters so every gate passes without any trouble at all.</p>
<p>Ampersand &amp; angle &lt;brackets&gt; and a &quot;quote&quot; decode fine,
which keeps this block over the minimum length threshold comfortably.</p>
<p>Это обычный русский текст достаточной длины, который обязан пройти
буквенный фильтр без малейших затруднений сегодня вечером.</p>
<footer><a href="/t">Terms</a> | <a href="/p">Privacy</a></footer>
</body></html>""",
    ),
    (2, "plain long prose with no markup at all but plenty long to keep " * 2),
    (3, None),
    (
        4,
        "<p>The <abbr title=\"x\">HTML</abbr> spec is a long detailed document "
        "that crawlers must cope with; see the <a href=\"/s\">spec</a>.</p>",
    ),
    (
        5,
        "<p>"
        + " ".join(f'<a href="/l{i}">quite long category link {i}</a>' for i in range(12))
        + "</p>",
    ),
    (6, "para A words\r\n\r\n<p>A second real block long enough to keep here today.</p>"),
    (7, ""),
    # parity-review counterexamples: &nbsp;-padded blocks (trim-vs-
    # decode ordering) and vertical-tab whitespace (the \s dialect gap)
    (8, "<td>&nbsp;</td><p>A real paragraph long enough to clear the gate follows here.</p>"),
    (9, "<p>&nbsp;&nbsp;Leading nbsp then a long enough paragraph to keep around.</p>"),
    (10, "a\x0bb " * 10),
]


def test_html_extract_oracle_parity(spark):
    sdf = spark.createDataFrame(_FIXTURES, "doc_id long, text string")
    got = {
        r["doc_id"]: (
            r["n_blocks"], r["n_kept_blocks"], r["extracted"], r["extracted_chars"]
        )
        for r in extract_html_text(sdf)
        .select("doc_id", "n_blocks", "n_kept_blocks", "extracted", "extracted_chars")
        .collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", _FIXTURES)
    exp = {
        row[0]: (row[1], row[2], row[3], row[4])
        for row in con.execute(SQL_HTML_EXTRACT).fetchall()
    }
    assert set(got) == set(exp)
    for did in sorted(got):
        assert got[did] == exp[did], (did, got[did], exp[did])
