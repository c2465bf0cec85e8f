"""Cross-engine parity for extract_html_text on adversarial fixtures
(blocks, anchor chars, Unicode alpha gate, entity decode, NULL
degrade, block ORDER). The SQL is the SHARED oracle builder from
plans/curation.py — the same one the `ext_html_extract` driver row
declares — so engine and oracle cannot drift."""

from __future__ import annotations

import duckdb
import pytest

from token_etl_spark.operators.text import extract_html_text
from token_etl_spark.plans.curation import sql_html_extract

SQL_HTML_EXTRACT = sql_html_extract()

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
