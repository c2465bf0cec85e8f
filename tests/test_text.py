from __future__ import annotations

from pyspark.sql import functions as F

from token_etl_spark.operators.text import fingerprint, language_id, quality_stats, tokens


def _df(spark, texts):
    return spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["doc_id", "text"])


def test_tokenizer(spark):
    df = _df(spark, ["Hello, World!  42", "", "...!!!"])
    out = [r["t"] for r in df.select(tokens("text").alias("t")).collect()]
    assert out[0] == ["hello", "world", "42"]
    assert out[1] == []
    assert out[2] == []


def test_token_count(spark):
    from token_etl_spark.operators.text import token_count

    df = _df(spark, ["one two three", ""])
    got = [r["n"] for r in df.select(token_count("text").alias("n")).collect()]
    assert got == [3, 0]


def test_quality_stats(spark):
    df = _df(spark, ["the cat and the hat"])
    row = quality_stats(df).collect()[0]
    assert row["n_tokens"] == 5
    assert row["char_len"] == 19
    assert abs(row["mean_token_len"] - 15 / 5) < 1e-9
    # distinct tokens: the, cat, and, hat → stopwords: the, and → 2/4
    assert abs(row["stopword_ratio_en"] - 0.5) < 1e-9


def test_language_id(spark):
    df = _df(spark, [
        "the cat is in the hat and it is good",
        "der hund ist nicht ein katze und die maus",
        "xyzzy qwerty asdf",
    ])
    rows = language_id(df).orderBy("doc_id").collect()
    assert rows[0]["lang_pred"] == "en"
    assert rows[1]["lang_pred"] == "de"
    assert rows[2]["lang_pred"] == "und"


def test_fingerprint_set_invariant_to_order_and_dups(spark):
    df = _df(spark, ["alpha beta gamma", "gamma beta alpha alpha"])
    rows = fingerprint(df).collect()
    assert rows[0]["fp_set"] == rows[1]["fp_set"]       # same token set
    assert rows[0]["fp_rolling"] != rows[1]["fp_rolling"]  # order-sensitive


def test_line_dedup_keep_first_order_preserving(spark):
    from token_etl_spark.operators.text import line_dedup

    docs = spark.createDataFrame(
        [
            (1, "alpha\nbeta\nalpha\ngamma\nbeta"),  # dups at 3rd and 5th
            (2, "Alpha\n  alpha  \nALPHA"),  # case/whitespace-insensitive
            (3, "unique one\nunique two"),  # nothing to drop
            (4, ""),  # empty doc
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in line_dedup(docs).collect()}
    assert got[1]["deduped"] == "alpha\nbeta\ngamma"
    assert (got[1]["n_lines"], got[1]["n_unique"]) == (5, 3)
    # first occurrence's ORIGINAL text survives, not the normal form
    assert got[2]["deduped"] == "Alpha"
    assert got[2]["n_unique"] == 1
    assert got[3]["deduped"] == "unique one\nunique two"
    assert got[4]["deduped"] == ""
