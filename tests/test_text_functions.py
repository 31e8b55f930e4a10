"""Unit tests for the text-analysis column functions."""

from pyspark.sql import functions as F

from hbase_to_mongo_export_spark.functions import text as tx


def run(spark, col, rows, schema="t string"):
    df = spark.createDataFrame(rows, schema)
    return [r.out for r in df.select(col(F.col("t")).alias("out")).collect()]


def test_token_count(spark):
    got = run(spark, tx.token_count, [("a b  c",), ("",), ("   ",), ("one",)])
    assert got == [3, 0, 0, 1]


def test_bpe_token_estimate(spark):
    got = run(spark, tx.bpe_token_estimate, [("hello, world!",), ("a_b c",), ("",)])
    assert got == [4, 2, 0]  # hello , world ! | a_b c


def test_punct_and_digit_ratio(spark):
    [p] = run(spark, tx.punct_ratio, [("ab,.",)])
    assert p == 0.5
    [d] = run(spark, tx.digit_ratio, [("a1b2",)])
    assert d == 0.5


def test_mean_word_len(spark):
    [m] = run(spark, tx.mean_word_len, [("ab abcd",)])
    assert m == 3.0
    [z] = run(spark, tx.mean_word_len, [("",)])
    assert z == 0.0


def test_stopword_ratio_and_lang_id(spark):
    [r] = run(spark, lambda c: tx.stopword_ratio(c, "en"), [("the cat and the dog",)])
    assert r == 0.6
    got = run(
        spark,
        tx.lang_id,
        [("the cat and dog",), ("el perro y la casa de que",), ("xyz qwerty",),
         ("der hund und die katze",)],
    )
    assert got == ["en", "es", "und", "de"]


def test_lang_id_tie_breaks_alphabetically(spark):
    # 'la'/'de' are stopwords for both es and fr (2 hits each) → 'es' wins
    got = run(spark, tx.lang_id, [("la de",)])
    assert got == ["es"]


def test_quality_score_range_and_order(spark):
    rows = [("the cat and the dog sat on the mat today",),
            ("0,1;2.3!4?5:6.7,8;9!!!",)]
    good, bad = run(spark, tx.quality_score, rows)
    assert 0.0 <= bad < good <= 1.0


def test_fingerprint_normalization(spark):
    a, b, c = run(
        spark, tx.fingerprint, [("Hello  World",), ("  hello world ",), ("hello worlds",)]
    )
    assert a == b != c
