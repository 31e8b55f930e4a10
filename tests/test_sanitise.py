"""Mirrors the reference SanitisationProcessorTest (escape-stripping and
global replacements on the serialized record) and the X1 negative
lookbehind behavior (SanitisationProcessorTest.kt:20-54)."""

import json

from pyspark.sql import functions as F

from hbase_to_mongo_export_spark.functions import sanitise


def run_sanitise(spark, record_json: str, db: str, collection: str) -> str:
    df = spark.createDataFrame([(record_json, db, collection)], "r string, d string, c string")
    return df.select(
        sanitise.sanitise(F.col("r"), F.col("d"), F.col("c")).alias("out")
    ).collect()[0].out


def test_removes_desired_chars(spark):
    # SanitisationProcessorTest.shouldRemoveDesiredCharsInCollections
    record = json.dumps(
        {"fieldA": "a$\x00", "_archivedDateTime": "b", "_archived": "c"},
        separators=(",", ":"),
    )
    out = run_sanitise(spark, record, "db", "collection")
    assert out == '{"fieldA":"ad_","_removedDateTime":"b","_removed":"c"}'


def test_multi_escaped_newlines_survive_in_strip_collections(spark):
    # shouldNotRemoveMultiEscapedNewlines: double-escaped \r / \n and
    # backslash+control combinations survive the negative lookbehind
    record = json.dumps(
        {
            "message": {"db": "penalties-and-deductions", "collection": "sanction"},
            "data": {"carriage": "\\r", "newline": "\\n", "superEscaped": "\\\r\\\n"},
        },
        separators=(",", ":"),
    )
    out = run_sanitise(spark, record, "penalties-and-deductions", "sanction")
    assert out == record


def test_strips_control_chars_in_specific_collections(spark):
    # shouldRemoveDesiredCharsFromSpecificCollections (condensed)
    record = json.dumps(
        {
            "_id": {"declarationId": "47a4fad9\r"},
            "type": "addressDeclaration\n",
            "contractId": "aa16e682\r\n",
        },
        separators=(",", ":"),
    )
    for db, coll in sanitise.STRIP_COLLECTIONS:
        out = run_sanitise(spark, record, db, coll)
        parsed = json.loads(out)
        assert parsed["_id"]["declarationId"] == "47a4fad9"
        assert parsed["type"] == "addressDeclaration"
        assert parsed["contractId"] == "aa16e682"


def test_other_collections_keep_control_chars(spark):
    # shouldNotRemoveCharsFromOtherCollections
    record = json.dumps({"type": "addressDeclaration\n"}, separators=(",", ":"))
    out = run_sanitise(spark, record, "db", "collection")
    assert json.loads(out)["type"] == "addressDeclaration\n"


def test_pipe_also_stripped_by_charclass_quirk(spark):
    # the X1 regex char class [r|n] includes '|' — quirk parity. A lone
    # backslash+pipe can't appear in serializer output (backslashes get
    # doubled, which the lookbehind protects), so exercise the raw string:
    out = run_sanitise(spark, "x\\|y", "core", "healthAndDisabilityDeclaration")
    assert out == "xy"
    # doubled backslash (serializer form) survives via the lookbehind
    out2 = run_sanitise(spark, "x\\\\|y", "core", "healthAndDisabilityDeclaration")
    assert out2 == "x\\\\|y"


def test_equality_wrap_shapes(spark):
    df = spark.createDataFrame(
        [('{"a":1}', "IT"), ("{}", "IT"), ('{"a":1}', None)],
        "r string, t string",
    )
    rows = df.select(
        sanitise.equality_wrap(F.col("r"), F.col("t")).alias("out")
    ).collect()
    assert json.loads(rows[0].out) == {"message": {"a": 1, "@type": "IT"}}
    assert json.loads(rows[1].out) == {"message": {"@type": "IT"}}
    assert json.loads(rows[2].out) == {"message": {"a": 1, "@type": None}}
