"""Envelope parsing edge cases — mirrors HBaseResultProcessorTest:
missing/blank db/collection fall back to the topic name; malformed
envelopes quarantine rather than fail."""

import json

from hbase_to_mongo_export_spark.sources import envelope as env
from hbase_to_mongo_export_spark.sources import fixtures


def _row_with(spark, mutate):
    obj = json.loads(fixtures.envelope_row(0)[2])
    mutate(obj)
    return spark.createDataFrame(
        [(b"\x00\x00\x00\x00k", 1000, json.dumps(obj))], fixtures.SOURCE_SCHEMA
    )


def test_db_collection_fallback_from_topic(spark):
    def clear(o):
        o["message"]["db"] = ""
        del o["message"]["collection"]

    df = env.parse_envelope(_row_with(spark, clear), topic="db.some-db.some-coll")
    r = df.collect()[0]
    assert r.db == "some_db" and r.collection == "some_coll"


def test_message_values_win_over_topic(spark):
    df = env.parse_envelope(
        _row_with(spark, lambda o: None), topic="db.other-db.other-coll"
    )
    r = df.collect()[0]
    assert r.db == "database" and r.collection == "collection"


def test_no_topic_and_no_db_goes_to_quarantine(spark):
    def clear(o):
        o["message"]["db"] = "  "

    df = env.parse_envelope(_row_with(spark, clear), topic=None)
    good, quarantine = env.split_mandatory(df)
    assert good.count() == 0 and quarantine.count() == 1


def test_non_json_envelope_quarantined(spark):
    df = spark.createDataFrame(
        [(b"\x00\x00\x00\x00k", 1000, "this is not json")], fixtures.SOURCE_SCHEMA
    )
    good, quarantine = env.split_mandatory(env.parse_envelope(df, topic=None))
    assert good.count() == 0 and quarantine.count() == 1


def test_topic_regex_matches_reference(spark):
    # TextUtils.kt:7-8 semantics incl. the optional leading qualifier
    assert env.topic_to_db_collection("db.database.collection") == (
        "database", "collection",
    )
    assert env.topic_to_db_collection("data.equality") == ("data", "equality")
    assert env.topic_to_db_collection("a.b-c.d-e") == ("b_c", "d_e")
    try:
        env.topic_to_db_collection("nodots")
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
