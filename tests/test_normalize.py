"""Unit tests for the normalization kernel — mirrors the edge cases of the
reference's ValidatorTest/DateWrapperTest/IdUtilityTest (SURVEY §5)."""

import json

import pytest

from hbase_to_mongo_export_spark.functions.normalize import (
    EPOCH_DEFAULT,
    NormalizationError,
    business_audit_transform,
    format_outgoing,
    normalize_record,
    parse_date_lenient,
    parse_date_strict,
    retrieve_last_modified,
    reverse_engineer_id,
    sort_json_by_key,
    timestamp_preference,
    wrap_dates,
)


def norm(payload, rowkey_id='{"id": "fallback"}', db="db", coll="coll", mlm=None):
    text = payload if isinstance(payload, str) else json.dumps(payload)
    return normalize_record(text, rowkey_id, db, coll, mlm)


class TestDates:
    def test_incoming_format_wrapped(self):
        r = norm({"_id": {"a": "1"}, "d": "2018-12-14T15:01:02.000+0000"})
        rec = json.loads(r.record_json)
        assert rec["d"] == {"$date": "2018-12-14T15:01:02.000Z"}

    def test_incoming_nonutc_offset_converted(self):
        r = norm({"_id": {"a": "1"}, "d": "2018-12-14T15:01:02.000+0100"})
        rec = json.loads(r.record_json)
        assert rec["d"] == {"$date": "2018-12-14T14:01:02.000Z"}

    def test_outgoing_format_rewrapped(self):
        r = norm({"_id": {"a": "1"}, "d": "2015-03-20T12:23:25.183Z"})
        rec = json.loads(r.record_json)
        assert rec["d"] == {"$date": "2015-03-20T12:23:25.183Z"}

    def test_non_date_string_untouched(self):
        r = norm({"_id": {"a": "1"}, "d": "not a date", "e": "2018-12-14"})
        rec = json.loads(r.record_json)
        assert rec["d"] == "not a date" and rec["e"] == "2018-12-14"

    def test_existing_date_object_reformatted(self):
        r = norm({"_id": {"a": "1"}, "d": {"$date": "2018-12-14T15:01:02.000+0000"}})
        rec = json.loads(r.record_json)
        assert rec["d"] == {"$date": "2018-12-14T15:01:02.000Z"}

    def test_unparseable_date_object_untouched(self):
        r = norm({"_id": {"a": "1"}, "d": {"$date": "2018-12-14"}})
        rec = json.loads(r.record_json)
        assert rec["d"] == {"$date": "2018-12-14"}

    def test_nested_and_array_dates(self):
        r = norm(
            {
                "_id": {"a": "1"},
                "nested": {"d": "2018-12-14T15:01:02.000+0000"},
                "arr": ["2018-12-14T15:01:02.000+0000", "x", {"d": "2015-03-20T12:23:25.183Z"}],
            }
        )
        rec = json.loads(r.record_json)
        assert rec["nested"]["d"] == {"$date": "2018-12-14T15:01:02.000Z"}
        assert rec["arr"][0] == {"$date": "2018-12-14T15:01:02.000Z"}
        assert rec["arr"][1] == "x"
        assert rec["arr"][2]["d"] == {"$date": "2015-03-20T12:23:25.183Z"}

    def test_date_object_inside_array_double_wrapped(self):
        # Reference quirk: DateWrapper.processJsonArray lacks the
        # mongo-date-object check (DateWrapper.kt:56-73).
        r = norm({"_id": {"a": "1"}, "arr": [{"$date": "2015-03-20T12:23:25.183Z"}]})
        rec = json.loads(r.record_json)
        assert rec["arr"][0] == {"$date": {"$date": "2015-03-20T12:23:25.183Z"}}

    def test_multi_key_object_with_date_key_not_mongo_date(self):
        r = norm({"_id": {"a": "1"}, "d": {"$date": "2015-03-20T12:23:25.183Z", "x": 1}})
        rec = json.loads(r.record_json)
        # two keys ⇒ plain object walk; its string child gets wrapped
        assert rec["d"]["$date"] == {"$date": "2015-03-20T12:23:25.183Z"}


class TestLastModified:
    def test_always_rewritten_to_date_object_and_moved_to_end(self):
        r = norm(
            {"_lastModifiedDateTime": "2018-12-14T15:01:02.000+0000", "_id": {"a": "1"}}
        )
        rec = json.loads(r.record_json)
        assert rec["_lastModifiedDateTime"] == {"$date": "2018-12-14T15:01:02.000Z"}
        assert list(rec.keys())[-1] == "_lastModifiedDateTime"

    def test_fallback_removed_then_created_then_epoch(self):
        r = norm({"_id": {"a": "1"}, "_removedDateTime": "2017-01-01T01:02:03.000Z"})
        assert json.loads(r.record_json)["_lastModifiedDateTime"] == {
            "$date": "2017-01-01T01:02:03.000Z"
        }
        r = norm({"_id": {"a": "1"}, "createdDateTime": "2015-03-20T12:23:25.183Z"})
        assert json.loads(r.record_json)["_lastModifiedDateTime"] == {
            "$date": "2015-03-20T12:23:25.183Z"
        }
        r = norm({"_id": {"a": "1"}})
        assert json.loads(r.record_json)["_lastModifiedDateTime"] == {
            "$date": EPOCH_DEFAULT
        }

    def test_date_object_source_accepted(self):
        r = norm(
            {"_id": {"a": "1"}, "_lastModifiedDateTime": {"$date": "2018-12-14T15:01:02.000+0000"}}
        )
        assert json.loads(r.record_json)["_lastModifiedDateTime"] == {
            "$date": "2018-12-14T15:01:02.000Z"
        }

    def test_unparseable_last_modified_quarantines(self):
        r = norm({"_id": {"a": "1"}, "_lastModifiedDateTime": "garbage"})
        assert r.record_json is None and r.error is not None

    def test_blank_last_modified_falls_through(self):
        r = norm({"_id": {"a": "1"}, "_lastModifiedDateTime": "   ",
                  "createdDateTime": "2015-03-20T12:23:25.183Z"})
        assert json.loads(r.record_json)["_lastModifiedDateTime"] == {
            "$date": "2015-03-20T12:23:25.183Z"
        }


class TestArchivedRemoved:
    def test_archived_dropped_when_removed_present(self):
        r = norm(
            {
                "_id": {"a": "1"},
                "_archivedDateTime": "2016-01-01T01:01:01.000Z",
                "_removedDateTime": "2017-01-01T01:01:01.000Z",
            }
        )
        rec = json.loads(r.record_json)
        assert "_archivedDateTime" not in rec
        assert rec["_removedDateTime"] == {"$date": "2017-01-01T01:01:01.000Z"}

    def test_archived_kept_when_removed_absent(self):
        r = norm({"_id": {"a": "1"}, "_archivedDateTime": "2016-01-01T01:01:01.000Z"})
        rec = json.loads(r.record_json)
        assert rec["_archivedDateTime"] == {"$date": "2016-01-01T01:01:01.000Z"}


class TestIds:
    def test_object_id_kept_and_manifest_sorted(self):
        # ValidatorTest.kt:39-52
        r = norm({"_id": {"someId": "RANDOM_GUID", "declarationId": 1234}})
        rec = json.loads(r.record_json)
        assert rec["_id"] == {"someId": "RANDOM_GUID", "declarationId": 1234}
        assert r.manifest_id == '{"declarationId":1234,"someId":"RANDOM_GUID"}'
        assert r.manifest_original_id == r.manifest_id

    def test_scalar_id_becomes_oid_moved_to_end(self):
        r = norm({"_id": "00043", "x": 1})
        rec = json.loads(r.record_json)
        assert rec["_id"] == {"$oid": "00043"}
        assert list(rec.keys())[-1] == "_id"
        assert r.manifest_id == '{"$oid":"00043"}'
        assert r.manifest_original_id == "00043"

    def test_numeric_id_stringified(self):
        r = norm({"_id": 1234})
        assert json.loads(r.record_json)["_id"] == {"$oid": "1234"}
        assert r.manifest_original_id == "1234"

    def test_null_id_quarantined(self):
        r = norm({"_id": None})
        assert r.record_json is None and r.error is not None

    def test_absent_id_scalar_rowkey(self):
        r = norm({"x": 1}, rowkey_id='{"id": "plain_id"}')
        assert r.manifest_original_id == "plain_id"
        assert r.manifest_id == '{"$oid":"plain_id"}'

    def test_absent_id_object_rowkey(self):
        r = norm({"x": 1}, rowkey_id='{"b": "2", "a": "1"}')
        assert r.manifest_id == '{"a":"1","b":"2"}'
        assert r.manifest_original_id == r.manifest_id

    def test_absent_id_nonjson_rowkey_quarantined(self):
        r = norm({"x": 1}, rowkey_id="notjson")
        assert r.record_json is None and r.error is not None


class TestParseReject:
    def test_non_object_payload_quarantined(self):
        for bad in ['"hello"', "[1,2]", "12", "{truncated"]:
            r = norm(bad)
            assert r.record_json is None and r.error is not None, bad

    def test_json_null_payload_silently_dropped(self):
        r = norm("null")
        assert r.record_json is None and r.error is None


class TestBusinessAudit:
    def test_context_promoted(self):
        r = norm(
            {"auditType": "T1", "context": {"f": "v"}, "_id": "unused"},
            db="data",
            coll="businessAudit",
            mlm="2020-05-05T05:05:05.000+0000",
        )
        rec = json.loads(r.record_json)
        assert rec["f"] == "v"
        assert rec["AUDIT_EVENT"] == "T1"
        # the transform runs BEFORE validation (DecryptionProcessor.kt:47-50),
        # so the stamped date strings get wrapped by the generic walk
        assert rec["TIME_STAMP"] == {"$date": "2020-05-05T05:05:05.000Z"}
        assert rec["TIME_STAMP_ORIG"] == {"$date": "2020-05-05T05:05:05.000Z"}
        # context replaced the record ⇒ no _id ⇒ rowkey fallback
        assert r.manifest_original_id == "fallback"

    def test_missing_audit_type_quarantined(self):
        r = norm({"context": {"f": "v"}}, db="data", coll="businessAudit")
        assert r.record_json is None and r.error is not None


class TestUtilities:
    def test_sort_json_top_level_only(self):
        assert (
            sort_json_by_key('{"b": {"z": 1, "a": 2}, "a": 3}')
            == '{"a":3,"b":{"z":1,"a":2}}'
        )

    def test_reverse_engineer_id(self):
        assert reverse_engineer_id('{"id": "x"}') == ("x", '{"$oid":"x"}')
        s = reverse_engineer_id('{"b": 1, "a": 2}')
        assert s == ('{"a":2,"b":1}', '{"a":2,"b":1}')

    def test_timestamp_preference(self):
        created = "2015-03-20T12:23:25.183Z"
        modified = "2018-12-14T15:01:02.000+0000"
        full = timestamp_preference(created, modified, "full")
        inc = timestamp_preference(created, modified, "incremental")
        assert full == 1426854205183
        assert inc == 1544799662000
        # fallback when preferred unparseable
        assert timestamp_preference("junk", modified, "full") == inc
        with pytest.raises(NormalizationError):
            timestamp_preference("junk", "junk", "full")

    def test_parse_strict_full_match_only(self):
        assert parse_date_strict("2018-12-14T15:01:02.000+0000") is not None
        assert parse_date_strict("x2018-12-14T15:01:02.000+0000") is None
        assert parse_date_strict("2018-12-14T15:01:02.000+0000x") is None
        assert parse_date_strict("2018-12-14T15:01:02.000") is None

    def test_format_outgoing_millis(self):
        assert format_outgoing(parse_date_lenient("2018-12-14T15:01:02.000+0000")) == (
            "2018-12-14T15:01:02.000Z"
        )
