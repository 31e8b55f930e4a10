"""Property-based tests (hypothesis) for the normalization kernel.

The reference's suite is example-based (SURVEY §5: no property testing);
these properties pin the kernel against arbitrary payload shapes:

1. normalize never crashes — every input yields a record or a quarantine
   reason;
2. output (when produced) is valid JSON with a {"$date": ...}-shaped
   _lastModifiedDateTime, and the wrapped value round-trips the outgoing
   format;
3. the walk is idempotent: normalizing an already-normalized record is a
   no-op (dates are already outgoing-format, ids already objects);
4. manifest ids are stable (same input → same output) and key-sorted for
   object ids.
"""

import json

from hypothesis import given, settings, strategies as st

from hbase_to_mongo_export_spark.functions.normalize import (
    OUTGOING_RE,
    normalize_record,
)

# --- strategies -------------------------------------------------------------

scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**53), max_value=2**53),
    st.text(max_size=40),
    st.sampled_from(
        [
            "2018-12-14T15:01:02.000+0000",
            "2015-03-20T12:23:25.183Z",
            "1980-01-01T00:00:00.000Z",
            "not a date",
            "2018-12-14",
        ]
    ),
)

json_trees = st.recursive(
    scalars,
    lambda children: st.one_of(
        st.lists(children, max_size=4),
        st.dictionaries(
            st.text(min_size=1, max_size=12).filter(
                lambda k: k != "_lastModifiedDateTime"
            ),
            children,
            max_size=4,
        ),
    ),
    max_leaves=12,
)

payloads = st.dictionaries(
    st.text(min_size=1, max_size=12), json_trees, max_size=5
)


def norm(obj):
    return normalize_record(json.dumps(obj), '{"id": "rk"}', "db", "coll", None)


@settings(max_examples=200, deadline=None)
@given(payloads)
def test_never_crashes_and_output_is_json(obj):
    r = norm(obj)
    assert (r.record_json is not None) or (r.error is not None) or obj is None
    if r.record_json is not None:
        rec = json.loads(r.record_json)
        lm = rec["_lastModifiedDateTime"]
        assert set(lm.keys()) == {"$date"}
        assert OUTGOING_RE.match(lm["$date"]), lm


@settings(max_examples=200, deadline=None)
@given(payloads)
def test_deterministic(obj):
    a, b = norm(obj), norm(obj)
    assert (a.record_json, a.manifest_id, a.manifest_original_id, a.error) == (
        b.record_json,
        b.manifest_id,
        b.manifest_original_id,
        b.error,
    )


def _has_date_object_in_array(node, in_array=False):
    """True if any {"$date": ...} object sits inside an array — the one
    shape the reference re-wraps on every pass (DateWrapper.kt:56-73 lacks
    the mongo-date check for array elements; deliberate quirk parity)."""
    if isinstance(node, dict):
        if in_array and set(node.keys()) == {"$date"}:
            return True
        return any(_has_date_object_in_array(v, False) for v in node.values())
    if isinstance(node, list):
        return any(_has_date_object_in_array(v, True) for v in node)
    return False


@settings(max_examples=150, deadline=None)
@given(payloads)
def test_idempotent_on_normalized_output(obj):
    first = norm(obj)
    if first.record_json is None:
        return
    a = json.loads(first.record_json)
    if _has_date_object_in_array(a):
        return  # reference quirk: array-nested $date re-wraps every pass
    second = normalize_record(first.record_json, '{"id": "rk"}', "db", "coll", None)
    if second.record_json is None:
        return
    assert a == json.loads(second.record_json)


@settings(max_examples=100, deadline=None)
@given(
    st.dictionaries(
        st.text(min_size=1, max_size=8), st.text(max_size=10), min_size=1, max_size=4
    )
)
def test_object_id_manifest_sorted(idobj):
    r = norm({"_id": idobj, "x": 1})
    if r.record_json is None:
        return
    parsed = json.loads(r.manifest_id)
    assert parsed == idobj
    assert list(parsed.keys()) == sorted(idobj.keys())
