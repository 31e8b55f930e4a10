r"""Sanitisation + per-collection transforms as built-in column expressions.

These are the reference's SanitisationProcessor/TransformationProcessor
(X1-X3 in SURVEY §2.5) re-expressed as Catalyst column functions — they run
JVM-side inside whole-stage codegen, never in Python.

Fidelity notes (reproduced exactly, not "fixed"):
- the X1 strip regex is ``(?<!\\)\\[r|n]`` — the character class contains
  ``r``, ``|`` and ``n``, so a single-escaped ``\|`` is stripped too
  (SanitisationProcessor.kt:14);
- X2's ``$`` → ``d_`` is a literal replace over the whole serialized record
  — it renames legitimate ``$``-prefixed user fields as well
  (SanitisationProcessor.kt:20-23);
- replacement order matters: ``_archivedDateTime`` → ``_removedDateTime``
  first, then bare ``_archived`` → ``_removed``;
- ``\\u0000`` removal targets the six-character escape sequence that gson
  emits for NUL, i.e. the literal text ``\\u0000`` in the serialized JSON.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (db, collection) pairs subject to escape stripping (SanitisationProcessor.kt:37-39)
STRIP_COLLECTIONS = (
    ("penalties-and-deductions", "sanction"),
    ("core", "healthAndDisabilityDeclaration"),
    ("accepted-data", "healthAndDisabilityCircumstances"),
)

STRIP_REGEX = r"(?<!\\)\\[r|n]"


def strip_escapes_if_applicable(record: Column, db: Column, collection: Column) -> Column:
    """X1: remove single-escaped \\r, \\n (and \\|) tokens for the three
    hard-coded collections (SanitisationProcessor.kt:33-44)."""
    cond = F.lit(False)
    for d, c in STRIP_COLLECTIONS:
        cond = cond | ((db == F.lit(d)) & (collection == F.lit(c)))
    return F.when(cond, F.regexp_replace(record, STRIP_REGEX, "")).otherwise(record)


def global_replacements(record: Column) -> Column:
    """X2: literal replacements on the serialized JSON (order-sensitive,
    SanitisationProcessor.kt:20-23)."""
    out = F.replace(record, F.lit("$"), F.lit("d_"))
    out = F.replace(out, F.lit("\\u0000"), F.lit(""))
    out = F.replace(out, F.lit("_archivedDateTime"), F.lit("_removedDateTime"))
    out = F.replace(out, F.lit("_archived"), F.lit("_removed"))
    return out


def sanitise(record: Column, db: Column, collection: Column) -> Column:
    """Full sanitisation chain (X1 then X2), matching process() ordering."""
    return global_replacements(strip_escapes_if_applicable(record, db, collection))


EQUALITY_TOPIC = "data.equality"


def equality_wrap(record: Column, inner_type: Column) -> Column:
    """X3: for topic data.equality the output becomes
    ``{"message": {<record fields>, "@type": <innerType>}}``
    (TransformationProcessor.kt:31-40).

    Implemented as string surgery on the already-compact record JSON (drop
    the final ``}``, append ``,"@type":"..."}``, wrap) instead of a
    re-parse round-trip — stays JVM-side. If the payload already carried an
    ``@type`` key this appends a duplicate whose later position wins on
    parse, matching gson's replace-value semantics for any JSON consumer.
    """
    head = record.substr(F.lit(1), F.length(record) - F.lit(1))
    sep = F.when(F.length(record) > 2, F.lit(",")).otherwise(F.lit(""))
    typ = F.when(inner_type.isNull(), F.lit("null")).otherwise(
        F.concat(F.lit('"'), inner_type, F.lit('"'))
    )
    return F.concat(
        F.lit('{"message":'), head, sep, F.lit('"@type":'), typ, F.lit("}}")
    )


def apply_topic_transform(record: Column, inner_type: Column, topic: str | None) -> Column:
    """Per-topic transform dispatch — only data.equality has one
    (TransformationProcessor.kt:21-29)."""
    if topic == EQUALITY_TOPIC:
        return equality_wrap(record, inner_type)
    return record
