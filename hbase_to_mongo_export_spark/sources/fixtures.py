"""Deterministic HBase-shaped fixture generator.

Mirrors the reference integration generator (images/hbase/hbase_data.py):
- rowkey = 4-byte CRC32 (little-endian, matching sys.byteorder on the
  reference's test hosts) of the JSON ``_id`` text ++ UTF-8 of that text,
  where the ``_id`` text uses json.dumps DEFAULT separators (spaces);
- envelope per hbase_data.py:72-96 with cell timestamp 1000;
- payload per hbase_data.py:99-104 — ``_id`` alternates object (even i) and
  scalar string (odd i), exercising both id-normalization paths;
- payloads AES-CTR-encrypted with one run key; ``encryptedEncryptionKey``
  is base64(plaintext key) so ``crypto.local_key_service`` can "decrypt" it.

Unlike the reference this generator is seed-free-deterministic: the IV for
record i is md5(f"iv{i}") so fixture bytes never change between runs.
"""

from __future__ import annotations

import base64
import hashlib
import json
import zlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..functions.crypto import aes_ctr

FIXTURE_KEY = hashlib.md5(b"fixture-data-key").digest()  # 16-byte AES key
FIXTURE_KEY_B64 = base64.b64encode(FIXTURE_KEY).decode("ascii")
KEK_ID = "cloudhsm:fixture,fixture"

SOURCE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType()),
        T.StructField("ts", T.LongType()),
        T.StructField("value", T.StringType()),
    ]
)


def record_id(i: int) -> dict | str:
    return {"record_id": f"{i:05d}"} if i % 2 == 0 else f"{i:05d}"


def payload(i: int) -> dict:
    return {
        "_id": record_id(i),
        "createdDateTime": "2015-03-20T12:23:25.183Z",
        "_lastModifiedDateTime": "2018-12-14T15:01:02.000+0000",
    }


def rowkey(message_id_json: str) -> bytes:
    checksum = zlib.crc32(message_id_json.encode("ascii")).to_bytes(4, "little")
    return checksum + message_id_json.encode("utf-8")


def iv_for(i: int) -> bytes:
    return hashlib.md5(f"iv{i}".encode()).digest()


def envelope_row(
    i: int,
    database: str = "database",
    collection: str = "collection",
    payload_obj: dict | None = None,
    ts: int = 1000,
    plaintext: bool = False,
) -> tuple[bytes, int, str]:
    body = payload_obj if payload_obj is not None else payload(i)
    record_string = json.dumps(body)
    iv = iv_for(i)
    if plaintext:
        db_object = record_string
        iv_b64 = base64.b64encode(iv).decode("ascii")
    else:
        ciphertext = aes_ctr(FIXTURE_KEY, iv, record_string.encode("utf-8"))
        db_object = base64.b64encode(ciphertext).decode("ascii")
        iv_b64 = base64.b64encode(iv).decode("ascii")
    # json.dumps default separators — reference hbase_data.py:51 does the same.
    message_id = json.dumps(body.get("_id", record_id(i)))
    wrapper = {
        "traceId": f"{i:05d}",
        "unitOfWorkId": f"{i:05d}",
        "@type": "OUTER_TYPE",
        "message": {
            "db": database,
            "collection": collection,
            "_id": body.get("_id", record_id(i)),
            "_timeBasedHash": "hash",
            "@type": "INNER_TYPE",
            "_lastModifiedDateTime": "2018-12-14T15:01:02.000+0000",
            "encryption": {
                "encryptionKeyId": "",
                "encryptedEncryptionKey": FIXTURE_KEY_B64,
                "initialisationVector": iv_b64,
                "keyEncryptionKeyId": KEK_ID,
            },
            "dbObject": db_object,
        },
        "version": "core-4.master.9790",
        "timestamp": "2019-07-04T07:27:35.104+0000",
    }
    return rowkey(message_id), ts, json.dumps(wrapper)


def source_records(
    spark: SparkSession,
    n: int = 10_000,
    database: str = "database",
    collection: str = "collection",
    plaintext: bool = False,
    extra_rows: list[tuple[bytes, int, str]] | None = None,
) -> DataFrame:
    rows = [
        envelope_row(i, database, collection, plaintext=plaintext) for i in range(n)
    ]
    if extra_rows:
        rows.extend(extra_rows)
    return spark.createDataFrame(rows, SOURCE_SCHEMA)
