"""EVTX binary decode (operators/evtx.py — evtxreader.rs:101-238
semantics over the public libyal EVTX layout)."""

import struct

import pandas as pd
import pytest

from super_speedy_syslog_searcher_spark.operators.evtx import (
    CHUNK_SIZE,
    FILE_HEADER_SIZE,
    decode_evtx_file,
    encode_evtx,
    filetime_to_us,
    read_evtx,
    resort_with_ooo,
    us_to_filetime,
)

BASE_US = 1_704_112_402_000_000  # 2024-01-01T12:33:22Z


def _recs(n, scramble=False):
    out = []
    for i in range(n):
        us = BASE_US + i * 1_000_000
        if scramble and i % 5 == 0:
            us -= 7_200_000_000  # 2h backwards
        out.append(
            {
                "record_id": i + 1,
                "ts_us": us,
                "payload": f"<Event><EventID>{i}</EventID></Event>",
            }
        )
    return out


def test_filetime_round_trip():
    assert filetime_to_us(us_to_filetime(BASE_US)) == BASE_US
    # 1601 epoch: FILETIME 0 is -11644473600s
    assert filetime_to_us(0) == -11_644_473_600 * 1_000_000


def test_round_trip_multi_chunk():
    recs = [
        {
            "record_id": i + 1,
            "ts_us": BASE_US + i,
            "payload": "x" * (200 + i % 400),
        }
        for i in range(1500)
    ]
    blob = encode_evtx(recs)
    n_chunks = (len(blob) - FILE_HEADER_SIZE) // CHUNK_SIZE
    assert n_chunks > 1, "fixture must span several 64 KiB chunks"
    df = decode_evtx_file(blob)
    assert list(df["record_id"]) == [r["record_id"] for r in recs]
    assert list(df["rec_idx"]) == list(range(1500))
    assert (
        df["ts"].astype("int64") // 1000
        == pd.Series([r["ts_us"] for r in recs])
    ).all()
    assert df["payload"].iloc[7] == recs[7]["payload"]
    assert int(df["payload_len"].iloc[7]) == len(recs[7]["payload"])


def test_header_fields_and_checksums():
    import zlib

    blob = encode_evtx(_recs(10))
    assert blob.startswith(b"ElfFile\x00")
    (n_chunks,) = struct.unpack_from("<H", blob, 42)
    assert n_chunks == 1
    (crc,) = struct.unpack_from("<I", blob, 124)
    assert crc == zlib.crc32(blob[0:120])
    chunk = blob[FILE_HEADER_SIZE:]
    assert chunk.startswith(b"ElfChnk\x00")
    (ccrc,) = struct.unpack_from("<I", chunk, 124)
    assert ccrc == zlib.crc32(chunk[0:120])


def test_torn_chunk_recovers_other_chunks():
    recs = [
        {"record_id": i + 1, "ts_us": BASE_US + i, "payload": "y" * 300}
        for i in range(400)
    ]
    blob = bytearray(encode_evtx(recs))
    assert (len(blob) - FILE_HEADER_SIZE) // CHUNK_SIZE >= 2
    # stomp the first record magic of chunk 0: its walk stops at
    # record 0, later chunks still decode
    blob[FILE_HEADER_SIZE + 512 : FILE_HEADER_SIZE + 516] = b"XXXX"
    df = decode_evtx_file(bytes(blob))
    assert 0 < len(df) < 400
    assert df["record_id"].min() > 1


def test_non_evtx_bytes_yield_empty():
    assert len(decode_evtx_file(b"not an event log")) == 0
    assert len(decode_evtx_file(b"")) == 0


def test_read_and_resort_spark(spark, tmp_path):
    p = tmp_path / "log.evtx"
    p.write_bytes(encode_evtx(_recs(50, scramble=True)))
    out = resort_with_ooo(read_evtx(spark, str(p))).toPandas()
    assert len(out) == 50
    # every 5th record (except rec 0) jumped 2h backwards → ooo
    assert int(out["ooo"].sum()) == len([i for i in range(1, 50) if i % 5 == 0])
    # sorted_idx is a permutation ordered by (ts, rec_idx)
    srt = out.sort_values("sorted_idx")
    assert list(srt["sorted_idx"]) == list(range(50))
    ts = list(srt["ts"])
    assert ts == sorted(ts)
