"""systemd .journal binary decode (operators/journal.py — public
systemd.io Journal File Format; the reference dlopens libsystemd,
journalreader.rs:550, and never parses the format itself)."""

import struct

import pandas as pd

from super_speedy_syslog_searcher_spark.operators.journal import (
    HEADER_SIZE_V187,
    decode_journal_file,
    encode_journal,
    read_journal,
)

BASE_US = 1_704_112_402_000_000


def _recs(n):
    return [
        {
            "seqnum": i + 1,
            "ts_us": BASE_US + i * 250_000,
            "monotonic_us": 9_000_000 + i,
            "fields": {
                "MESSAGE": f"unit started {i}",
                "_HOSTNAME": f"node{i % 4}",
                "SYSLOG_IDENTIFIER": "svc",
                "_PID": str(500 + i),
            },
        }
        for i in range(n)
    ]

def test_round_trip():
    recs = _recs(300)
    blob = encode_journal(recs)
    assert blob.startswith(b"LPKSHHRH")
    df = decode_journal_file(blob)
    assert len(df) == 300
    assert list(df["seqnum"]) == [r["seqnum"] for r in recs]
    assert (
        df["ts"].astype("int64") // 1000
        == pd.Series([r["ts_us"] for r in recs])
    ).all()
    assert df["message"].iloc[5] == "unit started 5"
    assert df["hostname"].iloc[6] == "node2"
    assert df["identifier"].iloc[0] == "svc"
    assert int(df["pid"].iloc[9]) == 509
    assert int(df["monotonic_us"].iloc[3]) == 9_000_003


def test_header_fields():
    recs = _recs(4)
    blob = encode_journal(recs)
    (header_size,) = struct.unpack_from("<Q", blob, 88)
    assert header_size == HEADER_SIZE_V187
    (arena,) = struct.unpack_from("<Q", blob, 96)
    assert HEADER_SIZE_V187 + arena == len(blob)
    (n_entries,) = struct.unpack_from("<Q", blob, 152)
    assert n_entries == 4
    (tail_seq,) = struct.unpack_from("<Q", blob, 160)
    (head_seq,) = struct.unpack_from("<Q", blob, 168)
    assert (head_seq, tail_seq) == (1, 4)
    (head_rt,) = struct.unpack_from("<Q", blob, 184)
    assert head_rt == recs[0]["ts_us"]


def test_shared_data_objects_deduplicated():
    # identical field payloads share ONE DATA object (journald dedup);
    # the decode must still resolve every entry's items
    recs = [
        {
            "seqnum": i + 1,
            "ts_us": BASE_US + i,
            "fields": {"MESSAGE": "same text", "_HOSTNAME": "h"},
        }
        for i in range(50)
    ]
    blob = encode_journal(recs)
    assert blob.count(b"MESSAGE=same text") == 1
    df = decode_journal_file(blob)
    assert len(df) == 50
    assert (df["message"] == "same text").all()


def test_torn_tail_keeps_decoded_prefix():
    blob = bytearray(encode_journal(_recs(100)))
    cut = blob[: len(blob) - len(blob) // 3]
    df = decode_journal_file(bytes(cut))
    assert 0 < len(df) < 100
    # what did decode is intact
    assert (df["message"].str.startswith("unit started")).all()


def test_non_journal_bytes_yield_empty():
    assert len(decode_journal_file(b"not a journal")) == 0
    assert len(decode_journal_file(b"")) == 0


def test_read_journal_spark(spark, tmp_path):
    pa = tmp_path / "a.journal"
    pa.write_bytes(encode_journal(_recs(40)))
    pb = tmp_path / "b.journal"
    pb.write_bytes(encode_journal(_recs(10)))
    out = read_journal(spark, [str(pa), str(pb)]).toPandas()
    assert len(out) == 50
    assert set(out["source"].str.rsplit("/", n=1).str[-1]) == {
        "a.journal", "b.journal"
    }
