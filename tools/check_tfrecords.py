#!/usr/bin/env python3
"""Independent TFRecord + tf.Example checker (pure stdlib + duckdb).

Decodes the Scala engine's TFRecord output with a from-scratch Python
implementation (CRC32C, masked-CRC framing, minimal protobuf wire
parser) — sharing NO code with graft.io.TfRecord — then cross-checks
the decoded feature multiset against a DuckDB point-in-time oracle over
the same parquet tables.

Usage:
  python3 tools/check_tfrecords.py <outDir> [dataDir]
  # <outDir> as produced by graft.run.Main (train/ eval/ subdirs)
  # exit 0 and prints "0 mismatches" on success
"""
import os
import struct
import sys

# ---- CRC32C (Castagnoli, reflected poly 0x82F63B78), table-driven ----
_TABLE = []
for n in range(256):
    c = n
    for _ in range(8):
        c = (c >> 1) ^ 0x82F63B78 if c & 1 else c >> 1
    _TABLE.append(c)


def crc32c(data: bytes) -> int:
    c = 0xFFFFFFFF
    for b in data:
        c = _TABLE[(c ^ b) & 0xFF] ^ (c >> 8)
    return c ^ 0xFFFFFFFF


def masked_crc(data: bytes) -> int:
    c = crc32c(data)
    return (((c >> 15) | (c << 17)) + 0xA282EAD8) & 0xFFFFFFFF


def read_tfrecords(path):
    """Yield payload bytes; raises on any CRC/framing violation."""
    import gzip
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as f:
        while True:
            hdr = f.read(8)
            if not hdr:
                return
            assert len(hdr) == 8, f"{path}: truncated length"
            (length,) = struct.unpack("<Q", hdr)
            (lcrc,) = struct.unpack("<I", f.read(4))
            assert lcrc == masked_crc(hdr), f"{path}: length CRC mismatch"
            data = f.read(length)
            assert len(data) == length, f"{path}: truncated payload"
            (dcrc,) = struct.unpack("<I", f.read(4))
            assert dcrc == masked_crc(data), f"{path}: data CRC mismatch"
            yield data


# ---- minimal protobuf wire parser (enough for tf.Example) ----
def _varint(buf, i):
    v, shift = 0, 0
    while True:
        b = buf[i]
        i += 1
        v |= (b & 0x7F) << shift
        if not b & 0x80:
            return v, i
        shift += 7


def _fields(buf):
    """Yield (field_number, wire_type, value) over a message buffer."""
    i = 0
    while i < len(buf):
        tag, i = _varint(buf, i)
        fno, wt = tag >> 3, tag & 7
        if wt == 0:
            v, i = _varint(buf, i)
        elif wt == 1:
            v, i = buf[i:i + 8], i + 8
        elif wt == 2:
            ln, i = _varint(buf, i)
            v, i = buf[i:i + ln], i + ln
        elif wt == 5:
            v, i = buf[i:i + 4], i + 4
        else:
            raise AssertionError(f"unsupported wire type {wt}")
        yield fno, wt, v


def parse_example(buf):
    """tf.Example -> {name: list of values (bytes/float/int)}."""
    out = {}
    for fno, _, features in _fields(buf):          # Example.features = 1
        assert fno == 1, f"unexpected Example field {fno}"
        for fno2, _, entry in _fields(features):   # Features.feature = 1 (map)
            assert fno2 == 1
            name, feat = None, b""
            for k, _, v in _fields(entry):         # map entry: key=1, value=2
                if k == 1:
                    name = v.decode()
                else:
                    feat = v
            vals = []
            for k, wt, v in _fields(feat):         # Feature oneof
                if k == 1:                         # BytesList
                    vals += [bv for kk, _, bv in _fields(v) if kk == 1]
                elif k == 2:                       # FloatList (packed or not)
                    for kk, wt2, fv in _fields(v):
                        if wt2 == 5:
                            vals.append(struct.unpack("<f", fv)[0])
                        else:  # packed
                            vals += [x[0] for x in struct.iter_unpack("<f", fv)]
                elif k == 3:                       # Int64List (packed or not)
                    for kk, wt2, iv in _fields(v):
                        if wt2 == 0:
                            vals.append(iv)
                        else:
                            j = 0
                            while j < len(iv):
                                x, j = _varint(iv, j)
                                vals.append(x)
            out[name] = vals
    return out


def main():
    out_dir = sys.argv[1]
    data_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    records = []
    for split in ("train", "eval"):
        d = os.path.join(out_dir, split)
        if not os.path.isdir(d):
            continue
        for fn in sorted(os.listdir(d)):
            if fn.startswith("part-"):
                for payload in read_tfrecords(os.path.join(d, fn)):
                    records.append(parse_example(payload))
    print(f"decoded {len(records)} records with valid CRC framing")
    assert records, "no records decoded"

    # Cross-check the feature multiset against a DuckDB PIT oracle:
    # every event row picks the latest order of its user with
    # o_orderdate <= event ts (the registry's order_features view).
    import duckdb

    def f32(x):  # tf.Example FloatList is float32 — quantize the oracle too
        return None if x is None else struct.unpack("<f", struct.pack("<f", x))[0]

    # None-safe total order: unmatched events carry None features and
    # Python 3 refuses None < float — sort on a presence-tagged key.
    def key(t):
        return (t[0], t[1] is not None, t[1] or 0.0, t[2] or "")

    got = sorted(
        ((r["o_custkey"][0],
          f32(r["o_totalprice"][0]) if r.get("o_totalprice") else None,
          r["o_orderstatus"][0].decode() if r.get("o_orderstatus") else None)
         for r in records), key=key)
    # Explicit tie-break mirroring the engine's max(struct(ts, createdTs,
    # price, status)) dedup — a bare ASOF join picks an ARBITRARY row
    # among orders tied on the winning o_orderdate (sf0.01 has 194 such
    # events) and would flag a correct output as mismatched.
    exp = duckdb.sql(f"""
        WITH c AS (
          SELECT e.event_id, e.user_id, o.o_totalprice, o.o_orderstatus,
                 ROW_NUMBER() OVER (PARTITION BY e.event_id
                   ORDER BY o.o_orderdate DESC, o.o_totalprice DESC,
                            o.o_orderstatus DESC) AS rn
          FROM read_parquet('{data_dir}/events.parquet') e
          LEFT JOIN read_parquet('{data_dir}/orders.parquet') o
            ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts)
        SELECT user_id, o_totalprice, o_orderstatus FROM c WHERE rn = 1""").fetchall()
    exp = sorted(((a, f32(b), c) for a, b, c in exp), key=key)
    mism = sum(1 for g, x in zip(got, exp) if g != x) + abs(len(got) - len(exp))
    print(f"{mism} mismatches ({len(got)} decoded vs {len(exp)} oracle rows)")
    sys.exit(0 if mism == 0 else 1)


if __name__ == "__main__":
    main()
