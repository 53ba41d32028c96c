"""Randomized-batch property tests for the round-10 byte-walk
parsers (JPEG SOF walk, MP3 ID3v2/syncsafe skip): hundreds of seeded
random payloads evaluated in ONE Spark batch against independent
pure-Python reference decoders — the hypothesis discipline without a
Spark round-trip per example."""

from __future__ import annotations

import random
import struct

from pyspark.sql import functions as F


def _ref_jpeg_dims(b: bytes):
    """Independent reference SOF walker (textbook form)."""
    if len(b) < 4 or b[0:3] != b"\xff\xd8\xff":
        return (None, None)
    i = 2
    for _ in range(24):
        if i + 3 >= len(b):
            return (None, None)
        if b[i] != 0xFF:
            return (None, None)
        marker = b[i + 1]
        if marker in (0xC0, 0xC1, 0xC2):
            if i + 8 >= len(b):
                return (None, None)
            h = int.from_bytes(b[i + 5 : i + 7], "big")
            w = int.from_bytes(b[i + 7 : i + 9], "big")
            return (w, h)
        if marker in (0xDA, 0xD9):
            return (None, None)
        seg_len = int.from_bytes(b[i + 2 : i + 4], "big")
        if seg_len < 2:
            return (None, None)
        i += 2 + seg_len
    return (None, None)


def _rand_jpeg(rng: random.Random) -> bytes:
    out = b"\xff\xd8"
    for _ in range(rng.randint(0, 6)):
        payload = bytes(rng.randrange(256) for _ in range(rng.randint(0, 40)))
        marker = rng.choice(
            [0xE0, 0xE1, 0xE2, 0xDB, 0xC4, 0xFE]  # APPn/DQT/DHT/COM
        )
        out += bytes([0xFF, marker]) + struct.pack(
            ">H", 2 + len(payload)
        ) + payload
    roll = rng.random()
    if roll < 0.6:  # planted SOF
        h, w = rng.randint(1, 65535), rng.randint(1, 65535)
        sof = rng.choice([0xC0, 0xC1, 0xC2])
        out += bytes([0xFF, sof]) + struct.pack(">H", 17) + b"\x08"
        out += struct.pack(">HH", h, w)
        out += b"\x03\x01\x11\x00\x02\x11\x01\x03\x11\x01"
    elif roll < 0.8:  # SOS first -> dead end
        out += b"\xff\xda" + struct.pack(">H", 5) + b"\x01\x02\x03"
    # else: truncated after the segment chain
    out += bytes(rng.randrange(256) for _ in range(rng.randint(0, 30)))
    # the jpeg branch only fires on the FFD8FF sniff prefix; payloads
    # whose first segment byte isn't FF are 'not a JPEG' for BOTH
    # sides (reference checks the same prefix)
    return out


def test_jpeg_walk_matches_reference_on_random_chains(spark):
    from goe_spark.multimodal.media import image_height, image_width

    rng = random.Random(1234)
    cases = [(i, _rand_jpeg(rng)) for i in range(300)]
    # adversarial extras: empty, SOI only, truncated length field
    cases += [
        (1000, b""),
        (1001, b"\xff\xd8"),
        (1002, b"\xff\xd8\xff\xe0"),
        (1003, b"\xff\xd8\xff\xe0\x00"),
        (1004, b"\xff\xd8\xff\xc0\x00\x11\x08\x00\x07\x00\x09"),
    ]
    df = spark.createDataFrame(cases, "media_id long, content binary")
    got = {
        r.media_id: (r.w, r.h)
        for r in df.select(
            "media_id",
            image_width(df.content).alias("w"),
            image_height(df.content).alias("h"),
        ).collect()
    }
    mismatches = []
    for mid, payload in cases:
        want = _ref_jpeg_dims(payload)
        if got[mid] != want:
            mismatches.append((mid, got[mid], want, payload.hex()[:60]))
    assert not mismatches, mismatches[:3]


def _ref_mp3(b: bytes):
    i = 0
    if b[:3] == b"ID3" and len(b) >= 10:
        size = (
            ((b[6] & 0x7F) << 21)
            | ((b[7] & 0x7F) << 14)
            | ((b[8] & 0x7F) << 7)
            | (b[9] & 0x7F)
        )
        i = 10 + size
    if i + 3 >= len(b) or b[i] != 0xFF or (b[i + 1] >> 5) != 0x7:
        return (None, None, None)
    bitrates = (None, 32, 40, 48, 56, 64, 80, 96, 112,
                128, 160, 192, 224, 256, 320, None)
    rates = (44100, 48000, 32000, None)
    modes = ("stereo", "joint", "dual", "mono")
    return (
        bitrates[b[i + 2] >> 4],
        rates[(b[i + 2] >> 2) & 3],
        modes[b[i + 3] >> 6],
    )


def test_mp3_parse_matches_reference_on_random_streams(spark):
    from goe_spark.multimodal.media import (
        mp3_bitrate_kbps,
        mp3_channel_mode,
        mp3_sample_rate,
    )

    rng = random.Random(987)
    cases = []
    for i in range(300):
        hdr = bytes(
            [
                0xFF,
                rng.choice([0xFB, 0xFA, 0xF3, 0xE2]),  # any FFEx sync
                rng.randrange(256),
                rng.randrange(256),
            ]
        )
        if rng.random() < 0.5:
            size = rng.randrange(0, 1 << 21)
            ss = bytes(
                [
                    (size >> 21) & 0x7F,
                    (size >> 14) & 0x7F,
                    (size >> 7) & 0x7F,
                    size & 0x7F,
                ]
            )
            body_len = min(size, 4096)
            payload = (
                b"ID3" + bytes([4, 0, 0]) + ss + b"x" * body_len
            )
            # only spec-consistent cases (full tag present) are
            # comparable — truncated tags are garbage to both sides
            if body_len == size:
                payload += hdr
            cases.append((i, payload))
        else:
            prefix = b"" if rng.random() < 0.8 else b"junk"
            cases.append((i, prefix + hdr))
    df = spark.createDataFrame(cases, "media_id long, content binary")
    got = {
        r.media_id: (r.kbps, r.sr, r.mode)
        for r in df.select(
            "media_id",
            mp3_bitrate_kbps(df.content).alias("kbps"),
            mp3_sample_rate(df.content).alias("sr"),
            mp3_channel_mode(df.content).alias("mode"),
        ).collect()
    }
    mismatches = []
    for mid, payload in cases:
        want = _ref_mp3(payload)
        if got[mid] != want:
            mismatches.append((mid, got[mid], want, payload.hex()[:40]))
    assert not mismatches, mismatches[:3]
