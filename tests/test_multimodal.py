"""Multimodal plumbing: schema, Arrow batch shape, determinism, and
the clearly-marked real-codec stub."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from goe_spark.catalog import load_table
from goe_spark.multimodal import (
    MEDIA_FEATURE_SCHEMA,
    attach_media,
    decode_media_features,
    frame_sample,
    resize_images,
)
from goe_spark.multimodal.media import decode_image
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def media(spark):
    return attach_media(load_table(spark, SF_SMALL, "documents")).cache()


def test_media_schema_is_opaque_binary(media):
    kinds = dict(media.groupBy("kind").count().collect())
    assert set(kinds) == {"image", "audio", "video"}
    assert dict(media.dtypes)["content"] == "binary"


def test_decode_features_schema_and_rows(media):
    feats = decode_media_features(media)
    assert feats.schema == MEDIA_FEATURE_SCHEMA
    assert feats.count() == media.count()
    img = feats.where("kind = 'image'").first()
    assert img.width is not None and img.sample_rate is None
    aud = feats.where("kind = 'audio'").first()
    assert aud.sample_rate == 16000 and aud.width is None


def test_decode_is_deterministic(media):
    a = sorted(map(tuple, decode_media_features(media).collect()))
    b = sorted(map(tuple, decode_media_features(media).collect()))
    assert a == b


def test_n_bytes_matches_utf8_length(media, spark):
    feats = decode_media_features(media)
    docs = load_table(spark, SF_SMALL, "documents").select(
        F.col("doc_id").alias("media_id"),
        F.octet_length(F.encode("text", "UTF-8")).alias("expect"),
    )
    bad = (
        feats.join(docs, "media_id")
        .where(F.col("n_bytes") != F.col("expect"))
        .count()
    )
    assert bad == 0


def test_real_codec_is_stubbed():
    with pytest.raises(NotImplementedError, match="codec not available"):
        decode_image(b"\x89PNG")


def test_resize_contract(media):
    out = resize_images(media, 224, 224)
    rows = out.collect()
    assert all(r.width == 224 and r.height == 224 for r in rows)
    assert all(r.n_bytes_out <= 224 * 224 * 3 for r in rows)
    assert len(rows) == media.where("kind = 'image'").count()


def test_frame_sample_fanout(media):
    frames = frame_sample(media, every_n=30)
    per_media = frames.groupBy("media_id").count()
    # every video yields >= 1 frame row; offsets are increasing
    assert per_media.where("count < 1").count() == 0
    one = (
        frames.orderBy("media_id", "frame_idx")
        .where(F.col("media_id") == per_media.first().media_id)
        .collect()
    )
    offs = [r.frame_offset_bytes for r in one]
    assert offs == sorted(offs)


def test_sniff_format_magic_bytes(spark):
    """Container sniffing on REAL magic bytes — the non-degenerate
    paths the text-payload fixture cannot exercise."""
    from goe_spark.multimodal.media import sniff_format

    payloads = [
        (1, bytes.fromhex("89504E470D0A1A0A") + b"rest"),  # png
        (2, bytes.fromhex("FFD8FFE0") + b"jfif"),          # jpeg
        (3, b"GIF89a" + b"x"),                             # gif (47 49 46 38)
        (4, b"RIFF1234WAVE"),                              # riff container
        (5, b"%PDF-1.7"),                                  # pdf
        (6, b"ID3\x04tag"),                                # mp3
        (7, bytes.fromhex("1F8B08") + b"z"),               # gzip
        (8, b"plain text bytes"),                          # unknown
        (9, b""),                                          # empty -> unknown
    ]
    df = spark.createDataFrame(payloads, "media_id long, content binary")
    got = {
        r.media_id: r.fmt
        for r in df.select(
            "media_id", sniff_format(df.content).alias("fmt")
        ).collect()
    }
    assert got == {
        1: "png", 2: "jpeg", 3: "gif", 4: "riff", 5: "pdf",
        6: "mp3", 7: "gzip", 8: "unknown", 9: "unknown",
    }


def test_nibble_entropy_known_values(spark):
    """Entropy sanity on constructed payloads: a constant byte scores
    0, a payload covering all 16 nibbles uniformly scores ln 16, and
    empty content scores 0 (guard path)."""
    import math

    from goe_spark.multimodal.media import nibble_entropy

    uniform = bytes(range(256))  # every nibble appears 32 times
    payloads = [
        (1, b"\x00" * 64),
        (2, uniform),
        (3, b""),
    ]
    df = spark.createDataFrame(payloads, "media_id long, content binary")
    got = {
        r.media_id: r.ent
        for r in df.select(
            "media_id", nibble_entropy(df.content).alias("ent")
        ).collect()
    }
    assert got[1] == 0.0
    assert abs(got[2] - math.log(16)) < 1e-9
    assert got[3] == 0.0


def test_header_parsed_dimensions_real_files(spark):
    """Width/height parsed from REAL file header bytes — the exact
    byte layouts a PNG/GIF/BMP encoder emits (PNG IHDR u32 BE, GIF
    logical screen u16 LE, BMP BITMAPINFOHEADER u32 LE). These are
    handcrafted spec-true prefixes, not library output (no imaging
    libs in this container), byte-for-byte what `file`/PIL would read
    dimensions from."""
    import struct

    from goe_spark.multimodal.media import image_height, image_width

    def png(w, h):
        return (
            b"\x89PNG\r\n\x1a\n"
            + struct.pack(">I", 13) + b"IHDR"
            + struct.pack(">II", w, h)
            + b"\x08\x06\x00\x00\x00" + b"fakecrc_and_body"
        )

    def gif(w, h):
        return b"GIF89a" + struct.pack("<HH", w, h) + b"\xf7\x00\x00body"

    def bmp(w, h):
        return (
            b"BM" + struct.pack("<I", 0) + b"\x00\x00\x00\x00"
            + struct.pack("<I", 54) + struct.pack("<I", 40)
            + struct.pack("<II", w, h) + b"\x01\x00\x18\x00rest"
        )

    payloads = [
        (1, png(1, 1)),
        (2, png(1920, 1080)),
        (3, png(305419896, 2)),      # width > u16: BE u32 path proven
        (4, gif(2, 3)),
        (5, gif(65535, 1)),          # u16 max: LE byte swap proven
        (6, bmp(4, 2)),
        (7, bmp(3840, 2160)),
        (8, b"not an image at all"),
        (9, b""),
    ]
    df = spark.createDataFrame(payloads, "media_id long, content binary")
    got = {
        r.media_id: (r.w, r.h)
        for r in df.select(
            "media_id",
            image_width(df.content).alias("w"),
            image_height(df.content).alias("h"),
        ).collect()
    }
    assert got == {
        1: (1, 1),
        2: (1920, 1080),
        3: (305419896, 2),
        4: (2, 3),
        5: (65535, 1),
        6: (4, 2),
        7: (3840, 2160),
        8: (None, None),
        9: (None, None),
    }


def test_header_parse_sql_matches_spark(spark):
    """The DuckDB rendering of the same parse must agree value-for-
    value on the same real header bytes."""
    import struct

    import duckdb

    from goe_spark.multimodal.media import (
        image_height_sql,
        image_width_sql,
    )

    rows = [
        ("89504E470D0A1A0A" + "0000000D49484452"
         + struct.pack(">II", 640, 480).hex().upper() + "08"),
        ("474946383961" + struct.pack("<HH", 320, 200).hex().upper() + "F7"),
        ("424D" + "00000000" * 2 + "36000000" + "28000000"
         + struct.pack("<II", 800, 600).hex().upper()),
        ("DEADBEEF"),
    ]
    con = duckdb.connect()
    got = con.execute(
        f"SELECT {image_width_sql('content')} AS w, "
        f"{image_height_sql('content')} AS h "
        "FROM (SELECT from_hex(h) AS content FROM "
        "(SELECT unnest(?) AS h))",
        [rows],
    ).fetchall()
    assert got == [(640, 480), (320, 200), (800, 600), (None, None)]


def test_wav_header_parse_real_bytes(spark):
    """A genuine canonical PCM WAV header (built with struct, exactly
    the bytes `wave`-module writers emit for 44.1 kHz stereo 16-bit)
    must parse to its true field values — and a truncated/garbage
    payload must fail the is_wav gate."""
    import struct

    from goe_spark.multimodal.media import (
        is_wav,
        wav_bits_per_sample,
        wav_channels,
        wav_data_size,
        wav_sample_rate,
    )

    n_frames, ch, rate, bits = 441, 2, 44100, 16
    bpf = ch * bits // 8
    dsize = n_frames * bpf
    header = (
        b"RIFF" + struct.pack("<I", 36 + dsize) + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, ch, rate, rate * bpf, bpf, bits)
        + b"data" + struct.pack("<I", dsize)
    )
    df = spark.createDataFrame(
        [(1, header + b"\x00" * 8), (2, b"RIFFjunk"), (3, b"\x00\x01")],
        "media_id int, content binary",
    )
    rows = {
        r.media_id: r
        for r in df.select(
            "media_id",
            is_wav(df.content).alias("ok"),
            wav_channels(df.content).alias("ch"),
            wav_sample_rate(df.content).alias("rate"),
            wav_bits_per_sample(df.content).alias("bits"),
            wav_data_size(df.content).alias("dsize"),
        ).collect()
    }
    assert rows[1].ok and not rows[2].ok and not rows[3].ok
    assert (rows[1].ch, rows[1].rate, rows[1].bits, rows[1].dsize) == (
        ch, rate, bits, dsize,
    )


def test_wav_parse_sql_matches_spark():
    """DuckDB rendering of the WAV parse agrees on the same bytes."""
    import struct

    import duckdb

    from goe_spark.multimodal.media import (
        is_wav_sql,
        wav_channels_sql,
        wav_sample_rate_sql,
    )

    header = (
        b"RIFF" + struct.pack("<I", 36 + 800) + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 8000, 1, 8)
        + b"data" + struct.pack("<I", 800)
    )
    con = duckdb.connect()
    got = con.execute(
        f"SELECT {is_wav_sql('content')} AS ok, "
        f"{wav_channels_sql('content')} AS ch, "
        f"{wav_sample_rate_sql('content')} AS rate "
        "FROM (SELECT from_hex(?) AS content)",
        [header.hex().upper()],
    ).fetchone()
    assert got == (True, 1, 8000)


def _jfif(h, w, *, sof=b"\xc0", extra_segments=0, sos_first=False):
    """Spec-true JPEG bytes: SOI, APP0(JFIF), optional extra COM
    segments, then SOF0/SOF2 with height BEFORE width — exactly what
    a camera/libjpeg emits up to the frame header."""
    import struct

    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HH", 1, 1) + b"\x00\x00"
    out = b"\xff\xd8" + app0
    for i in range(extra_segments):
        payload = bytes([i]) * 7
        out += b"\xff\xfe" + struct.pack(">H", 2 + len(payload)) + payload
    if sos_first:
        out += b"\xff\xda" + struct.pack(">H", 5) + b"\x01\x02\x03"
    out += (
        b"\xff" + sof + struct.pack(">H", 17) + b"\x08"
        + struct.pack(">HH", h, w)
        + b"\x03\x01\x11\x00\x02\x11\x01\x03\x11\x01"
    )
    return out + b"entropy-coded-body-bytes"


def test_jpeg_sof_walk_real_bytes(spark):
    """Round-9 verdict item 5: JPEG dimensions via the SOF0/SOF2
    marker walk — pure byte arithmetic, no codec. Pins: baseline and
    progressive SOFs, a deep multi-segment walk, SOS-before-SOF and
    truncation return NULL (never a wrong offset)."""
    from goe_spark.multimodal.media import (
        JPEG_WALK_CAP,
        image_height,
        image_width,
    )

    payloads = [
        (1, _jfif(480, 640)),
        (2, _jfif(1080, 1920, sof=b"\xc2")),          # progressive
        (3, _jfif(7, 9, extra_segments=10)),          # deep walk
        (4, _jfif(1, 1, sos_first=True)),             # SOS first -> NULL
        (5, _jfif(2, 2, extra_segments=JPEG_WALK_CAP)),  # cap -> NULL
        (6, b"\xff\xd8\xff\xe0\x00"),                 # truncated
        (7, b"\xff\xd8\xff\xc0\x00\x11\x08\x00\x05\x00\x06rest"),  # SOF immediately
    ]
    df = spark.createDataFrame(payloads, "media_id long, content binary")
    got = {
        r.media_id: (r.w, r.h)
        for r in df.select(
            "media_id",
            image_width(df.content).alias("w"),
            image_height(df.content).alias("h"),
        ).collect()
    }
    assert got == {
        1: (640, 480),
        2: (1920, 1080),
        3: (9, 7),
        4: (None, None),
        5: (None, None),
        6: (None, None),
        7: (6, 5),
    }


def test_jpeg_walk_sql_matches_spark():
    """The DuckDB recursive-CTE walk lands on the same SOF offsets
    and dimensions as the Spark fold, byte for byte."""
    import duckdb

    from goe_spark.multimodal.media import jpeg_walk_sql_ctes

    payloads = {
        1: _jfif(480, 640),
        2: _jfif(1080, 1920, sof=b"\xc2"),
        3: _jfif(7, 9, extra_segments=10),
        4: _jfif(1, 1, sos_first=True),
    }
    values = ", ".join(
        f"({k}, '{v.hex().upper()}')" for k, v in payloads.items()
    )
    q = f"""
WITH RECURSIVE hx AS (
  SELECT * FROM (VALUES {values}) t(media_id, h)
), {jpeg_walk_sql_ctes('hx')}
SELECT media_id,
  cast(('0x' || substr(h, sof_pos + 14, 4)) AS int) AS w,
  cast(('0x' || substr(h, sof_pos + 10, 4)) AS int) AS hh
FROM hx LEFT JOIN jpeg_sof USING (media_id) ORDER BY media_id
"""
    got = duckdb.sql(q).fetchall()
    assert got == [
        (1, 640, 480),
        (2, 1920, 1080),
        (3, 9, 7),
        (4, None, None),
    ]


def test_mp3_frame_parse_real_bytes(spark):
    """MP3 frame-header fields parsed from spec-true bytes: bare
    streams, ID3v2-tagged streams (syncsafe size walk), free-format
    bitrate -> NULL, tag-without-frame and garbage -> no frame."""
    from pyspark.sql import functions as F

    from goe_spark.multimodal.media import (
        mp3_bitrate_kbps,
        mp3_channel_mode,
        mp3_frame_pos,
        mp3_sample_rate,
    )

    def mk(id3_size=None, bitrate_idx=9, sr_idx=0, mode=3):
        hdr = bytes(
            [0xFF, 0xFB, (bitrate_idx << 4) | (sr_idx << 2), mode << 6]
        ) + b"framedata"
        if id3_size is None:
            return hdr
        ss = bytes(
            [
                (id3_size >> 21) & 0x7F,
                (id3_size >> 14) & 0x7F,
                (id3_size >> 7) & 0x7F,
                id3_size & 0x7F,
            ]
        )
        return b"ID3" + bytes([4, 0, 0]) + ss + b"x" * id3_size + hdr

    payloads = [
        (1, mk()),                                             # 128/44100/mono
        (2, mk(id3_size=200, bitrate_idx=14, sr_idx=1, mode=0)),
        (3, mk(id3_size=300, bitrate_idx=0, sr_idx=2, mode=1)),  # free -> NULL
        (4, mk(id3_size=20000, bitrate_idx=5, sr_idx=0, mode=2)),  # 2-byte syncsafe
        (5, b"ID3" + bytes([4, 0, 0, 0, 0, 0, 10]) + b"0123456789nothdr"),
        (6, b"garbage"),
    ]
    df = spark.createDataFrame(payloads, "media_id long, content binary")
    c = df.content
    got = {
        r.media_id: (r.pos, r.kbps, r.sr, r.mode)
        for r in df.select(
            "media_id",
            mp3_frame_pos(c).alias("pos"),
            mp3_bitrate_kbps(c).alias("kbps"),
            mp3_sample_rate(c).alias("sr"),
            mp3_channel_mode(c).alias("mode"),
        ).collect()
    }
    assert got == {
        1: (1, 128, 44100, "mono"),
        2: (421, 320, 48000, "stereo"),
        3: (621, None, 32000, "joint"),
        4: (40021, 64, 44100, "dual"),
        5: (None, None, None, None),
        6: (None, None, None, None),
    }


def _mp4_box(typ: bytes, payload: bytes) -> bytes:
    import struct

    return struct.pack(">I", 8 + len(payload)) + typ + payload


def _mp4_fixture_cases():
    """Handcrafted struct-packed ISO-BMFF payloads pinning the box
    walk: faststart + natural mux order, v0/v1 headers, free-box
    padding, mvhd after trak, truncation, non-BMFF."""
    import struct

    matrix = struct.pack(
        ">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000
    )

    def mvhd(version, ts, dur):
        if version == 0:
            p = bytes([0, 0, 0, 0]) + struct.pack(">IIII", 0, 0, ts, dur)
        else:
            p = (
                bytes([1, 0, 0, 0])
                + struct.pack(">QQ", 0, 0)
                + struct.pack(">I", ts)
                + struct.pack(">Q", dur)
            )
        return _mp4_box(
            b"mvhd",
            p + struct.pack(">I", 0x10000) + struct.pack(">H", 0x100)
            + b"\0" * 10 + matrix + b"\0" * 24 + struct.pack(">I", 2),
        )

    def tkhd(version, dur, w_fixed, h_fixed):
        if version == 0:
            p = bytes([0, 0, 0, 3]) + struct.pack(">IIIII", 0, 0, 1, 0, dur)
        else:
            p = (
                bytes([1, 0, 0, 3])
                + struct.pack(">QQII", 0, 0, 1, 0)
                + struct.pack(">Q", dur)
            )
        return _mp4_box(
            b"tkhd",
            p + b"\0" * 8 + struct.pack(">HHHH", 0, 0, 0x100, 0) + matrix
            + struct.pack(">II", w_fixed, h_fixed),
        )

    import struct as _s

    ftyp = _mp4_box(b"ftyp", b"isom" + b"\0\0\0\0")
    mdat = _mp4_box(b"mdat", b"textpayload!")
    free = _mp4_box(b"free", b"\0" * 20)
    cases = []
    moov = _mp4_box(
        b"moov",
        mvhd(0, 600, 600 * 12 + 5)
        + _mp4_box(b"trak", tkhd(0, 600 * 12, (640 << 16) + 0x8000, 360 << 16)),
    )
    cases.append((1, ftyp + moov + mdat, (600, 7205, 0, 640, 360)))
    moov2 = _mp4_box(
        b"moov",
        free
        + mvhd(1, 90000, 90000 * 7 + 123)
        + free
        + _mp4_box(b"trak", tkhd(1, 90000 * 7, 1920 << 16, 1080 << 16)),
    )
    cases.append(
        (2, ftyp + free + mdat + moov2, (90000, 630123, 1, 1920, 1080))
    )
    moov3 = _mp4_box(
        b"moov",
        _mp4_box(b"trak", free + tkhd(0, 100, 320 << 16, 240 << 16))
        + mvhd(0, 1000, 4567),
    )
    cases.append((3, ftyp + moov3 + mdat, (1000, 4567, 0, 320, 240)))
    cases.append(
        (4, ftyp + _s.pack(">I", 9999) + b"moov" + b"\0" * 8,
         (None,) * 5)
    )
    cases.append((5, b"RIFFxxxxWAVEfmt " + b"\0" * 32, (None,) * 5))
    return cases


def test_mp4_box_walk_real_bytes(spark):
    from pyspark.sql import functions as F

    from goe_spark.multimodal.media import (
        _hex_of,
        mp4_duration_units,
        mp4_mvhd_version,
        mp4_timescale,
        mp4_track_height,
        mp4_track_width,
        mp4_walk,
    )

    cases = _mp4_fixture_cases()
    df = spark.createDataFrame(
        [(i, bytearray(b)) for i, b, _ in cases],
        "media_id long, content binary",
    )
    loc = df.select(
        "media_id", "content", F.inline(F.array(mp4_walk(_hex_of(F.col("content")))))
    )
    h = _hex_of(F.col("content"))
    got = {
        r.media_id: (r.ts, r.du, r.v, r.w, r.hh)
        for r in loc.select(
            "media_id",
            mp4_timescale(h, F.col("mvhd_pos")).alias("ts"),
            mp4_duration_units(h, F.col("mvhd_pos")).alias("du"),
            mp4_mvhd_version(h, F.col("mvhd_pos")).alias("v"),
            mp4_track_width(h, F.col("tkhd_pos")).alias("w"),
            mp4_track_height(h, F.col("tkhd_pos")).alias("hh"),
        ).collect()
    }
    assert got == {i: want for i, _, want in cases}


def test_mp4_walk_sql_matches_spark():
    """DuckDB recursive-CTE walk twin returns the identical parses on
    the handcrafted payloads (same dead/truncation conditions)."""
    import duckdb

    from goe_spark.multimodal.media import (
        mp4_duration_units_sql,
        mp4_mvhd_version_sql,
        mp4_timescale_sql,
        mp4_track_height_sql,
        mp4_track_width_sql,
        mp4_walk_sql_ctes,
    )

    cases = _mp4_fixture_cases()
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE media (media_id BIGINT, content BLOB)"
    )
    for i, b, _ in cases:
        con.execute("INSERT INTO media VALUES (?, ?)", [i, b])
    sql = f"""
WITH RECURSIVE hexed AS (
  SELECT media_id, upper(hex(content)) AS h FROM media
),
{mp4_walk_sql_ctes('hexed')}
SELECT l.media_id,
       {mp4_timescale_sql('l.h', 'l.mvhd_pos')} AS ts,
       {mp4_duration_units_sql('l.h', 'l.mvhd_pos')} AS du,
       {mp4_mvhd_version_sql('l.h', 'l.mvhd_pos')} AS v,
       {mp4_track_width_sql('l.h', 'l.tkhd_pos')} AS w,
       {mp4_track_height_sql('l.h', 'l.tkhd_pos')} AS hh
FROM mp4_loc l
"""
    got = {r[0]: tuple(r[1:]) for r in con.execute(sql).fetchall()}
    for i, _, want in cases:
        # non-BMFF rows may be absent from the walk entirely — both
        # mean "no parse"
        assert got.get(i, (None,) * 5) == want, (i, got.get(i))


def test_mp4_per_level_cap_matches_duckdb(spark):
    """A moov with the first trak early but mvhd past MP4_WALK_CAP
    siblings: both engines find tkhd, neither finds mvhd — the Spark
    fold's per-level `it` counter matches the CTE's per-level cap."""
    import struct

    import duckdb
    from pyspark.sql import functions as F

    from goe_spark.multimodal.media import (
        MP4_WALK_CAP,
        _hex_of,
        mp4_timescale,
        mp4_track_width,
        mp4_walk,
        mp4_walk_sql_ctes,
    )

    ftyp = _mp4_box(b"ftyp", b"isom" + b"\0\0\0\0")
    free = _mp4_box(b"free", b"\0" * 4)
    # moov: trak first, then MP4_WALK_CAP+2 free boxes, then mvhd
    matrix = struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
    tkhd = _mp4_box(
        b"tkhd",
        bytes([0, 0, 0, 3]) + struct.pack(">IIIII", 0, 0, 1, 0, 100)
        + b"\0" * 8 + struct.pack(">HHHH", 0, 0, 0x100, 0) + matrix
        + struct.pack(">II", 320 << 16, 240 << 16),
    )
    mvhd = _mp4_box(
        b"mvhd",
        bytes([0, 0, 0, 0]) + struct.pack(">IIII", 0, 0, 600, 1200)
        + struct.pack(">I", 0x10000) + struct.pack(">H", 0x100)
        + b"\0" * 10 + matrix + b"\0" * 24 + struct.pack(">I", 2),
    )
    moov = _mp4_box(
        b"moov",
        _mp4_box(b"trak", tkhd)
        + free * (MP4_WALK_CAP + 2)
        + mvhd,
    )
    payload = ftyp + moov

    df = spark.createDataFrame(
        [(1, bytearray(payload))], "media_id long, content binary"
    )
    loc = df.select(
        "media_id", "content",
        F.inline(F.array(mp4_walk(_hex_of(F.col("content"))))),
    )
    h = _hex_of(F.col("content"))
    row = loc.select(
        mp4_timescale(h, F.col("mvhd_pos")).alias("ts"),
        mp4_track_width(h, F.col("tkhd_pos")).alias("w"),
    ).first()
    assert row.w == 320 and row.ts is None

    con = duckdb.connect()
    con.execute("CREATE TABLE media (media_id BIGINT, content BLOB)")
    con.execute("INSERT INTO media VALUES (1, ?)", [payload])
    got = con.execute(f"""
WITH RECURSIVE hexed AS (
  SELECT media_id, upper(hex(content)) AS h FROM media
),
{mp4_walk_sql_ctes('hexed')}
SELECT mvhd_pos IS NULL, tkhd_pos IS NOT NULL FROM mp4_loc
""").fetchone()
    assert got == (True, True)


def test_flac_streaminfo_real_bytes(spark):
    """Handcrafted spec-true FLAC header: 44.1 kHz stereo 16-bit,
    441000 total samples (10 s). The packed-bitfield parse must
    recover every field; a non-FLAC payload must be rejected."""
    from goe_spark.multimodal.media import (
        flac_bits_per_sample,
        flac_channels,
        flac_sample_rate,
        flac_total_samples,
        is_flac,
    )

    # fLaC | last+STREAMINFO | len 34 | blocksizes | framesizes |
    # rate 0x0AC44 | nib (ch-1)<<1|bpsHi = 2 | bps low nib = F |
    # samples 0x00006BAA8 | 16-byte md5 of zeros
    hex_header = (
        "664C6143" + "80" + "000022" + "10001000" + "000000000000"
        + "0AC44" + "2" + "F" + "00006BAA8" + "0" * 32
    )
    payload = bytes.fromhex(hex_header) + b"audio-body"
    df = spark.createDataFrame(
        [(1, bytearray(payload)), (2, bytearray(b"not a flac file"))],
        "media_id long, content binary",
    )
    c = F.col("content")
    rows = {
        r.media_id: r
        for r in df.select(
            "media_id",
            is_flac(c).alias("ok"),
            flac_sample_rate(c).alias("rate"),
            flac_channels(c).alias("ch"),
            flac_bits_per_sample(c).alias("bps"),
            flac_total_samples(c).alias("samples"),
        ).collect()
    }
    assert rows[1].ok and not rows[2].ok
    assert rows[1].rate == 44100
    assert rows[1].ch == 2
    assert rows[1].bps == 16
    assert rows[1].samples == 441000


def test_tiff_ifd_walk_real_bytes(spark):
    """Handcrafted TIFFs in BOTH byte orders: the parse must follow
    the IFD offset, scan entries and read the LONG-typed width/height
    with the right endianness; a SHORT-typed width parses NULL
    (declared out of scope) and non-TIFF bytes are rejected."""
    import duckdb

    from goe_spark.multimodal.media import (
        tiff_endian,
        tiff_height,
        tiff_tag_value_sql,
        tiff_width,
    )

    le = bytes.fromhex(
        "49492A00" + "08000000"          # II, IFD at offset 8
        + "0200"                          # 2 entries
        + "0001" + "0400" + "01000000" + "80020000"   # 256 LONG 640
        + "0101" + "0400" + "01000000" + "E0010000"   # 257 LONG 480
        + "00000000"
    )
    be = bytes.fromhex(
        "4D4D002A" + "00000010"          # MM, IFD at offset 16
        + "00" * 8                        # junk the offset must skip
        + "0002"
        + "0100" + "0004" + "00000001" + "00000320"   # 256 LONG 800
        + "0101" + "0004" + "00000001" + "00000258"   # 257 LONG 600
        + "00000000"
    )
    short_typed = bytes.fromhex(
        "49492A00" + "08000000" + "0100"
        + "0001" + "0300" + "01000000" + "8002" + "0000"  # 256 SHORT
        + "00000000"
    )
    df = spark.createDataFrame(
        [
            (1, bytearray(le)),
            (2, bytearray(be)),
            (3, bytearray(short_typed)),
            (4, bytearray(b"plain text")),
        ],
        "media_id long, content binary",
    )
    c = F.col("content")
    rows = {
        r.media_id: r
        for r in df.select(
            "media_id",
            tiff_endian(c).alias("e"),
            tiff_width(c).alias("w"),
            tiff_height(c).alias("h"),
        ).collect()
    }
    assert (rows[1].e, rows[1].w, rows[1].h) == ("II", 640, 480)
    assert (rows[2].e, rows[2].w, rows[2].h) == ("MM", 800, 600)
    assert rows[3].e == "II" and rows[3].w is None
    assert rows[4].e is None and rows[4].w is None

    # DuckDB twin agrees byte-for-byte on the same payloads
    con = duckdb.connect()
    con.execute("CREATE TABLE media (media_id BIGINT, content BLOB)")
    for mid, p in [(1, le), (2, be), (3, short_typed)]:
        con.execute("INSERT INTO media VALUES (?, ?)", [mid, p])
    got = con.execute(
        f"SELECT media_id, {tiff_tag_value_sql('content', 256)},"
        f" {tiff_tag_value_sql('content', 257)}"
        " FROM media ORDER BY media_id"
    ).fetchall()
    assert got == [(1, 640, 480), (2, 800, 600), (3, None, None)]
