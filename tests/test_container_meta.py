"""Container-metadata parsers: ISO-BMFF box walk (core/isobmff.py) and
MPEG-audio frame-header walk (core/mpegaudio.py) — encode/parse
round-trips over version/layout matrices, defensive guards, and the
container_metadata operator's unified row shape.

Reference parity: the reference's media handling is extension-predicate
plus library decode (reference docext/core/utils.py:56-70, 13-15); this
engine parses the real container bytes itself — the metadata layer a
100 TB triage pass needs before any codec runs.
"""
from __future__ import annotations

import random

import pytest

from docext_spark.core import isobmff, mpegaudio


def test_mp4_roundtrip_matrix():
    """Both mvhd/tkhd/mdhd layouts (32-bit v0, 64-bit v1), 1-3 tracks,
    video/audio handlers, three sample-entry fourccs, 16.16 dims."""
    for i in range(40):
        ts = 600 + 100 * (i % 5)
        dur = 1000 + i * 777
        tracks = [dict(track_id=k + 1,
                       handler="vide" if k % 2 == 0 else "soun",
                       codec=("avc1", "mp4a", "hvc1")[k % 3],
                       width=(320 + 16 * k) if k % 2 == 0 else 0,
                       height=(240 + 16 * k) if k % 2 == 0 else 0,
                       timescale=1000 + k, duration=dur * (k + 1))
                  for k in range(1 + i % 3)]
        m = isobmff.parse_mp4(isobmff.encode_mp4_meta(
            "isom", ts, dur, tracks, version=i % 2))
        assert m["timescale"] == ts
        assert m["duration_ms"] == dur * 1000 // ts
        for t, exp in zip(m["tracks"], tracks):
            assert t["track_id"] == exp["track_id"]
            assert t["handler"] == exp["handler"]
            assert t["codec"] == exp["codec"]
            assert (t["width"], t["height"]) == (exp["width"],
                                                 exp["height"])
            assert t["duration_ms"] == \
                exp["duration"] * 1000 // exp["timescale"]


def test_mp4_defensive():
    """Truncation, bit flips, a zero movie timescale, and a crafted
    infinite-nesting box are all rejected without raising."""
    good = isobmff.encode_mp4_meta(
        "mp42", 1000, 5000, [dict(track_id=1, handler="vide",
                                  codec="avc1", width=64, height=48,
                                  timescale=30, duration=150)])
    assert isobmff.parse_mp4(good) is not None
    for cut in range(0, len(good), 7):
        r = isobmff.parse_mp4(good[:cut])
        assert r is None or isinstance(r, dict)
    rng = random.Random(11)
    for _ in range(150):
        b = bytearray(good)
        b[rng.randrange(len(b))] ^= 0xFF
        r = isobmff.parse_mp4(bytes(b))
        assert r is None or isinstance(r, dict)
    # size==0 (to-end) box claiming to be moov with garbage: bounded walk
    bomb = b"\x00\x00\x00\x00moov" + b"\x00\x00\x00\x08trak" * 4000
    assert isobmff.parse_mp4(bomb) is None


def test_mp3_roundtrip_matrix():
    rng = random.Random(5)
    for version in ("1", "2", "2.5"):
        for layer in (1, 2, 3):
            for rate_idx in (0, 1, 2):
                bidx = [1 + rng.randrange(14)
                        for _ in range(1 + rng.randrange(6))]
                m = mpegaudio.parse_mp3(mpegaudio.encode_mp3_frames(
                    version, layer, rate_idx, bidx,
                    channels=1 + rng.randrange(2)))
                assert m["n_frames"] == len(bidx)
                assert m["version"] == version and m["layer"] == layer
                assert m["vbr"] == (len(set(bidx)) > 1)


def test_mp3_duration_and_tables():
    """MPEG1 Layer III at 44.1 kHz: 1152 samples/frame, index 9 =
    128 kbps; MPEG2 Layer III: 576 samples/frame."""
    m = mpegaudio.parse_mp3(mpegaudio.encode_mp3_frames("1", 3, 0,
                                                        [9] * 10))
    assert m["duration_ms"] == 1152 * 10 * 1000 // 44100
    assert m["bitrate_kbps"] == 128 and m["sample_rate"] == 44100
    m = mpegaudio.parse_mp3(mpegaudio.encode_mp3_frames("2", 3, 0,
                                                        [9] * 10))
    assert m["duration_ms"] == 576 * 10 * 1000 // 22050


def test_mp3_id3_handling():
    p = mpegaudio.encode_mp3_frames("1", 3, 1, [5, 6],
                                    id3v2=b"y" * 200, id3v1=True)
    m = mpegaudio.parse_mp3(p)
    assert m["n_frames"] == 2 and m["sample_rate"] == 48000
    # non-syncsafe ID3v2 size byte: corrupt
    b = bytearray(p)
    b[6] |= 0x80
    assert mpegaudio.parse_mp3(bytes(b)) is None


def test_mp3_defensive():
    rng = random.Random(7)
    good = mpegaudio.encode_mp3_frames("1", 2, 2, [3, 4, 5])
    for cut in range(0, len(good), 7):
        r = mpegaudio.parse_mp3(good[:cut])
        assert r is None or isinstance(r, dict)
    for _ in range(150):
        b = bytearray(good)
        b[rng.randrange(len(b))] ^= 0xFF
        r = mpegaudio.parse_mp3(bytes(b))
        assert r is None or isinstance(r, dict)
    # mixed version mid-stream rejects
    mixed = (mpegaudio.encode_mp3_frames("1", 3, 0, [9])
             + mpegaudio.encode_mp3_frames("2", 3, 0, [9]))
    assert mpegaudio.parse_mp3(mixed) is None


def test_container_metadata_operator(spark):
    import pandas as pd
    from docext_spark.operators.multimodal import container_metadata
    rows = [
        (0, isobmff.encode_mp4_meta(
            "mp42", 1000, 5000,
            [dict(track_id=1, handler="vide", codec="avc1", width=64,
                  height=48, timescale=30, duration=150)])),
        (1, mpegaudio.encode_mp3_frames("1", 3, 0, [9, 10, 9])),
        (2, b"garbage"),
    ]
    media = spark.createDataFrame(
        pd.DataFrame(rows, columns=["media_id", "payload"]),
        "media_id long, payload binary")
    got = {r["media_id"]: r
           for r in container_metadata(media).collect()}
    assert got[0]["container"] == "mp4" and got[0]["codec"] == "avc1"
    assert got[0]["width"] == 64 and got[0]["duration_ms"] == 5000
    assert got[1]["container"] == "mp3" and got[1]["vbr"] is True
    assert got[1]["bitrate_kbps"] == 139        # mean of 128/160/128
    assert got[2]["container"] is None


def test_container_metadata_operator_edge_rows(spark):
    """ADVICE r6 hardening: (a) a non-video/audio Matroska TrackType
    (17=subtitle) must come through as a STRING handler, not crash the
    Arrow conversion; (b) a 64-bit duration exceeding Int32 must null
    out, not crash the Int32 coercion; (c) a parseable container with an
    EMPTY track list must still emit one row with container set."""
    import pandas as pd
    from docext_spark.core import ebml
    from docext_spark.operators.multimodal import container_metadata
    sub_mkv = ebml.encode_matroska_meta(
        "matroska", "mux", 1000.0, 1_000_000,
        [dict(track_id=1, kind=17, codec="S_TEXT/UTF8",
              sample_rate=0, channels=0)])
    big_mp4 = isobmff.encode_mp4_meta(
        "mp42", 1000, 2**40,
        [dict(track_id=1, handler="vide", codec="avc1", width=64,
              height=48, timescale=30, duration=2**40)], version=1)
    empty_mp4 = isobmff.encode_mp4_meta("mp42", 1000, 5000, [])
    media = spark.createDataFrame(
        pd.DataFrame([(0, sub_mkv), (1, big_mp4), (2, empty_mp4)],
                     columns=["media_id", "payload"]),
        "media_id long, payload binary")
    got = {r["media_id"]: r for r in container_metadata(media).collect()}
    assert got[0]["container"] == "mkv" and got[0]["handler"] == "17"
    assert got[1]["container"] == "mp4" and got[1]["duration_ms"] is None
    assert got[2]["container"] == "mp4" and got[2]["track_id"] is None


def test_matroska_roundtrip_matrix():
    from docext_spark.core import ebml
    for i in range(30):
        ts = (500_000, 1_000_000, 2_000_000)[i % 3]
        tracks = []
        for k in range(1 + i % 3):
            if k % 2 == 0:
                tracks.append(dict(track_id=k + 1, kind="video",
                                   codec=("V_VP8", "V_VP9",
                                          "V_AV1")[k % 3],
                                   width=320 + 16 * k,
                                   height=240 + 16 * k))
            else:
                tracks.append(dict(track_id=k + 1, kind="audio",
                                   codec="A_OPUS", sample_rate=48000,
                                   channels=1 + k % 2))
        m = ebml.parse_matroska(ebml.encode_matroska_meta(
            "webm", f"mux/{i}", 1000.0 + i * 333.0, ts, tracks))
        assert m["doctype"] == "webm"
        assert m["duration_ms"] == (1000 + i * 333) * ts // 1_000_000
        for t, exp in zip(m["tracks"], tracks):
            assert t["track_id"] == exp["track_id"]
            assert t["kind"] == exp["kind"] and t["codec"] == exp["codec"]


def test_matroska_defensive():
    from docext_spark.core import ebml
    good = ebml.encode_matroska_meta(
        "webm", "m", 500.0, 1_000_000,
        [dict(track_id=1, kind="video", codec="V_VP9", width=64,
              height=48)])
    assert ebml.parse_matroska(good) is not None
    rng = random.Random(13)
    for cut in range(0, len(good), 5):
        r = ebml.parse_matroska(good[:cut])
        assert r is None or isinstance(r, dict)
    for _ in range(200):
        b = bytearray(good)
        b[rng.randrange(len(b))] ^= 0xFF
        r = ebml.parse_matroska(bytes(b))
        assert r is None or isinstance(r, dict)
    # zero first byte = >8-byte varint: rejected, not a spin
    assert ebml.parse_matroska(b"\x00" * 64) is None


def test_ogg_roundtrip_matrix():
    from docext_spark.core import oggmeta
    for i in range(30):
        codec = "vorbis" if i % 2 else "opus"
        rate = (8000, 44100, 48000)[i % 3]
        dur = 1000 + i * 997
        m = oggmeta.parse_ogg(oggmeta.encode_ogg_meta(
            codec, 1 + i % 2, rate, dur, n_data_pages=1 + i % 4,
            serial=100 + i, preskip=300 + i))
        want_rate = rate if codec == "vorbis" else 48000
        assert m["codec"] == codec and m["channels"] == 1 + i % 2
        assert m["sample_rate"] == want_rate
        assert m["duration_ms"] == dur * 1000 // want_rate
        assert m["n_pages"] == (1 + i % 4) + 2 and m["eos"]


def test_ogg_crc_gate_and_defensive():
    """The per-page RFC 3533 CRC rejects every single-byte corruption;
    truncation and multiplexed serials reject too."""
    from docext_spark.core import oggmeta
    good = oggmeta.encode_ogg_meta("opus", 2, 24000, 48000)
    assert oggmeta.parse_ogg(good) is not None
    rng = random.Random(3)
    for _ in range(250):
        b = bytearray(good)
        b[rng.randrange(len(b))] ^= 0xFF
        assert oggmeta.parse_ogg(bytes(b)) is None
    for cut in range(0, len(good), 5):
        r = oggmeta.parse_ogg(good[:cut])
        assert r is None or isinstance(r, dict)
    # two interleaved serials: multiplexed -> None (fleet territory)
    other = oggmeta.encode_ogg_meta("vorbis", 1, 8000, 100, serial=9)
    assert oggmeta.parse_ogg(good + other) is None
