"""operators.multimodal image-header builders/parser: golden bytes,
marker walking, malformed input, distributed roundtrip."""

import pytest

from geokit_spark.operators.multimodal import (
    _gif_bytes,
    _jpeg_bytes,
    _png_bytes,
    build_image_payload,
    image_meta,
    parse_image_header,
)


@pytest.fixture(scope="module")
def spark():
    from geokit_spark.session import get_spark

    return get_spark("test-imghdr", cores=4, shuffle_partitions=4)


def test_png_bytes_are_standards_valid():
    import struct
    import zlib

    b = _png_bytes(640, 480)
    assert b[:8] == b"\x89PNG\r\n\x1a\n"
    # IHDR chunk: length 13, tag, data, CRC over tag+data
    assert struct.unpack(">I", b[8:12])[0] == 13
    assert b[12:16] == b"IHDR"
    crc = struct.unpack(">I", b[29:33])[0]
    assert crc == (zlib.crc32(b[12:29]) & 0xFFFFFFFF)
    assert parse_image_header(b) == ("png", 640, 480)


def test_jpeg_marker_walk_not_fixed_offset():
    # two different COM paddings shift SOF0; both must parse
    a = _jpeg_bytes(800, 600, pad=5)
    b = _jpeg_bytes(800, 600, pad=27)
    assert len(a) != len(b)
    assert parse_image_header(a) == ("jpeg", 800, 600)
    assert parse_image_header(b) == ("jpeg", 800, 600)
    # the SOF0 marker is NOT at the same offset in both
    assert a.find(b"\xff\xc0") != b.find(b"\xff\xc0")


def test_gif_little_endian_dims():
    assert parse_image_header(_gif_bytes(1, 65535)) == ("gif", 1, 65535)


def test_malformed_inputs_unknown():
    assert parse_image_header(b"") == ("unknown", None, None)
    assert parse_image_header(None) == ("unknown", None, None)
    assert parse_image_header(b"\xff\xd8\x00\x00") == (
        "unknown", None, None,
    )  # broken marker stream
    assert parse_image_header(_png_bytes(9, 9)[:12]) == (
        "unknown", None, None,
    )  # truncated before IHDR data
    # jpeg with zero-length segment must not loop forever
    assert parse_image_header(b"\xff\xd8\xff\xe0\x00\x00rest") == (
        "unknown", None, None,
    )


def test_distributed_roundtrip(spark):
    docs = spark.createDataFrame(
        [(i,) for i in range(60)], "doc_id long"
    )
    out = {r.doc_id: r for r in image_meta(build_image_payload(docs)).collect()}
    assert len(out) == 60
    for d, r in out.items():
        assert r.fmt == ("png", "jpeg", "gif")[d % 3]
        assert r.width == 16 + (d * 13) % 1000
        assert r.height == 16 + (d * 7) % 800


def test_wav_chunk_walk_and_alignment():
    from geokit_spark.operators.multimodal import (
        _wav_bytes,
        parse_wav_header,
    )

    # odd INFO pad exercises the word-alignment advance
    for pad in (4, 5, 18):
        b = _wav_bytes(2, 48000, 24, 999, pad=pad)
        assert parse_wav_header(b) == (2, 48000, 24, 999)
    # fmt offset varies with pad — chunk walking is real
    a = _wav_bytes(1, 8000, 8, 10, pad=4)
    c = _wav_bytes(1, 8000, 8, 10, pad=18)
    assert a.find(b"fmt ") != c.find(b"fmt ")
    # malformed: data size not divisible by block
    import struct

    broken = bytearray(_wav_bytes(2, 8000, 16, 10, pad=4))
    i = bytes(broken).find(b"data")
    broken[i + 4 : i + 8] = struct.pack("<I", 41)  # 41 % 4 != 0
    assert parse_wav_header(bytes(broken)) is None
    assert parse_wav_header(b"RIFF\x04\x00\x00\x00WAVE") is None


def test_audio_roundtrip_distributed(spark):
    from geokit_spark.operators.multimodal import (
        audio_meta,
        audio_params,
        build_audio_payload,
    )

    import numpy as np

    docs = spark.createDataFrame(
        [(i,) for i in range(40)], "doc_id long"
    )
    out = {
        r.doc_id: r
        for r in audio_meta(build_audio_payload(docs)).collect()
    }
    ch, sr, bi, ns = audio_params(np.arange(40))
    for d in range(40):
        r = out[d]
        assert (r.channels, r.sample_rate, r.bits, r.n_samples) == (
            ch[d], sr[d], bi[d], ns[d],
        )
        assert r.duration_ms == int(ns[d]) * 1000 // int(sr[d])


def test_mp4_box_walk():
    from geokit_spark.operators.multimodal import (
        _mp4_bytes,
        parse_mp4_header,
    )

    a = _mp4_bytes(48000, 123456, pad=4)
    b = _mp4_bytes(48000, 123456, pad=20)
    assert parse_mp4_header(a) == (48000, 123456)
    assert parse_mp4_header(b) == (48000, 123456)
    assert a.find(b"moov") != b.find(b"moov")  # box walk is real
    # malformed: truncated, missing ftyp, zero-size box loop guard
    assert parse_mp4_header(a[:10]) is None
    assert parse_mp4_header(b"\x00\x00\x00\x08fre!rest") is None
    broken = bytearray(a)
    i = a.find(b"moov") - 4
    broken[i : i + 4] = b"\x00\x00\x00\x03"  # size < 8
    assert parse_mp4_header(bytes(broken)) is None


def test_video_roundtrip_distributed(spark):
    import numpy as np

    from geokit_spark.operators.multimodal import (
        build_video_payload,
        video_meta,
        video_params,
    )

    docs = spark.createDataFrame(
        [(i,) for i in range(30)], "doc_id long"
    )
    out = {
        r.doc_id: r
        for r in video_meta(build_video_payload(docs)).collect()
    }
    ts, du = video_params(np.arange(30))
    for d in range(30):
        assert (out[d].timescale, out[d].duration) == (ts[d], du[d])
        assert out[d].duration_ms == int(du[d]) * 1000 // int(ts[d])


def test_media_router_dispatch(spark):
    from geokit_spark.operators.multimodal import (
        build_mixed_payload,
        media_meta,
    )

    docs = spark.createDataFrame(
        [(i,) for i in range(36)], "doc_id long"
    )
    out = {
        r.doc_id: r
        for r in media_meta(build_mixed_payload(docs)).collect()
    }
    want_fmt = ["png", "jpeg", "gif", "wav", "mp4", "webp"]
    for d in range(36):
        assert out[d].fmt == want_fmt[d % 6]
        assert out[d].dim1 is not None and out[d].dim2 is not None
    # the three webp slots in range(36) hit all three chunk layouts
    # ((d // 6) % 3 for d = 5, 11, 17, 23, 29, 35 -> 0, 1, 2, ...)
    # and every one reports the same closed-form dims
    from geokit_spark.operators.multimodal import image_dims

    for d in (5, 11, 17, 23, 29, 35):
        w, h = image_dims([d])
        assert (out[d].dim1, out[d].dim2) == (int(w[0]), int(h[0]))


def test_webp_all_three_layouts():
    from geokit_spark.operators.multimodal import _webp_bytes

    for flavor in (0, 1, 2):
        b = _webp_bytes(640, 480, flavor)
        # RIFF size field covers everything after the 8-byte header
        import struct

        assert b[:4] == b"RIFF" and b[8:12] == b"WEBP"
        assert struct.unpack("<I", b[4:8])[0] == len(b) - 8
        assert len(b) % 2 == 0  # word-aligned container
        assert parse_image_header(b) == ("webp", 640, 480)
    # layout-specific signatures actually differ
    assert _webp_bytes(9, 9, 0)[12:16] == b"VP8 "
    assert _webp_bytes(9, 9, 1)[12:16] == b"VP8L"
    assert _webp_bytes(9, 9, 2)[12:16] == b"VP8X"
    # 14-bit packing edge: max dims the VP8 lossy header can carry
    assert parse_image_header(_webp_bytes(16383, 16383, 0)) == (
        "webp", 16383, 16383,
    )
    assert parse_image_header(_webp_bytes(16384, 1, 1)) == (
        "webp", 16384, 1,
    )  # VP8L w-1 fits 14 bits up to 16384


def test_webp_truncation_and_unknown_chunk():
    from geokit_spark.operators.multimodal import _webp_bytes

    b = _webp_bytes(100, 50, 0)
    for cut in (11, 15, 22, 29):
        assert parse_image_header(b[:cut])[0] == "unknown"
    # RIFF/WEBP with an unrecognized first chunk -> unknown, not crash
    weird = b[:12] + b"ALPH" + b[16:]
    assert parse_image_header(weird)[0] == "unknown"
    # VP8 chunk with a corrupt start code -> unknown
    bad = bytearray(b)
    bad[23] = 0x00
    assert parse_image_header(bytes(bad))[0] == "unknown"
