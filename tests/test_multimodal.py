"""Multimodal binary-column plumbing (decode stubbed per environment)."""

from __future__ import annotations

import pytest

from kg_curation_spark.multimodal import FEATURE_DIM, asset_table, extract_features


def _media(spark):
    docs = spark.createDataFrame(
        [(0, "alpha", "en", "s", 5), (1, "beta", "en", "s", 4), (2, "gamma", "en", "s", 5)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    return asset_table(docs)


def test_binary_schema_and_features(spark):
    media = _media(spark)
    assert dict(media.dtypes)["payload"] == "binary"
    rows = {r["media_id"]: r for r in extract_features(media, fake_decode=True).collect()}
    assert rows["m0"]["kind"] == "image" and rows["m1"]["kind"] == "audio"
    assert rows["m0"]["n_bytes"] == len(b"alpha")
    assert all(len(r["feature"]) == FEATURE_DIM for r in rows.values())


def test_fake_decode_deterministic(spark):
    a = extract_features(_media(spark), fake_decode=True).collect()
    b = extract_features(_media(spark), fake_decode=True).collect()
    assert sorted(map(str, a)) == sorted(map(str, b))


def test_real_decode_raises_for_compressed_formats(spark):
    # the synthetic asset table's fake mimes have no pure-python decoder
    with pytest.raises(Exception, match="NotImplementedError|PIL/ffmpeg"):
        extract_features(_media(spark), fake_decode=False).collect()


def _wav_bytes(rate=8000, freq=440.0, n=800) -> bytes:
    """A real 16-bit mono WAV payload, stdlib-encoded."""
    import io
    import math
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        samples = [
            int(0.5 * 32767 * math.sin(2 * math.pi * freq * i / rate))
            for i in range(n)
        ]
        w.writeframes(struct.pack(f"<{n}h", *samples))
    return buf.getvalue()


def _bmp_bytes(w=4, h=2) -> bytes:
    """A real uncompressed 24-bpp bottom-up BMP: red left half, blue right."""
    stride = ((w * 3 + 3) // 4) * 4
    pixels = bytearray()
    for _y in range(h):  # bottom-up rows
        row = bytearray()
        for x in range(w):
            row += bytes([255, 0, 0] if x >= w // 2 else [0, 0, 255])  # BGR
        row += b"\x00" * (stride - len(row))
        pixels += row
    header = (
        b"BM"
        + (54 + len(pixels)).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little")
        + h.to_bytes(4, "little")
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(pixels).to_bytes(4, "little")
        + b"\x00" * 16
    )
    return bytes(header + pixels)


def test_real_wav_and_bmp_decode_end_to_end(spark):
    """REAL decode (no stub): a stdlib-encoded WAV and a handcrafted BMP
    round-trip through the same Arrow mapInPandas plumbing."""
    ppm = b"P6\n# cmt\n2 2\n255\n" + bytes(
        [255, 255, 255, 0, 0, 0, 0, 0, 0, 255, 255, 255]
    )
    media = spark.createDataFrame(
        [
            ("w1", "audio", "audio/wav", _wav_bytes()),
            ("i1", "image", "image/bmp", _bmp_bytes()),
            ("i2", "image", "image/x-portable-pixmap", ppm),
        ],
        "media_id string, kind string, mime string, payload binary",
    )
    rows = {r["media_id"]: r for r in extract_features(media, fake_decode=False).collect()}
    # WAV: [duration_s, rate_khz, channels, rms, zcr, mean, max, min]
    wf = rows["w1"]["feature"]
    assert abs(wf[0] - 800 / 8000) < 1e-6 and wf[1] == 8.0 and wf[2] == 1.0
    assert abs(wf[3] - 0.5 / 2**0.5) < 0.01  # sine RMS = A/sqrt(2)
    assert 0.3 < wf[7] < 0.51 or wf[7] < -0.3  # swings negative
    # BMP: [w, h, ch, mean_r, mean_g, mean_b, luma_mean, luma_std]
    bf = rows["i1"]["feature"]
    assert bf[:3] == [4.0, 2.0, 3.0]
    assert abs(bf[3] - 0.5) < 1e-6 and bf[4] == 0.0 and abs(bf[5] - 0.5) < 1e-6
    # PPM: 2 white + 2 black pixels -> channel means 0.5
    pf = rows["i2"]["feature"]
    assert pf[:3] == [2.0, 2.0, 3.0] and abs(pf[3] - 0.5) < 1e-6


def test_decode_media_direct():
    """Decoder unit checks without Spark: values, not just shapes."""
    import numpy as np

    from kg_curation_spark.multimodal import decode_media

    bf = decode_media(_bmp_bytes(w=3, h=3), "image/bmp")
    assert bf[0] == 3.0 and bf[1] == 3.0
    wf = decode_media(_wav_bytes(n=160), "audio/wav")
    assert abs(wf[0] - 160 / 8000) < 1e-6
    assert np.all(np.isfinite(wf))
    with pytest.raises(NotImplementedError):
        decode_media(b"\xff\xd8\xff\xe0 fake jpeg", "image/jpeg")


def _png_bytes(px, filters, ctype=2):
    """Encode rows of (r, g, b[, a]) tuples as a real PNG, one filter type
    per row, so the decoder's unfilter paths are all exercised."""
    import struct
    import zlib

    h, w = len(px), len(px[0])
    nch = {2: 3, 6: 4}[ctype]

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    raw = bytearray()
    prev = [0] * (w * nch)
    for y, f in zip(range(h), filters):
        line = [c for p in px[y] for c in p]
        raw.append(f)
        for i in range(w * nch):
            a = line[i - nch] if i >= nch else 0
            b = prev[i]
            c = prev[i - nch] if i >= nch else 0
            if f == 0:
                e = line[i]
            elif f == 1:
                e = (line[i] - a) & 0xFF
            elif f == 2:
                e = (line[i] - b) & 0xFF
            elif f == 3:
                e = (line[i] - ((a + b) >> 1)) & 0xFF
            else:
                pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                e = (line[i] - pr) & 0xFF
            raw.append(e)
        prev = line
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_png_decode_all_filter_types():
    """Real PNG decode: gradient pixels encoded with every filter type
    (None/Sub/Up/Average/Paeth) must reconstruct exactly — compare the
    decoded feature vector to one computed from the ground-truth array."""
    import numpy as np

    from kg_curation_spark.multimodal import _pixel_feature, decode_media

    h, w = 5, 7
    px = [
        [((x * 37 + y * 11) % 256, (x * 5 + 3) % 256, (y * 7 + 90) % 256) for x in range(w)]
        for y in range(h)
    ]
    payload = _png_bytes(px, filters=[0, 1, 2, 3, 4])
    got = decode_media(payload, "image/png")
    want = _pixel_feature(np.array(px, dtype=np.uint8), w, h)
    assert np.allclose(got, want), (got, want)


def test_png_decode_rgba_alpha_dropped():
    import numpy as np

    from kg_curation_spark.multimodal import _pixel_feature, decode_media

    px = [
        [(200, 10, 40, 128), (0, 255, 0, 7)],
        [(15, 15, 15, 255), (255, 255, 255, 0)],
    ]
    payload = _png_bytes(px, filters=[4, 1], ctype=6)
    got = decode_media(payload, "image/png")
    rgb = np.array(px, dtype=np.uint8)[..., :3]
    want = _pixel_feature(rgb, 2, 2)
    assert np.allclose(got, want)


def test_png_interlaced_and_16bit_still_declared_gap():
    import struct
    import zlib

    from kg_curation_spark.multimodal import decode_media

    def mk(depth, interlace):
        ihdr = struct.pack(">IIBBBBB", 1, 1, depth, 2, 0, 0, interlace)
        c = (
            struct.pack(">I", len(ihdr))
            + b"IHDR"
            + ihdr
            + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr))
        )
        idat = zlib.compress(b"\x00\x00\x00\x00")
        c2 = (
            struct.pack(">I", len(idat))
            + b"IDAT"
            + idat
            + struct.pack(">I", zlib.crc32(b"IDAT" + idat))
        )
        return b"\x89PNG\r\n\x1a\n" + c + c2

    with pytest.raises(NotImplementedError):
        decode_media(mk(16, 0), "image/png")
    with pytest.raises(NotImplementedError):
        decode_media(mk(8, 1), "image/png")
