"""Real container codec: generated BMP/WAV bytes are spec-conformant
(WAV validated by the stdlib ``wave`` reader — an independent decoder),
and the mapInPandas decode recovers exactly the metadata the oracle
predicts from documents."""

import io
import struct
import wave

from esop_spark.operators import multimodal


def test_wav_bytes_parse_with_stdlib_wave():
    for media_id, text in [(1, b"hello world"), (3, b""), (5, b"x" * 100), (7, b"ab")]:
        payload = multimodal._wav_bytes(text, media_id)
        with wave.open(io.BytesIO(payload)) as w:
            assert w.getnchannels() == (1 if media_id % 4 == 1 else 2)
            assert w.getframerate() == (8000 if media_id % 8 < 4 else 16000)
            assert w.getsampwidth() == 2
            assert w.getnframes() == len(text)


def test_bmp_bytes_header_fields():
    text = b"q" * 100  # w = 100%31+1 = 8, h = (100//31)%31+1 = 4
    payload = multimodal._bmp_bytes(text)
    assert payload[:2] == b"BM"
    file_size, _, _, data_off = struct.unpack_from("<IHHI", payload, 2)
    assert file_size == len(payload) and data_off == 54
    hdr_size, w, h, planes, bpp = struct.unpack_from("<IiiHH", payload, 14)
    assert (hdr_size, w, h, planes, bpp) == (40, 8, 4, 1, 24)
    row_bytes = (w * 3 + 3) // 4 * 4
    assert len(payload) == 54 + row_bytes * h


def test_parse_container_walks_riff_chunks():
    """A LIST chunk between fmt and data must not break the parse (real
    encoders emit them)."""
    base = multimodal._wav_bytes(b"abcd", 2)
    fmt_end = 12 + 8 + 16
    listed = base[:fmt_end] + b"LIST" + struct.pack("<I", 4) + b"INFO" + base[fmt_end:]
    kind, w, h, channels, rate, frames = multimodal._parse_container(listed)
    assert (kind, channels, rate, frames) == ("wav", 2, 8000, 4)


def test_encode_decode_end_to_end(spark):
    docs = spark.createDataFrame(
        [(0, "a" * 40), (1, "b" * 10), (2, ""), (5, "hello")],
        "doc_id long, text string",
    )
    out = {
        r["media_id"]: r
        for r in multimodal.decode_containers(
            multimodal.encode_containers(docs)
        ).collect()
    }
    assert out[0]["container"] == "bmp"
    assert (out[0]["width"], out[0]["height"]) == (40 % 31 + 1, (40 // 31) % 31 + 1)
    assert out[0]["channels"] == 3 and out[0]["sample_rate"] is None
    assert out[0]["n_frames"] == out[0]["width"] * out[0]["height"]
    assert out[2]["container"] == "bmp" and out[2]["width"] == 1
    assert out[1]["container"] == "wav"
    assert (out[1]["channels"], out[1]["sample_rate"], out[1]["n_frames"]) == (1, 8000, 10)
    assert (out[5]["channels"], out[5]["sample_rate"], out[5]["n_frames"]) == (1, 16000, 5)


def test_dhash_identical_and_perturbed_images(spark):
    from esop_spark.operators import multimodal as mm

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            (2, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            (4, "completely different pixels from other words entirely here"),
        ],
        "doc_id long, text string",
    )
    media = mm.encode_containers(docs)
    hashes = {r["media_id"]: r["dhash"] for r in mm.image_dhash(media).collect()}
    assert hashes[0] == hashes[2]          # identical text -> identical image
    assert hashes[0] != hashes[4]


def test_dhash_neardup_pairs_banding(spark):
    from esop_spark.operators import multimodal as mm

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [(0, base), (2, base), (4, "zz yy xx ww vv uu tt ss rr qq")],
        "doc_id long, text string",
    )
    pairs = mm.dhash_neardup_pairs(
        mm.image_dhash(mm.encode_containers(docs)), max_hamming=4
    ).collect()
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs}
    assert got.get((0, 2)) == 0
    assert all(k == (0, 2) for k in got)  # the unrelated image pairs with neither


def test_bmp_gray_rows_roundtrip_dimensions(spark):
    from esop_spark.operators import multimodal as mm

    payload = mm._bmp_bytes(b"some pixel text payload for the bmp")
    w, h, gray = mm._bmp_gray_rows(payload)
    assert len(gray) == h and all(len(r) == w for r in gray)
    assert all(0 <= v <= 255 for r in gray for v in r)


# --- audio fingerprint / near-dup (wave 14) ----------------------------------

def test_audio_sig_skips_bmp(spark):
    from esop_spark.operators import multimodal

    docs = spark.createDataFrame(
        [(0, "bmp doc zero"), (1, "wav doc one")], ["doc_id", "text"]
    )
    media = multimodal.encode_containers(docs)
    out = multimodal.audio_energy_sig(media).collect()
    assert [r["media_id"] for r in out] == [1]  # even ids are BMP
    assert out[0]["audio_sig"] > 0
    assert out[0]["n_frames"] == len("wav doc one")


def test_audio_neardup_finds_identical_clips(spark):
    from esop_spark.operators import multimodal

    # ids 1 and 5: same text -> same channel parity? 1%4==1 mono,
    # 5%4==1 mono, same rate class (1%8<4, 5%8<4) -> identical payloads
    docs = spark.createDataFrame(
        [(1, "same audio text"), (5, "same audio text"), (3, "totally different words here")],
        ["doc_id", "text"],
    )
    media = multimodal.encode_containers(docs)
    sigs = multimodal.audio_energy_sig(media)
    pairs = multimodal.audio_neardup_pairs(sigs, max_l1=0).collect()
    assert [(p["id_a"], p["id_b"], p["l1"]) for p in pairs] == [(1, 5, 0)]


def test_audio_neardup_l1_threshold(spark):
    from esop_spark.operators import multimodal
    from pyspark.sql import Row

    # hand-built signatures: a/b differ by 16 in one byte (share 7 bytes);
    # c differs everywhere by a lot (no shared byte -> not even a candidate)
    sigs = spark.createDataFrame(
        [
            Row(media_id=1, audio_sig=0x0101010101010101, n_frames=10),
            Row(media_id=2, audio_sig=0x1101010101010101, n_frames=10),
            Row(media_id=3, audio_sig=0x6363636363636363, n_frames=10),
        ]
    )
    out = {(r["id_a"], r["id_b"]): r["l1"]
           for r in multimodal.audio_neardup_pairs(sigs, max_l1=32).collect()}
    assert out == {(1, 2): 16}


def test_audio_neardup_hot_bucket_star_cap(spark):
    from esop_spark.operators import multimodal
    from pyspark.sql import Row

    # 100 identical signatures: uncapped banding would emit C(100,2)=4950
    # pairs; the star cap (max_bucket=10) bounds candidates to the anchor
    # star: 99 pairs, all with l1=0.
    sigs = spark.createDataFrame(
        [Row(media_id=i, audio_sig=0x0101010101010101, n_frames=5) for i in range(100)]
    )
    out = multimodal.audio_neardup_pairs(sigs, max_l1=0, max_bucket=10).collect()
    assert len(out) == 99
    assert all(r["id_a"] == 0 and r["l1"] == 0 for r in out)
