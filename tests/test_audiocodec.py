"""PCM WAV sample decode (kernel/audiocodec.py).

Roundtrip-by-construction against sources/audiogen.py plus hand-built
variant payloads (stereo, 8-bit, float32, truncated) — same strategy as
tests/test_pngcodec.py."""

import struct

import numpy as np
import pytest

from wpextract_spark.kernel.audiocodec import decode_wav, pcm_stats
from wpextract_spark.sources.audiogen import build_audio, build_wav


def _wav(fmt_tag, channels, rate, bits, data: bytes) -> bytes:
    block_align = channels * bits // 8
    fmt = struct.pack("<HHIIHH", fmt_tag, channels, rate, rate * block_align, block_align, bits)
    riff_size = 4 + (8 + len(fmt)) + (8 + len(data))
    return (
        b"RIFF" + struct.pack("<I", riff_size) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


def test_roundtrip_generator():
    rate, n, payload = build_audio(17)
    decoded = decode_wav(payload)
    assert decoded is not None
    got_rate, channels, samples = decoded
    assert (got_rate, channels, len(samples)) == (rate, 1, n)
    expect = np.array([((i * 257) % 16384) - 8192 for i in range(n)])
    assert np.array_equal(samples, expect)


def test_pcm_stats_match_generator_arithmetic():
    _rate, n, payload = build_audio(3)
    s = np.array([((i * 257) % 16384) - 8192 for i in range(n)], dtype=np.int64)
    assert pcm_stats(payload) == (n, int(s.sum()), int((s * s).sum()), int(np.abs(s).max()))


def test_stereo_int16_interleaved():
    frames = [(100, -200), (300, -400), (500, -600)]
    data = b"".join(struct.pack("<hh", l, r) for l, r in frames)
    decoded = decode_wav(_wav(1, 2, 44100, 16, data))
    assert decoded is not None
    rate, channels, samples = decoded
    assert (rate, channels) == (44100, 2)
    assert samples.tolist() == [100, -200, 300, -400, 500, -600]


def test_8bit_unsigned_rebased():
    data = bytes([0, 128, 255])
    _, _, samples = decode_wav(_wav(1, 1, 8000, 8, data))
    assert samples.tolist() == [-32768, 0, 127 * 256]


def test_float32_pcm():
    data = struct.pack("<3f", 0.5, -0.25, 1.0)
    _, _, samples = decode_wav(_wav(3, 1, 16000, 32, data))
    assert samples.dtype == np.float32
    assert samples.tolist() == [0.5, -0.25, 1.0]
    # pcm_stats scales floats by 2^15 into the integer contract
    assert pcm_stats(_wav(3, 1, 16000, 32, data))[3] == 32768


def test_truncated_data_drops_partial_frame():
    data = struct.pack("<hh", 7, 8) + b"\x01"  # 2 samples + 1 stray byte
    _, _, samples = decode_wav(_wav(1, 1, 8000, 16, data))
    assert samples.tolist() == [7, 8]


@pytest.mark.parametrize(
    "payload",
    [
        b"",
        b"RIFF\x00\x00\x00\x00AVI ",  # foreign RIFF
        b"\x89PNG\r\n\x1a\n" + b"\x00" * 20,  # wrong container
        _wav(2, 1, 8000, 16, b"\x00\x00"),  # ADPCM: unsupported encoding
        _wav(1, 1, 8000, 24, b"\x00" * 6),  # 24-bit: unsupported depth
        build_wav(100, 8000)[:30],  # truncated before data chunk
    ],
)
def test_quarantine_returns_none(payload):
    assert decode_wav(payload) is None
    assert pcm_stats(payload) is None


def test_spark_operator_and_oracle_agree(spark):
    import duckdb

    from wpextract_spark.plans.queries import ORACLE_AUDIO_PCM, q_audio_pcm

    sf_dir = "/root/testdata/sf0.001"
    got = {
        r["media_id"]: (r["n_samples"], r["sum_samples"], r["sum_squares"], r["peak_abs"])
        for r in q_audio_pcm(spark, sf_dir).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    want = {
        row[0]: tuple(row[2:])
        for row in con.execute(ORACLE_AUDIO_PCM).fetchall()
    }
    assert got == want
