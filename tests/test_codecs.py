"""Audio codec tests: MP3 (ctypes lame) and Ogg/Opus (native C++)."""

import struct

import numpy as np
import pytest


def sine(seconds=0.5, freq=440.0, sr=24000):
    t = np.arange(int(seconds * sr)) / sr
    return (0.5 * np.sin(2 * np.pi * freq * t)).astype(np.float32)


class TestMp3:
    def test_encodes_valid_frames(self):
        from matcha_tpu.utils.mp3_converter import waveform_to_mp3

        data = waveform_to_mp3(sine())
        assert len(data) > 500
        # MPEG audio frame sync: 11 set bits
        assert data[0] == 0xFF and (data[1] & 0xE0) == 0xE0

    def test_smaller_than_pcm(self):
        from matcha_tpu.utils.mp3_converter import waveform_to_mp3

        wav = sine(1.0)
        assert len(waveform_to_mp3(wav)) < 2 * len(wav) * 0.5


def parse_ogg_pages(data: bytes):
    """Minimal Ogg page parser with CRC verification."""
    pages = []
    pos = 0
    while pos < len(data):
        assert data[pos : pos + 4] == b"OggS", f"bad capture at {pos}"
        header_type = data[pos + 5]
        granule = struct.unpack("<q", data[pos + 6 : pos + 14])[0]
        crc_stored = struct.unpack("<I", data[pos + 22 : pos + 26])[0]
        nsegs = data[pos + 26]
        lacing = data[pos + 27 : pos + 27 + nsegs]
        body_len = sum(lacing)
        total = 27 + nsegs + body_len
        page = bytearray(data[pos : pos + total])
        page[22:26] = b"\0\0\0\0"
        # CRC-32 poly 0x04c11db7, no reflection
        crc = 0
        for byte in page:
            crc ^= byte << 24
            for _ in range(8):
                crc = ((crc << 1) ^ 0x04C11DB7) & 0xFFFFFFFF if crc & 0x80000000 else (crc << 1) & 0xFFFFFFFF
        assert crc == crc_stored, "page CRC mismatch"
        pages.append(
            {
                "type": header_type,
                "granule": granule,
                "body": data[pos + 27 + nsegs : pos + total],
            }
        )
        pos += total
    return pages


class TestOpusOgg:
    @pytest.fixture(autouse=True)
    def _need_native(self):
        from matcha_tpu.utils import opus_converter

        if not opus_converter.available():
            pytest.skip("native opus encoder not built")

    def test_structure_and_crcs(self):
        from matcha_tpu.utils.opus_converter import waveform_to_opus_ogg

        data = waveform_to_opus_ogg(sine(1.0))
        pages = parse_ogg_pages(data)
        assert pages[0]["type"] & 2  # BOS
        assert pages[0]["body"].startswith(b"OpusHead")
        assert pages[1]["body"].startswith(b"OpusTags")
        assert pages[-1]["type"] & 4  # EOS
        # ~1 s of audio → final granule ≈ 48000 (+pre-skip)
        assert 47000 < pages[-1]["granule"] < 52000

    def test_compresses(self):
        from matcha_tpu.utils.opus_converter import waveform_to_opus_ogg

        wav = sine(2.0)
        data = waveform_to_opus_ogg(wav)
        assert len(data) < len(wav) * 2 * 0.25  # way below PCM size
