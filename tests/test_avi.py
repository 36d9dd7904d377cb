"""MJPEG-AVI container tests: the emitted RIFF structure is verified
field-by-field with independent struct parsing straight from the AVI
RIFF spec (not the library's walker), frames roundtrip exactly where
JPEG is exact (flat frames at q50), and sampling decodes only the
requested indices."""

import struct

import numpy as np
import pytest

from georip_spark import avi, codecs, jpeg


def flat_frames(values, h=16, w=24):
    return [np.full((h, w), v, np.uint8) for v in values]


class TestContainerSpec:
    def test_riff_structure(self):
        data = avi.avi_encode_mjpeg(flat_frames([0, 64, 128]), fps=10)
        # RIFF header
        assert data[:4] == b"RIFF" and data[8:12] == b"AVI "
        (riff_sz,) = struct.unpack("<I", data[4:8])
        assert riff_sz == len(data) - 8
        # LIST hdrl with avih first
        assert data[12:16] == b"LIST" and data[20:24] == b"hdrl"
        assert data[24:28] == b"avih"
        (avih_sz,) = struct.unpack("<I", data[28:32])
        assert avih_sz == 56
        us, _mb, _pg, flags, total, _init, nstreams, _buf, w, h = struct.unpack(
            "<10I", data[32:72]
        )
        assert us == 100000 and total == 3 and nstreams == 1
        assert (w, h) == (24, 16)
        assert flags & 0x10  # AVIF_HASINDEX

    def test_stream_headers(self):
        data = avi.avi_encode_mjpeg(flat_frames([10, 20]), fps=25)
        i = data.find(b"strh")
        assert i > 0
        (sz,) = struct.unpack("<I", data[i + 4 : i + 8])
        assert sz == 56
        assert data[i + 8 : i + 12] == b"vids"
        assert data[i + 12 : i + 16] == b"MJPG"
        scale, rate = struct.unpack("<II", data[i + 28 : i + 36])
        assert rate // scale == 25
        (length,) = struct.unpack("<I", data[i + 40 : i + 44])
        assert length == 2
        j = data.find(b"strf")
        bi = struct.unpack("<IiiHH4sIiiII", data[j + 8 : j + 48])
        assert bi[0] == 40 and (bi[1], bi[2]) == (24, 16)
        assert bi[3] == 1 and bi[4] == 24 and bi[5] == b"MJPG"

    def test_movi_chunks_are_complete_jpegs(self):
        data = avi.avi_encode_mjpeg(flat_frames([1, 2, 3, 4]), fps=10)
        chunks = list(avi.avi_iter_frame_chunks(data))
        assert [i for i, _ in chunks] == [0, 1, 2, 3]
        for _i, p in chunks:
            assert p[:3] == b"\xff\xd8\xff" and p[-2:] == b"\xff\xd9"
            jpeg.jpeg_decode(p)  # parses standalone

    def test_idx1_points_at_chunks(self):
        data = avi.avi_encode_mjpeg(flat_frames([5, 6, 7]), fps=10)
        i = data.find(b"idx1")
        (sz,) = struct.unpack("<I", data[i + 4 : i + 8])
        n = sz // 16
        assert n == 3
        movi_fourcc = data.find(b"movi")
        for e in range(n):
            ckid, fl, off, ln = struct.unpack(
                "<4sIII", data[i + 8 + 16 * e : i + 24 + 16 * e]
            )
            assert ckid == b"00dc" and fl == 0x10
            # offset is relative to the 'movi' fourcc position
            p = movi_fourcc + off
            assert data[p : p + 4] == b"00dc"
            (csz,) = struct.unpack("<I", data[p + 4 : p + 8])
            assert csz == ln

    def test_even_padding(self):
        # force an odd-length JPEG payload somewhere in 20 tries
        for seed in range(20):
            rng = np.random.default_rng(seed)
            frames = [rng.integers(0, 256, (9, 13), np.uint8) for _ in range(3)]
            data = avi.avi_encode_mjpeg(frames, fps=10, quality=90)
            sizes = [len(p) for _i, p in avi.avi_iter_frame_chunks(data)]
            dec = avi.avi_decode_frames(data)
            assert len(dec) == 3  # walker survives regardless of parity
            if any(s % 2 for s in sizes):
                return  # padding branch exercised and parsed through
        pytest.fail("no odd-length payload in 20 seeds")


class TestRoundtrip:
    def test_flat_frames_exact(self):
        vals = [0, 64, 128, 200, 254]
        data = avi.avi_encode_mjpeg(flat_frames(vals), fps=10, quality=50)
        dec = avi.avi_decode_frames(data)
        assert len(dec) == len(vals)
        for d, v in zip(dec, vals):
            assert np.array_equal(d, np.full((16, 24), v, np.uint8))

    def test_sampling_indices(self):
        vals = [0, 10, 20, 30, 40, 50, 60]
        data = avi.avi_encode_mjpeg(flat_frames(vals), fps=10, quality=50)
        for every in (1, 2, 3):
            dec = avi.avi_decode_frames(data, every=every)
            expect = vals[::every]
            assert [int(d[0, 0]) for d in dec] == expect
        assert len(avi.avi_decode_frames(data, limit=2)) == 2

    def test_rgb_frames(self):
        rng = np.random.default_rng(3)
        frames = [rng.integers(0, 256, (17, 23, 3), np.uint8) for _ in range(2)]
        data = avi.avi_encode_mjpeg(frames, fps=30, quality=90)
        dec = avi.avi_decode_frames(data)
        assert [d.shape for d in dec] == [(17, 23, 3)] * 2

    def test_meta(self):
        data = avi.avi_encode_mjpeg(flat_frames([1] * 5, h=20, w=30), fps=20)
        assert avi.avi_meta(data) == {
            "format": "avi", "width": 30, "height": 20,
            "n_frames": 5, "fps": 20.0, "codec": "MJPG",
        }

    def test_sniff(self):
        data = avi.avi_encode_mjpeg(flat_frames([1]), fps=10)
        assert codecs.sniff(data) == "avi"

    def test_errors(self):
        with pytest.raises(ValueError):
            avi.avi_encode_mjpeg([])
        with pytest.raises(ValueError):
            avi.avi_encode_mjpeg(
                [np.zeros((8, 8), np.uint8), np.zeros((9, 8), np.uint8)]
            )
        with pytest.raises(ValueError):
            avi.avi_meta(b"RIFF\x00\x00\x00\x00WAVE")
        with pytest.raises(ValueError):
            list(avi.avi_iter_frame_chunks(b"not avi"))
