"""Optional-decoder upgrade path (VERDICT r6 #6): prove the
PIL/soundfile branches of ``decode_media`` — and their wiring through
``_decode_header_batches`` — WITHOUT the libs installed, via
deterministic fake modules; plus skip-marked tests that exercise the
real libraries the day the environment gains them.

The fakes run the decode functions as plain Python (no Spark workers —
a monkeypatched module global would not survive the Python-worker
re-import anyway), which is exactly the code the Arrow batch stage
executes per pandas batch.
"""

from __future__ import annotations

import io

import pandas as pd
import pytest

from iot_temp_data_pipeline_spark.operators import multimodal as mm


@pytest.fixture()
def _reset_probes():
    """Snapshot/restore the cached import probes around each test."""
    pil, snd = mm._PIL_IMAGE, mm._SOUNDFILE
    yield
    mm._PIL_IMAGE, mm._SOUNDFILE = pil, snd


class _FakeImage:
    format = "PNG"
    width = 17
    height = 9

    def getbands(self):
        return ("R", "G", "B")

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


class _FakePIL:
    @staticmethod
    def open(fh):
        assert fh.read(4) == b"\x89PNG"
        return _FakeImage()


class _FakeInfo:
    format = "FLAC"
    channels = 2
    samplerate = 44100
    subtype = "PCM_24"
    frames = 1234


class _FakeSoundfile:
    @staticmethod
    def info(fh):
        assert fh.read(4) == b"fLaC"
        return _FakeInfo()


def test_subtype_bit_depth_mapping():
    assert mm._subtype_bit_depth("PCM_16") == 16
    assert mm._subtype_bit_depth("PCM_24") == 24
    assert mm._subtype_bit_depth("PCM_S8") == 8
    assert mm._subtype_bit_depth("FLOAT") == 32
    assert mm._subtype_bit_depth("DOUBLE") == 64
    assert mm._subtype_bit_depth(None) == 16
    assert mm._subtype_bit_depth("VORBIS") == 16
    # codec names with embedded digits that are NOT a sample width
    # (ADVICE r7): GSM610 is a codec revision, G721_32 a bit-rate
    assert mm._subtype_bit_depth("GSM610") == 16
    assert mm._subtype_bit_depth("G721_32") == 4
    assert mm._subtype_bit_depth("ULAW") == 8
    assert mm._subtype_bit_depth("ALAW") == 8
    assert mm._subtype_bit_depth("IMA_ADPCM") == 4
    assert mm._subtype_bit_depth("MS_ADPCM") == 4


def test_image_upgrade_branch_with_fake_pil(_reset_probes):
    mm._PIL_IMAGE = _FakePIL
    decoded = mm.decode_media(b"\x89PNG\r\n\x1a\n....", "image")
    # image decodes are 4-tuples (fmt, w, h, depth) — the arity the
    # batch wiring branches on
    assert decoded == ("png", 17, 9, 24)


def test_audio_upgrade_branch_with_fake_soundfile(_reset_probes):
    mm._SOUNDFILE = _FakeSoundfile
    decoded = mm.decode_media(b"fLaC........", "audio")
    # bit depth derives from info.subtype, not a hard-coded 16
    assert decoded == ("flac", 2, 44100, 24, 1234)


def test_header_batches_route_media_type_and_branch_on_arity(_reset_probes):
    """The pipeline wiring end-to-end (as the Arrow stage runs it):
    media_type reaches decode_media, and the output branch keys on
    tuple arity so a PIL 'png' image lands in the image columns even
    though its container is not 'bmp'."""
    mm._PIL_IMAGE = _FakePIL
    mm._SOUNDFILE = _FakeSoundfile
    pdf = pd.DataFrame(
        {
            "media_id": [0, 1, 2, 3],
            "media_type": ["image", "audio", "", ""],
            "content": [
                b"\x89PNG\r\n\x1a\n....",
                b"fLaC........",
                mm.make_bmp(3, 2),
                mm.make_wav(8000, 16),
            ],
        }
    )
    out = pd.concat(list(mm._decode_header_batches(iter([pdf]))))
    by_id = out.set_index("media_id")
    assert by_id.loc[0, "container"] == "png"
    assert by_id.loc[0, "width"] == 17 and by_id.loc[0, "height"] == 9
    assert pd.isna(by_id.loc[0, "channels"])
    assert by_id.loc[1, "container"] == "flac"
    assert by_id.loc[1, "channels"] == 2 and by_id.loc[1, "bit_depth"] == 24
    assert pd.isna(by_id.loc[1, "width"])
    # stdlib magic-byte codecs keep working with no media_type
    assert by_id.loc[2, "container"] == "bmp"
    assert by_id.loc[3, "container"] == "wav"


def test_header_batches_without_type_column_unchanged(_reset_probes):
    pdf = pd.DataFrame(
        {
            "media_id": [10, 11],
            "content": [mm.make_bmp(4, 4), mm.make_wav(9000, 20)],
        }
    )
    out = pd.concat(list(mm._decode_header_batches(iter([pdf]))))
    assert list(out["container"]) == ["bmp", "wav"]


# ------------------------- real-library branches (skip until present)


def test_real_pil_decode_upgrades():
    pil = pytest.importorskip("PIL.Image")
    buf = io.BytesIO()
    pil.new("RGB", (5, 7)).save(buf, format="PNG")
    mm._PIL_IMAGE = mm._UNPROBED  # force a fresh probe
    try:
        decoded = mm.decode_media(buf.getvalue(), "image")
    finally:
        mm._PIL_IMAGE = mm._UNPROBED
    assert decoded == ("png", 5, 7, 24)


def test_real_soundfile_decode_upgrades():
    sf = pytest.importorskip("soundfile")
    buf = io.BytesIO()
    sf.write(buf, [0.0] * 100, 8000, format="FLAC", subtype="PCM_24")
    mm._SOUNDFILE = mm._UNPROBED
    try:
        decoded = mm.decode_media(buf.getvalue(), "audio")
    finally:
        mm._SOUNDFILE = mm._UNPROBED
    assert decoded[0] == "flac"
    assert decoded[1] == 1 and decoded[2] == 8000
    assert decoded[3] == 24 and decoded[4] == 100
