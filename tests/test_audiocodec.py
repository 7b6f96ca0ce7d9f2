"""Compressed-audio codecs (datapipe/audiocodec.py): G.711 u-law /
A-law (byte-exact vs the canonical Sun g711.c quantization, here
cross-checked against the stdlib audioop implementation of the same
tables) and IMA / MS ADPCM block codecs inside RIFF/WAVE."""

import numpy as np
import pytest

from lucene_solr_1_spark.datapipe.audiocodec import (
    ALAW_DECODE, MULAW_DECODE, alaw_decode, alaw_encode,
    encode_wav_compressed, ima_adpcm_decode, ima_adpcm_encode,
    ms_adpcm_decode, ms_adpcm_encode, mulaw_decode, mulaw_encode)
from lucene_solr_1_spark.datapipe.mediacodec import decode_wav

audioop = pytest.importorskip("audioop")


def _snr(a: np.ndarray, b: np.ndarray) -> float:
    n = min(len(a), len(b))
    a, b = np.asarray(a, np.float64)[:n], np.asarray(b, np.float64)[:n]
    return 10 * np.log10(np.sum(a ** 2) / (np.sum((a - b) ** 2) + 1e-12))


def _sig(n: int = 8000, rate: int = 8000) -> np.ndarray:
    t = np.arange(n) / rate
    return (0.5 * np.sin(2 * np.pi * 440 * t)
            + 0.2 * np.sin(2 * np.pi * 1320 * t)).astype(np.float32)


def test_g711_decode_tables_exact():
    b = bytes(range(256))
    assert np.array_equal(MULAW_DECODE,
                          np.frombuffer(audioop.ulaw2lin(b, 2), "<i2"))
    assert np.array_equal(ALAW_DECODE,
                          np.frombuffer(audioop.alaw2lin(b, 2), "<i2"))
    assert np.array_equal(mulaw_decode(b), MULAW_DECODE)
    assert np.array_equal(alaw_decode(b), ALAW_DECODE)


def test_g711_encode_exact_every_int16():
    x = np.arange(-32768, 32768, dtype=np.int32).astype(np.int16)
    assert mulaw_encode(x) == audioop.lin2ulaw(x.tobytes(), 2)
    assert alaw_encode(x) == audioop.lin2alaw(x.tobytes(), 2)


def test_ima_state_machine_matches_reference_decoder():
    """Decode an audioop-encoded DVI/IMA nibble stream with our state
    machine: must be sample-exact."""
    from lucene_solr_1_spark.datapipe.audiocodec import _ima_step
    pcm = (_sig(4000) * 32767).astype(np.int16)
    enc, _ = audioop.lin2adpcm(pcm.tobytes(), 2, None)
    ref = np.frombuffer(audioop.adpcm2lin(enc, 2, None)[0], "<i2")
    byts = np.frombuffer(enc, np.uint8)
    nibs = np.empty(len(byts) * 2, np.uint8)
    nibs[0::2] = byts >> 4          # audioop packs high nibble first
    nibs[1::2] = byts & 0x0F
    pred = np.zeros(1, np.int32)
    idx = np.zeros(1, np.int32)
    out = np.empty(len(nibs), np.int16)
    for k, nb in enumerate(nibs):
        pred, idx = _ima_step(pred, idx, np.array([nb], np.int32))
        out[k] = pred[0]
    assert np.array_equal(out, ref)


@pytest.mark.parametrize("codec,min_snr", [
    ("mulaw", 35.0), ("alaw", 35.0),
    ("ima_adpcm", 20.0), ("ms_adpcm", 20.0)])
def test_wav_roundtrip_snr(codec, min_snr):
    sig = _sig()
    wav = encode_wav_compressed(sig, 8000, codec)
    dec, rate = decode_wav(wav)
    assert rate == 8000
    assert _snr(sig, dec[:, 0]) >= min_snr


@pytest.mark.parametrize("codec", ["ima_adpcm", "ms_adpcm"])
def test_adpcm_stereo_channels_independent(codec):
    sig = _sig(6000)
    st = np.stack([sig, -sig], axis=1)
    wav = encode_wav_compressed(st, 16000, codec)
    dec, rate = decode_wav(wav)
    assert rate == 16000 and dec.shape[1] == 2
    assert _snr(sig, dec[:, 0]) >= 20.0
    assert _snr(-sig, dec[:, 1]) >= 20.0


@pytest.mark.parametrize("codec", ["ima_adpcm", "ms_adpcm"])
def test_adpcm_silence_exact_zero(codec):
    n = 505 * 3 if codec == "ima_adpcm" else 500 * 3
    wav = encode_wav_compressed(np.zeros(n, np.float32), 8000, codec)
    dec, _ = decode_wav(wav)
    assert dec.shape[0] == n
    assert np.all(dec == 0.0)


def test_ima_block_payload_roundtrip_shapes():
    pcm = (_sig(505 * 4) * 32767).astype(np.int16)[:, None]
    payload, block_align = ima_adpcm_encode(pcm, 1)
    out = ima_adpcm_decode(payload, 1, block_align)
    assert out.shape == (505 * 4, 1)
    # first sample of every block is stored verbatim in the header
    assert np.array_equal(out[0::505, 0][:4], pcm[0::505, 0][:4])


def test_ms_block_payload_roundtrip_shapes():
    pcm = (_sig(500 * 3) * 32767).astype(np.int16)[:, None]
    payload, block_align = ms_adpcm_encode(pcm, 1)
    out = ms_adpcm_decode(payload, 1, block_align)
    assert out.shape == (500 * 3, 1)
    # the two header samples are stored verbatim (oldest first)
    assert out[0, 0] == pcm[0, 0] and out[1, 0] == pcm[1, 0]


def test_decode_wav_dispatches_compressed_formats():
    sig = _sig(1000)
    for codec, tag in (("mulaw", 7), ("alaw", 6),
                       ("ima_adpcm", 0x11), ("ms_adpcm", 2)):
        wav = encode_wav_compressed(sig, 8000, codec)
        # format tag sits at offset 20 in the canonical layout
        assert wav[20] == tag
        dec, rate = decode_wav(wav)
        assert rate == 8000 and dec.shape[0] >= 1000


def test_audio_features_real_path_compressed(spark):
    """multimodal.audio_features flows compressed WAVs through the
    REAL decode (no fake): duration and rate are exact."""
    from lucene_solr_1_spark.datapipe.multimodal import (
        audio_features, make_audio_media)
    media = make_audio_media(spark, n=8)
    got = {r["media_id"]: r for r in
           audio_features(media, n_mfcc=4).collect()}
    assert len(got) == 8
    for i in range(8):
        r = got[i]
        assert r["sample_rate"] == 8000
        kind = i % 4
        if kind in (0, 1):
            ns = 64 + i % 32
        elif kind == 2:
            ns = 505 * (1 + i % 3)
        else:
            ns = 500 * (1 + i % 3)
        assert r["duration_sec"] == pytest.approx(ns / 8000.0, abs=1e-6)
        assert len(r["mfcc"]) == 4
