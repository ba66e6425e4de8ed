"""Audio path: WAV round-trip + features recover the synthesis params."""

from __future__ import annotations

import numpy as np
import pytest

from pdf_extraction_api_spark.operators.audioops import (
    _RATE,
    audio_features,
    decode_wav,
    synth_wav,
)


def test_wav_roundtrip_and_kinds():
    for doc_id in range(8):
        kind, blob = synth_wav(doc_id)
        x, rate = decode_wav(blob)
        assert rate == _RATE
        assert len(x) == int(_RATE * (0.1 + (doc_id % 6) * 0.05))
        assert kind == ("tone", "chord", "noise", "silence")[doc_id % 4]


def test_features_recover_tone_frequency():
    # doc_id 0 → tone at 200 Hz; doc_id 4 → tone at 600 Hz
    for doc_id, freq in ((0, 200.0), (4, 600.0)):
        _, blob = synth_wav(doc_id)
        x, rate = decode_wav(blob)
        f = audio_features(x, rate)
        # FFT bin resolution is rate/n ≈ 6-10 Hz on these clip lengths
        assert abs(f["dominant_hz"] - freq) < 15.0, (doc_id, f)
        # pure sine: rms = amp/sqrt(2)
        assert f["rms"] == pytest.approx(0.6 / np.sqrt(2), abs=0.01)


def test_features_silence_and_noise():
    _, blob = synth_wav(3)  # silence
    x, rate = decode_wav(blob)
    f = audio_features(x, rate)
    assert f["rms"] == 0.0 and f["peak"] == 0.0
    _, blob = synth_wav(2)  # noise: high ZCR, broad spectrum
    x, rate = decode_wav(blob)
    fn = audio_features(x, rate)
    assert fn["zcr"] > 0.3
    assert fn["spectral_centroid_hz"] > 1000


def test_audio_query_runs_and_is_deterministic(spark):
    from pdf_extraction_api_spark.operators.audioops import (
        mm_audio_features,
    )

    sf = "/root/testdata/sf0.001"
    a = sorted(map(tuple, mm_audio_features(spark, sf).collect()))
    b = sorted(map(tuple, mm_audio_features(spark, sf).collect()))
    assert a == b and len(a) > 0
    kinds = {r[1] for r in a}
    assert kinds == {"tone", "chord", "noise", "silence"}


def test_image_resize_properties(spark):
    from pdf_extraction_api_spark.operators.imageops import resize

    flat = np.full((50, 70), 99, dtype=np.uint8)
    th = resize(flat, 32, 32)
    assert th.shape == (32, 32)
    assert (th == 99).all()  # bilinear preserves constants
    rgb = np.zeros((40, 40, 3), dtype=np.uint8)
    rgb[:, :, 1] = 200
    th3 = resize(rgb, 16, 24)
    assert th3.shape == (16, 24, 3)
    assert (th3[:, :, 1] == 200).all() and (th3[:, :, 0] == 0).all()


def test_audio_dup_structure(spark):
    """dd_audio_dup recovers the synthesis collision structure on the
    real corpus: noise clips NEVER collide (their LCG is keyed on
    doc_id), while at 500 docs every tone/chord/silence clip has a
    period-48 (or shorter, for silence) twin — so is_dup is exactly
    (kind != 'noise'); and an exact Python replay of the fingerprint
    census matches every row."""
    import numpy as np

    from pdf_extraction_api_spark.operators.audioops import (
        dd_audio_dup,
        decode_wav_pcm,
        synth_wav,
    )

    sf = "/root/testdata/sf0.001"
    doc_ids = [r.doc_id for r in spark.read.parquet(
        f"{sf}/documents.parquet").select("doc_id").collect()]

    owners = {}
    sig_by_doc = {}
    for d in doc_ids:
        _kind, blob = synth_wav(int(d))
        pcm, _ = decode_wav_pcm(blob)
        p = pcm.astype(np.int64)
        idx = np.arange(len(p), dtype=np.int64)
        sig = (len(p), int(p.sum()), int((idx * p).sum()))
        sig_by_doc[d] = sig
        owners.setdefault(sig, set()).add(d)

    got = {r.doc_id: (r.audio_kind, r.n_samples, r.n_twins, r.is_dup)
           for r in dd_audio_dup(spark, sf).collect()}
    assert set(got) == set(doc_ids)
    for d, (kind, n, n_twins, is_dup) in got.items():
        sig = sig_by_doc[d]
        assert n == sig[0]
        assert n_twins == len(owners[sig])
        assert is_dup == ("true" if len(owners[sig]) >= 2 else "false")
        assert (is_dup == "true") == (kind != "noise"), (d, kind)
