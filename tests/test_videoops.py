"""Video path: AVI round-trip + frame-sample/motion properties."""

from __future__ import annotations

import numpy as np
import pytest

from pdf_extraction_api_spark.kernel import avi as avic
from pdf_extraction_api_spark.operators.videoops import synth_clip


def test_avi_roundtrip():
    rng = np.random.default_rng(42)
    frames = [rng.integers(0, 256, size=(18, 25, 3), dtype=np.uint8)
              for _ in range(5)]
    fps, out = avic.decode(avic.encode(frames, fps=12))
    assert fps == 12
    assert len(out) == 5
    for a, b in zip(frames, out):
        assert (a == b).all()


def test_avi_structure_is_spec_shaped():
    """The writer must emit a spec-shaped container: RIFF/AVI fourccs,
    hdrl before movi, idx1 present — so real uncompressed AVIs parse
    with the same reader."""
    _, frames = synth_clip(1)
    data = avic.encode(frames, fps=10)
    assert data[:4] == b"RIFF" and data[8:12] == b"AVI "
    assert data.find(b"hdrl") < data.find(b"movi") < data.find(b"idx1")
    assert b"00db" in data and b"vids" in data


def test_avi_rejects_compressed():
    _, frames = synth_clip(1)
    data = bytearray(avic.encode(frames, fps=10))
    i = data.find(b"vids") + 4
    data[i:i + 4] = b"H264"
    with pytest.raises(ValueError, match="compressed"):
        avic.decode(bytes(data))


def test_motion_static_vs_moving(spark):
    from pdf_extraction_api_spark.operators.videoops import (
        mm_video_frames,
    )

    rows = mm_video_frames(spark, "/root/testdata/sf0.001").collect()
    assert rows
    static_motion = [r.motion for r in rows
                     if r.clip_kind == "static" and r.frame_no > 0]
    moving_motion = [r.motion for r in rows
                     if r.clip_kind == "moving" and r.frame_no > 0]
    assert static_motion and moving_motion
    assert max(static_motion) == 0.0
    assert min(moving_motion) > 0.0
    assert all(r.fps == 10 for r in rows)
    # sampling: only even frame numbers emitted (SAMPLE_EVERY=2)
    assert {r.frame_no % 2 for r in rows} == {0}


def test_video_scenes_static_vs_moving(spark):
    from pdf_extraction_api_spark.operators.videoops import (
        SCENE_MIN_COLS, mm_video_scenes)

    rows = mm_video_scenes(spark, "/root/testdata/sf0.001").collect()
    assert rows
    moving_cuts = 0
    for r in rows:
        if r["clip_kind"] == "static":
            assert r["n_cuts"] == 0 and r["max_diff_cols"] == 0
        else:
            # every consecutive pair moves (5-px glide => 10 columns)
            assert r["max_diff_cols"] >= 10
            assert 0 <= r["n_cuts"] <= r["n_frames"] - 1
            moving_cuts += r["n_cuts"]
    # wrap-around teleports exist somewhere in the corpus
    assert moving_cuts > 0
    assert any(r["max_diff_cols"] >= SCENE_MIN_COLS for r in rows)


def test_video_frame_dup_matches_python_replay(spark):
    """dd_video_frame_dup equals an exact Python replay of the
    fingerprint census over the real synth_clip frames: static clips
    sharing (h, w) MUST collide (their frames depend only on size),
    and at least one duplicated and one unique clip exist in the
    sf0.001 corpus (the planted-duplication claim)."""
    import numpy as np

    from pdf_extraction_api_spark.operators.videoops import (
        SAMPLE_EVERY,
        dd_video_frame_dup,
        synth_clip,
    )

    sf = "/root/testdata/sf0.001"
    doc_ids = [r.doc_id for r in spark.read.parquet(
        f"{sf}/documents.parquet").select("doc_id").collect()]

    sigs_by_doc, owners = {}, {}
    for d in doc_ids:
        _kind, frames = synth_clip(int(d))
        sigs = []
        for i in range(0, len(frames), SAMPLE_EVERY):
            f = frames[i].astype(np.int64)
            h, w = f.shape[0], f.shape[1]
            xw = np.arange(w, dtype=np.int64)[None, :, None]
            sig = (w, h, int(f.sum()), int((xw * f).sum()))
            sigs.append(sig)
            owners.setdefault(sig, set()).add(d)
        sigs_by_doc[d] = sigs

    want = {}
    for d, sigs in sigs_by_doc.items():
        n_dup = sum(1 for s in sigs if len(owners[s]) >= 2)
        want[d] = (len(sigs), n_dup, round(n_dup / len(sigs), 6))

    got = {r.doc_id: (r.n_frames, r.n_dup_frames, r.dup_frac)
           for r in dd_video_frame_dup(spark, sf).collect()}
    assert got == want
    # at 500 docs the 16x16 size cycle saturates: every clip collides
    assert all(v[2] == 1.0 for v in got.values())


def test_video_frame_dup_discriminates(spark, tmp_path):
    """On a small corpus the fingerprint census separates clips:
    doc 0 and doc 32 share the size cycle and are both static →
    fully duplicated; docs with unique sizes report zero."""
    from pdf_extraction_api_spark.operators.videoops import (
        dd_video_frame_dup,
    )

    ids = [0, 1, 2, 3, 32]
    spark.createDataFrame(
        [(i, f"t{i}", "en", "s", 2) for i in ids],
        "doc_id LONG, text STRING, lang STRING, source STRING,"
        " n_chars LONG"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {r.doc_id: r.dup_frac
           for r in dd_video_frame_dup(spark, str(tmp_path)).collect()}
    assert got[0] == 1.0 and got[32] == 1.0   # size-cycle twins
    assert got[1] == 0.0 and got[2] == 0.0 and got[3] == 0.0
