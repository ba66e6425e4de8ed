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
