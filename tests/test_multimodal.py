"""Multimodal binary-column plumbing: schema, batch shapes, stub seam."""

import pytest

from ldtab_clj_spark.operators.multimodal import (decode_media,
                                                  media_feature_statements,
                                                  sample_frames,
                                                  synth_media)
from ldtab_clj_spark.synth import synth_docs


@pytest.fixture(scope="module")
def media(spark):
    docs = synth_docs(spark, 60, seed=9)
    return synth_media(spark, docs).localCheckpoint()


def test_media_table_shape(media):
    rows = media.collect()
    assert rows
    for r in rows:
        assert isinstance(r.content, (bytes, bytearray)) and len(r.content) >= 256
        assert r.meta.format in ("png", "jpeg", "wav", "mp4")
        assert r.meta.width >= 16 and r.meta.n_frames >= 1


def test_decode_features_deterministic(media):
    f1 = {r.media_ref: list(r.feature)
          for r in decode_media(media).collect()}
    f2 = {r.media_ref: list(r.feature)
          for r in decode_media(media).collect()}
    assert f1 == f2
    assert all(len(v) == 16 for v in f1.values())
    assert all(0.0 <= x <= 1.0 for v in f1.values() for x in v)


def _pil_available():
    try:
        import PIL  # noqa: F401
        return True
    except ImportError:
        return False


@pytest.mark.skipif(_pil_available(),
                    reason="PIL present: real decode path active")
def test_real_decode_without_pil_raises_documented_error(media):
    """No PIL on the worker → the documented seam error (never a
    silent fallback to the stub)."""
    with pytest.raises(Exception) as exc:
        decode_media(media, real_decode=True).collect()
    assert "NotImplementedError" in str(exc.value) or \
        isinstance(exc.value, NotImplementedError)
    assert "PIL" in str(exc.value)


@pytest.mark.skipif(not _pil_available(), reason="PIL not installed")
def test_real_decode_with_pil_decodes_png(spark):
    """Soft-enabled real path: with PIL importable, real_decode=True
    decodes actual PNG bytes into the same 16-dim feature shape."""
    import io

    from PIL import Image
    buf = io.BytesIO()
    Image.new("RGB", (8, 8), (200, 10, 10)).save(buf, format="PNG")
    rows = [("m/1", buf.getvalue(),
             {"format": "png", "width": 8, "height": 8, "n_frames": 1})]
    from ldtab_clj_spark.operators.multimodal import MEDIA
    media = spark.createDataFrame(rows, MEDIA)
    feats = decode_media(media, real_decode=True).collect()
    assert len(feats) == 1 and len(feats[0].feature) == 16
    assert all(0.0 <= x <= 1.0 for x in feats[0].feature)


def test_frame_sampling_one_to_many(media):
    frames = sample_frames(media, every=2).collect()
    assert frames
    by_ref = {}
    for fr in frames:
        by_ref.setdefault(fr.media_ref, []).append(fr.frame_idx)
        assert isinstance(fr.frame, (bytes, bytearray))
    meta = {r.media_ref: r.meta.n_frames for r in media.collect()}
    for ref, idxs in by_ref.items():
        assert idxs == list(range(0, meta[ref], 2))


def test_media_statements_join_back(media):
    st = media_feature_statements(decode_media(media))
    rows = st.collect()
    assert rows
    assert all(r.predicate == "ex:featureHash" for r in rows)
    assert all(r.subject.startswith("<media://") for r in rows)
