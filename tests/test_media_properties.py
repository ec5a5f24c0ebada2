"""Property tests for the pure-bytes media codecs: encode→decode is
identity (exact for images/video, int16-quantized for audio) on
arbitrary inputs, and the Y4M O(1) seek always lands on the right
frame. No Spark session — these pin the kernels the mapInPandas
stages (operators/multimodal.py) distribute."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from datacapsule_spark.operators import media_codecs as mc


@st.composite
def _images(draw):
    h = draw(st.integers(min_value=1, max_value=12))
    w = draw(st.integers(min_value=1, max_value=12))
    seed = draw(st.integers(min_value=0, max_value=2**31 - 1))
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


@settings(max_examples=40, deadline=None)
@given(_images())
def test_ppm_roundtrip_any_image(img):
    assert np.array_equal(mc.decode_ppm(mc.encode_ppm(img)), img)


@settings(max_examples=40, deadline=None)
@given(_images())
def test_bmp_roundtrip_any_image(img):
    # odd widths exercise the 4-byte row padding
    assert np.array_equal(mc.decode_bmp(mc.encode_bmp(img)), img)


@settings(max_examples=40, deadline=None)
@given(
    st.integers(min_value=1, max_value=400),
    st.integers(min_value=1, max_value=2),
    st.integers(min_value=0, max_value=2**31 - 1),
    st.sampled_from([8000, 16000, 44100]),
)
def test_wav_roundtrip_any_pcm(n, ch, seed, rate):
    rng = np.random.default_rng(seed)
    x = rng.uniform(-1.0, 1.0, size=(n, ch))
    r2, decoded = mc.decode_wav(mc.encode_wav_pcm16(x, rate))
    assert r2 == rate and decoded.shape == (n, ch)
    # int16 quantization: |error| <= 1/32768 + rounding half-step
    assert np.abs(decoded - x).max() <= (1.0 / 32768) + (0.5 / 32767)


@settings(max_examples=25, deadline=None)
@given(
    st.integers(min_value=1, max_value=12),  # n_frames
    st.integers(min_value=1, max_value=4),  # half-height
    st.integers(min_value=1, max_value=4),  # half-width
    st.integers(min_value=1, max_value=30),  # fps
    st.integers(min_value=0, max_value=2**31 - 1),
)
def test_y4m_seek_matches_encoded_frame(n, hh, hw, fps, seed):
    rng = np.random.default_rng(seed)
    frames = rng.integers(0, 256, size=(n, 2 * hh, 2 * hw), dtype=np.uint8)
    payload = mc.encode_y4m(frames, fps=fps)
    info = mc.y4m_info(payload)
    assert info["n_frames"] == n
    for idx in {0, n // 2, n - 1}:
        assert np.array_equal(mc.y4m_frame_index(payload, idx, info), frames[idx])
        # ts → frame mapping: any ts inside frame idx's interval lands on it
        ts = (idx * 1000 * info["fps_den"]) // info["fps_num"]
        got = mc.y4m_frame_at(payload, ts + (1000 // (2 * fps)), info)
        assert np.array_equal(got, frames[idx])
    assert mc.y4m_frame_index(payload, n, info) is None


@settings(max_examples=30, deadline=None)
@given(_images())
def test_image_features_bounded(img):
    w, h, mr, mg, mb, luma_std, edge, entropy = mc.image_features(img)
    assert (w, h) == (float(img.shape[1]), float(img.shape[0]))
    for m in (mr, mg, mb):
        assert 0.0 <= m <= 255.0
    assert 0.0 <= entropy <= 3.0 + 1e-9  # 8 bins
    assert luma_std >= 0.0 and edge >= 0.0


@settings(max_examples=30, deadline=None)
@given(
    st.integers(min_value=2, max_value=64),
    st.integers(min_value=2, max_value=64),
    st.integers(min_value=0, max_value=2**31 - 1),
)
def test_resize_preserves_range_and_shape(out_w, out_h, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(32, 48, 3), dtype=np.uint8)
    small = mc.resize_area(img, out_w, out_h)
    assert small.shape == (out_h, out_w, 3)
    assert small.min() >= img.min() - 1 and small.max() <= img.max() + 1
