"""Property tests (hypothesis) over the ISO-BMFF mux/demux kernel —
pure Python, no Spark session needed. Samples are arbitrary byte
strings here (the container is codec-agnostic; MJPEG decode is
covered separately in test_mp4.py)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from overmatch_spark.kernels.mp4 import (
    mux_mjpeg,
    parse_mp4,
    sample_bytes,
    walk_boxes,
)

_samples = st.lists(
    st.binary(min_size=1, max_size=200), min_size=1, max_size=40
)


@settings(max_examples=60, deadline=None)
@given(
    samples=_samples,
    w=st.integers(min_value=1, max_value=4096),
    h=st.integers(min_value=1, max_value=4096),
    fps=st.integers(min_value=1, max_value=240),
    spc=st.integers(min_value=0, max_value=50),
)
def test_mux_demux_roundtrip(samples, w, h, fps, spc):
    """Any sample list, any dims/fps, any chunking (incl. spc > n and
    non-dividing tails): header fields and every sample byte-exact."""
    buf = mux_mjpeg(samples, w, h, fps=fps, samples_per_chunk=spc)
    t = parse_mp4(buf)
    assert (t.width, t.height, t.n_samples, t.fps) == (
        w, h, len(samples), float(fps),
    )
    for i, s in enumerate(samples):
        assert sample_bytes(buf, t, i) == s


@settings(max_examples=40, deadline=None)
@given(samples=_samples, spc=st.integers(min_value=0, max_value=7))
def test_sample_ranges_partition_mdat(samples, spc):
    """The resolved ranges tile mdat exactly: in order, disjoint,
    gap-free, ending at the box boundary — no sample can alias
    another's bytes and none can escape the media box."""
    buf = mux_mjpeg(samples, 8, 8, samples_per_chunk=spc)
    t = parse_mp4(buf)
    boxes = {fc: (s, e) for fc, s, e in walk_boxes(buf)}
    pos, mdat_e = boxes[b"mdat"]
    for i in range(t.n_samples):
        a, b = t.sample_range(i)
        assert a == pos and b <= mdat_e
        pos = b
    assert pos == mdat_e


@settings(max_examples=30, deadline=None)
@given(
    samples=_samples,
    cut=st.floats(min_value=0.05, max_value=0.95),
)
def test_truncation_never_misattributes(samples, cut):
    """A truncated file either fails to parse or, if moov survives
    (it is at the tail here, so it never does), still maps correctly —
    garbage-in must raise, not return wrong sample bytes."""
    buf = mux_mjpeg(samples, 8, 8)
    short = buf[: max(12, int(len(buf) * cut))]
    try:
        t = parse_mp4(short)
    except ValueError:
        return
    for i in range(t.n_samples):
        assert sample_bytes(short, t, i) == samples[i]
