"""Property tests (hypothesis) over the PMTiles/MVT wire formats —
pure Python, no Spark session needed."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from overmatch_spark.kernels.png import (
    png_decode_gray,
    png_decode_rgb,
    png_encode_gray,
    png_encode_rgb,
)
from overmatch_spark.operators.pmtiles import (
    _decode_directory,
    _encode_directory,
    _read_varint,
    _unzigzag,
    _varint,
    _zigzag,
    hilbert_tid,
    mvt_decode,
    mvt_encode_layer,
)


@given(st.integers(min_value=0, max_value=2**64 - 1))
def test_varint_roundtrip(n):
    v, i = _read_varint(_varint(n), 0)
    assert v == n and i == len(_varint(n))


@given(st.integers(min_value=-(2**62), max_value=2**62))
def test_zigzag_roundtrip(n):
    assert _unzigzag(_zigzag(n)) == n


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=2**40),  # id delta
            st.integers(min_value=0, max_value=2**20),  # length
        ),
        min_size=1,
        max_size=60,
    )
)
def test_directory_roundtrip(deltas):
    """Entries with arbitrary ascending ids and arbitrary (possibly
    non-contiguous, possibly deduped) offsets survive encode/decode."""
    entries = []
    tid = 0
    off = 0
    for i, (d, ln) in enumerate(deltas):
        tid += d
        # every third entry reuses the first blob (content dedup)
        o = 0 if (i % 3 == 2 and entries) else off
        entries.append((tid, o, ln, 1))
        if o == off:
            off += ln
    assert _decode_directory(_encode_directory(entries)) == entries


@given(
    st.lists(
        st.fixed_dictionaries(
            {
                "id": st.integers(min_value=0, max_value=2**53),
                "px": st.integers(min_value=0, max_value=4095),
                "py": st.integers(min_value=0, max_value=4095),
                "props": st.fixed_dictionaries(
                    {
                        "osm_id": st.integers(
                            min_value=-(2**31), max_value=2**31
                        ),
                        "overture_id": st.text(min_size=0, max_size=12),
                        "score": st.floats(
                            allow_nan=False, allow_infinity=False
                        ),
                        "kept": st.booleans(),
                    }
                ),
            }
        ),
        min_size=0,
        max_size=25,
    )
)
@settings(max_examples=60)
def test_mvt_layer_roundtrip(feats):
    tile = mvt_decode(mvt_encode_layer("layer", feats))
    got = tile["layer"]["features"]
    assert len(got) == len(feats)
    for g, f in zip(got, feats):
        assert g["id"] == f["id"]
        assert (g["px"], g["py"]) == (f["px"], f["py"])
        assert g["props"] == f["props"]


@given(st.integers(min_value=0, max_value=10), st.data())
def test_hilbert_in_zoom_range(z, data):
    x = data.draw(st.integers(min_value=0, max_value=(1 << z) - 1))
    y = data.draw(st.integers(min_value=0, max_value=(1 << z) - 1))
    tid = hilbert_tid(z, x, y)
    base = ((1 << (2 * z)) - 1) // 3
    assert base <= tid < base + (1 << (2 * z))


@given(
    st.integers(min_value=1, max_value=24),
    st.integers(min_value=1, max_value=24),
    st.integers(min_value=0, max_value=2**32 - 1),
)
@settings(max_examples=30)
def test_png_roundtrip_any_dims(h, w, seed):
    rng = np.random.default_rng(seed)
    g = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    assert np.array_equal(png_decode_gray(png_encode_gray(g)), g)
    c = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert np.array_equal(png_decode_rgb(png_encode_rgb(c)), c)
