"""Unit tests for the numpy kernels against independent oracles
(SURVEY.md §5.1)."""

import numpy as np
import pytest

from overmatch_spark.kernels import geo
from overmatch_spark.kernels.text import indel_similarity, lcs_len_batch


def _lcs_brute(a, b):
    m, n = len(a), len(b)
    dp = [[0] * (n + 1) for _ in range(m + 1)]
    for i in range(m):
        for j in range(n):
            dp[i + 1][j + 1] = (
                dp[i][j] + 1 if a[i] == b[j] else max(dp[i][j + 1], dp[i + 1][j])
            )
    return dp[m][n]


class TestIndel:
    def test_vs_bruteforce_random(self):
        import random

        random.seed(7)
        alph = "abcXYZ #é¤"
        pairs = [
            (
                "".join(random.choice(alph) for _ in range(random.randint(0, 90))),
                "".join(random.choice(alph) for _ in range(random.randint(0, 90))),
            )
            for _ in range(400)
        ]
        pairs += [("", ""), ("a", ""), ("", "b"), ("abc", "abc")]
        got = lcs_len_batch([p[0] for p in pairs], [p[1] for p in pairs])
        exp = np.array([_lcs_brute(a, b) for a, b in pairs])
        assert (got == exp).all()

    def test_rapidfuzz_known_values(self):
        # fuzz.ratio("this is a test", "this is a test!") == 96.55...
        # (rapidfuzz docs example) = 2*14/(14+15)*100
        sim = indel_similarity(["this is a test"], ["this is a test!"])[0]
        assert sim == pytest.approx(2 * 14 / 29, abs=0)
        # appending never lowers LCS below len(a)
        sim = indel_similarity(["Golden Fork Cafe"], ["Golden Fork Cafe Zq"])[0]
        assert sim == 2 * 16 / (16 + 19)
        # case-sensitive (reference passes raw names)
        assert indel_similarity(["ABC"], ["abc"])[0] == 0.0
        # both empty -> 1.0 (rapidfuzz returns 100)
        assert indel_similarity([""], [""])[0] == 1.0


class TestMercator:
    def test_known_values(self):
        # EPSG:3857 well-known point: (lon=180) -> x = pi*R
        assert geo.merc_x(np.array([180.0]))[0] == pytest.approx(
            np.pi * 6378137.0, rel=1e-12
        )
        assert geo.merc_y(np.array([0.0]))[0] == pytest.approx(0.0, abs=1e-9)
        # independent formulation: y = R*asinh(tan(lat)) must agree
        # with the ln(tan(pi/4 + lat/2)) form used by the engine
        x = geo.merc_x(np.array([-77.0]))[0]
        y = geo.merc_y(np.array([38.9]))[0]
        assert x == pytest.approx(-8571600.56, abs=0.5)
        assert y == pytest.approx(
            6378137.0 * np.arcsinh(np.tan(np.deg2rad(38.9))), rel=1e-12
        )

    def test_roundtrip(self):
        lon = np.linspace(-179, 179, 101)
        lat = np.linspace(-80, 80, 101)
        assert np.allclose(geo.inv_merc_lon(geo.merc_x(lon)), lon, atol=1e-9)
        assert np.allclose(geo.inv_merc_lat(geo.merc_y(lat)), lat, atol=1e-9)

    def test_distance(self):
        d = geo.planar_distance(0.0, 0.0, 3.0, 4.0)
        assert d == 5.0


class TestCells:
    def test_cover_superset(self):
        # every point within radius of a probe shares a cover cell
        rng = np.random.default_rng(3)
        px = rng.uniform(-8.6e6, -8.5e6, 300)
        py = rng.uniform(4.6e6, 4.8e6, 300)
        qx = px + rng.uniform(-100, 100, 300)
        qy = py + rng.uniform(-100, 100, 300)
        res = 18
        cover = geo.disk_cover_cells(px, py, res, 100.0)
        qcell = geo.cell_of(qx, qy, res)
        assert all(qcell[i] in cover[i] for i in range(300))

    def test_resolution_nesting(self):
        x = np.array([-8.57e6])
        y = np.array([4.7e6])
        ix18 = geo.cell_ix(x, 18)[0]
        ix19 = geo.cell_ix(x, 19)[0]
        assert ix19 // 2 == ix18
        iy18 = geo.cell_iy(y, 18)[0]
        iy19 = geo.cell_iy(y, 19)[0]
        assert iy19 // 2 == iy18


class TestTiles:
    def test_known_slippy_vectors(self):
        # OSM wiki example: lon=13.37771496, lat=52.51628011, z=17
        # -> x=70406, y=42987
        x, y = geo.tile_xy(np.array([13.37771496]), np.array([52.51628011]), 17)
        assert (x[0], y[0]) == (70406, 42987)
        # z=0 -> always (0,0)
        x, y = geo.tile_xy(np.array([-77.0]), np.array([38.9]), 0)
        assert (x[0], y[0]) == (0, 0)


class TestPIP:
    def test_square_and_concave(self):
        square = [(0, 0), (10, 0), (10, 10), (0, 10)]
        px = np.array([5.0, 15.0, -1.0, 9.99])
        py = np.array([5.0, 5.0, 5.0, 0.01])
        got = geo.point_in_polygon(px, py, square)
        assert got.tolist() == [True, False, False, True]
        # concave "L" shape
        L = [(0, 0), (10, 0), (10, 4), (4, 4), (4, 10), (0, 10)]
        px = np.array([2.0, 8.0, 8.0, 2.0])
        py = np.array([2.0, 2.0, 8.0, 8.0])
        got = geo.point_in_polygon(px, py, L)
        assert got.tolist() == [True, True, False, True]


class TestHausdorff:
    def test_degenerate_points(self):
        # single vertices -> plain distance (the reference's case)
        assert geo.hausdorff([0], [0], [3], [4]) == 5.0

    def test_asymmetric_sets(self):
        # A = {(0,0),(10,0)}, B = {(0,0)} -> H = 10
        assert geo.hausdorff([0, 10], [0, 0], [0], [0]) == 10.0


class TestRounding:
    def test_half_even_formula(self):
        d = np.array([55.3499999, 55.3500001, 18.0, 0.04999])
        out = geo.round_half_even_1(d)
        assert out.tolist() == [55.3, 55.4, 18.0, 0.0]
