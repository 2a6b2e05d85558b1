"""Native C++ library parity tests (built on the fly with g++)."""

import numpy as np
import pytest

from vqa_tpu import native
from vqa_tpu.data.relation import relation_graphs_batched


@pytest.fixture(scope="module", autouse=True)
def require_native():
    if not native.available():
        pytest.skip("native library unavailable (g++ build failed)")


def test_gather_bytes_matches_numpy(rng):
    src = rng.standard_normal((50, 12, 7)).astype(np.float32)
    rows = rng.integers(0, 50, 17)
    got = native.gather_rows(src, rows, widen_f16=False)
    np.testing.assert_array_equal(got, src[rows])


def test_gather_f16_widen_matches_numpy(rng):
    src = (rng.standard_normal((40, 9, 5)) * 10).astype(np.float16)
    rows = rng.integers(0, 40, 23)
    got = native.gather_rows(src, rows, widen_f16=True)
    assert got.dtype == np.float32
    np.testing.assert_array_equal(got, src[rows].astype(np.float32))


def test_f16_special_values():
    src = np.asarray([[0.0, -0.0, np.inf, -np.inf, 6.1e-5, 5.96e-8, 65504.0,
                       1.5]], np.float16)
    got = native.gather_rows(src, np.asarray([0]), widen_f16=True)
    np.testing.assert_array_equal(got, src.astype(np.float32))


def test_native_relation_graphs_match_python(rng):
    B, N = 6, 9
    xy = rng.random((B, N, 2)) * 300
    wh = rng.random((B, N, 2)) * 120 + 5
    bbox = np.concatenate([xy, xy + wh], axis=2)
    w = np.full(B, 640.0)
    h = np.full(B, 480.0)
    got = native.spatial_relation_graphs_native(bbox, w, h)
    want = relation_graphs_batched(bbox, w, h)
    np.testing.assert_array_equal(got, want)


def test_native_densify_answers(rng):
    dicts = [{"2": 5, "0": 1}, {}, {"3": 2}]
    got = native.densify_answers_native(dicts, 5)
    want = np.array([[1 / 3, 0, 1, 0, 0],
                     [0, 0, 0, 0, 0],
                     [0, 0, 0, 2 / 3, 0]], np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-6)
