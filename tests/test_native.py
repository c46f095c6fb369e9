"""Native featurization kernels vs the pure-Python specification."""

import numpy as np
import pytest

from case_rg_tpu import native
from case_rg_tpu.data.labels import case_token_labels, glks_selection_label


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
def test_case_labels_native_matches_python():
    rng = np.random.RandomState(0)
    passages = rng.randint(0, 50, size=(4, 30)).astype(np.int32)
    passages[:, -5:] = 0
    answer = rng.randint(0, 50, size=9)
    id2freq = {i: float(rng.randint(1, 200)) for i in range(50)}
    ln, cn = case_token_labels(passages, answer, id2freq, use_native=True)
    lp, cp = case_token_labels(passages, answer, id2freq, use_native=False)
    np.testing.assert_allclose(ln, lp, atol=0)
    np.testing.assert_allclose(cn, cp, rtol=2e-5, atol=1e-6)


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
def test_glks_labels_native_matches_python():
    rng = np.random.RandomState(1)
    bg = rng.randint(0, 40, size=57).astype(np.int32)
    answer = rng.randint(0, 40, size=8)
    for min_ws, n_win in [(4, 1), (5, 3)]:
        pn = glks_selection_label(bg, answer, min_ws, n_win, use_native=True)
        pp = glks_selection_label(bg, answer, min_ws, n_win, use_native=False)
        np.testing.assert_allclose(pn, pp, rtol=1e-6, atol=1e-7)


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
def test_native_throughput_exceeds_python():
    import time
    rng = np.random.RandomState(2)
    passages = rng.randint(0, 30522, size=(10, 100)).astype(np.int32)
    answer = rng.randint(0, 30522, size=41)
    id2freq = {int(i): float(rng.randint(1, 9999))
               for i in rng.randint(0, 30522, size=5000)}
    t0 = time.time()
    for _ in range(20):
        case_token_labels(passages, answer, id2freq, use_native=True)
    t_native = time.time() - t0
    t0 = time.time()
    for _ in range(2):
        case_token_labels(passages, answer, id2freq, use_native=False)
    t_python = (time.time() - t0) * 10
    assert t_native < t_python, (t_native, t_python)
