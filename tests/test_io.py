import numpy as np
import pytest

from symmetric_eigenvalue_tpu.io.evselect import determine_eigenvectors_to_compute
from symmetric_eigenvalue_tpu.io.mtx import (MTXFormatError,
                                             read_symmetric_tridiagonal,
                                             read_tridiagonal_banded,
                                             write_symmetric_tridiagonal)
from symmetric_eigenvalue_tpu.io.results import read_results, write_results

TINYL = """%%MatrixMarket matrix coordinate real general
%matrix L
4 4 10
1 1 2
2 1 -1
1 2 -1
2 2 2
3 2 -1
2 3 -1
3 3 2
4 3 -1
3 4 -1
4 4 2
"""


@pytest.fixture
def tinyl(tmp_path):
    p = tmp_path / "tinyL.mtx"
    p.write_text(TINYL)
    return p


def test_read_tinyl(tinyl):
    d, e = read_symmetric_tridiagonal(tinyl)
    assert np.allclose(d, 2.0)
    assert np.allclose(e, -1.0)


def test_roundtrip(tmp_path, rng):
    n = 12
    d = rng.standard_normal(n)
    e = rng.standard_normal(n - 1)
    p = tmp_path / "m.mtx"
    write_symmetric_tridiagonal(p, d, e)
    d2, e2 = read_symmetric_tridiagonal(p)
    assert np.allclose(d, d2, atol=0)
    assert np.allclose(e, e2, atol=0)


def test_writer_matches_reference_fixture_layout(tmp_path):
    """Our writer regenerates the sample fixture byte-compatibly (modulo the
    comment line): coordinate/real/general, column-major entry order."""
    p = tmp_path / "gen.mtx"
    write_symmetric_tridiagonal(p, [2.0] * 4, [-1.0] * 3, comment="matrix L")
    assert p.read_text() == TINYL


def test_reject_nonsquare(tmp_path):
    p = tmp_path / "bad.mtx"
    p.write_text("%%MatrixMarket matrix coordinate real general\n2 3 1\n1 1 1.0\n")
    with pytest.raises(MTXFormatError, match="square"):
        read_symmetric_tridiagonal(p)


def test_reject_nontridiagonal(tmp_path):
    p = tmp_path / "bad.mtx"
    p.write_text("%%MatrixMarket matrix coordinate real general\n"
                 "3 3 2\n1 1 1.0\n3 1 5.0\n")
    with pytest.raises(MTXFormatError, match="tridiagonal"):
        read_symmetric_tridiagonal(p)


def test_reject_asymmetric(tmp_path):
    p = tmp_path / "bad.mtx"
    p.write_text("%%MatrixMarket matrix coordinate real general\n"
                 "2 2 4\n1 1 1.0\n2 1 3.0\n1 2 4.0\n2 2 1.0\n")
    with pytest.raises(MTXFormatError, match="symmetric"):
        read_symmetric_tridiagonal(p)


def test_reject_wrong_banner(tmp_path):
    p = tmp_path / "bad.mtx"
    p.write_text("%%MatrixMarket matrix array real general\n2 2\n1\n2\n")
    with pytest.raises(MTXFormatError):
        read_symmetric_tridiagonal(p)


def test_banded_reader(tinyl):
    T = read_tridiagonal_banded(tinyl)
    assert T.shape == (4, 3)
    assert np.allclose(T[:, 1], 2.0)
    assert np.allclose(T[1:, 0], -1.0)
    assert np.allclose(T[:-1, 2], -1.0)


def test_evselect_all():
    sel = determine_eigenvectors_to_compute(True, None, 10)
    assert sel.all and sel.indices is None
    sel = determine_eigenvectors_to_compute(False, None, 10)
    assert not sel.any


def test_evselect_file(tmp_path):
    p = tmp_path / "ev.txt"
    p.write_text("3\n1\nbogus\n0\n99\n2\n")
    warnings = []
    sel = determine_eigenvectors_to_compute(True, str(p), 10,
                                            warn=warnings.append)
    assert sel.indices == [0, 1, 2]       # sorted, 0-based
    assert len(warnings) == 3             # bogus, 0, 99


def test_results_format(tmp_path):
    p = tmp_path / "out.txt"
    lam = np.array([1.2345678901234567890, -7.5])
    res = np.array([1e-15, 2e-14])
    write_results(p, lam, res)
    lines = p.read_text().splitlines()
    # C "%20.19g" formatting parity
    assert lines[0] == f"{lam[0]:20.19g} {res[0]:20.19g}"
    lam2, res2 = read_results(p)
    assert np.allclose(lam2, lam)
    assert np.allclose(res2, res)


def test_results_partial_selection(tmp_path):
    p = tmp_path / "out.txt"
    write_results(p, np.arange(4.0), [9e-9], computed_indices=[2])
    lam, res = read_results(p)
    assert res[2] is not None and res[0] is None and len(lam) == 4


def test_native_parser_matches_python(tmp_path, rng):
    import pytest as _pytest

    from symmetric_eigenvalue_tpu.io import native

    if native.get_lib() is None:
        _pytest.skip("no C toolchain available")
    n = 200
    d = rng.standard_normal(n)
    e = rng.standard_normal(n - 1)
    p = tmp_path / "m.mtx"
    write_symmetric_tridiagonal(p, d, e)
    dn, en, err = native.read_symm_tridiag(p)
    assert err == ""
    d2, e2 = read_symmetric_tridiagonal(p, use_native=False)
    assert np.array_equal(dn, d2)
    assert np.array_equal(en, e2)
    # native writer round-trips through the python reader
    p2 = tmp_path / "m2.mtx"
    assert native.write_symm_tridiag(p2, d, e, "x")
    d3, e3 = read_symmetric_tridiagonal(p2, use_native=False)
    assert np.array_equal(d3, dn)
    assert np.array_equal(e3, en)


def test_native_parser_rejects_bad(tmp_path):
    import pytest as _pytest

    from symmetric_eigenvalue_tpu.io import native

    if native.get_lib() is None:
        _pytest.skip("no C toolchain available")
    p = tmp_path / "bad.mtx"
    p.write_text("%%MatrixMarket matrix coordinate real general\n"
                 "3 3 2\n1 1 1.0\n3 1 5.0\n")
    d, e, err = native.read_symm_tridiag(p)
    assert d is None and "tridiagonal" in err
