"""n-polymer scan tests against the documented reference examples
(reference: src/aln.pyx:182-203 docstring, test/get_np_info.py)."""
import numpy as np


def test_debug_printers():
    """dump / print_np_info equivalents (reference: src/aln.pyx:791-865)."""
    from npore_tpu.constants import bases_to_int
    from npore_tpu.golden.debug import format_np_info, render_alignment
    txt = render_alignment("ACGTAAA", "ACTTAA", "==X=DI=D")
    lines = txt.splitlines()
    assert "Cigar: ==X=DI=D" in txt
    assert lines[-4:-1] == ["ACGTA-AA", "||X|  | ", "ACTT-AA-"]
    import pytest
    with pytest.raises(ValueError):
        render_alignment("A", "A", "Q")
    np_txt = format_np_info(bases_to_int("CAAAGAAAGAAAG"), 4)
    assert "n=1 l: 0 3 3 3 0 3 3 3 0 3 3 3 0" in np_txt
    assert "n=4 l: 0 3 0 0 0 3 0 0 0 3 0 0 0" in np_txt

from npore_tpu.constants import bases_to_int
from npore_tpu.golden.npinfo import get_np_info, L, L_IDX


def test_docstring_example():
    # seq: A T A T A T A T T T T T T A A A G C G C G C (src/aln.pyx:182-203)
    seq = bases_to_int("ATATATATTTTTTAAAGCGCGC")
    info = get_np_info(seq)

    assert info[:, L, 0].tolist() == \
        [0, 0, 0, 0, 0, 0, 0, 6, 6, 6, 6, 6, 6, 3, 3, 3, 0, 0, 0, 0, 0, 0]
    assert info[:, L_IDX, 0].tolist() == \
        [0, 0, 0, 0, 0, 0, 0, 0, 1, 2, 3, 4, 5, 0, 1, 2, 0, 0, 0, 0, 0, 0]
    assert info[:, L, 1].tolist() == \
        [4, 3, 4, 3, 4, 3, 4, 0, 0, 0, 0, 0, 0, 0, 0, 0, 3, 0, 3, 0, 3, 0]
    assert info[:, L_IDX, 1].tolist() == \
        [0, 0, 1, 1, 2, 2, 3, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 0, 2, 0]
    assert (info[:, L, 2] == 0).all()  # 6T is not also counted as 3(TT)


def test_min_three_repeats():
    # two units are not an n-polymer
    info = get_np_info(bases_to_int("AATT"))
    assert (info == 0).all()
    # three units are
    info = get_np_info(bases_to_int("AAATT"))
    assert info[0, L, 0] == 3 and info[2, L_IDX, 0] == 2


def test_n_bases_skipped():
    info = get_np_info(bases_to_int("NNNNN"))
    assert (info == 0).all()


def test_max_l_clamp():
    """Stored L clamps to max_l but overwrite comparisons use the raw
    length, so for a 150-mer the last start with raw l > 100 (s=49, l=101)
    is the final writer of the tail positions."""
    seq = bases_to_int("A" * 150)
    info = get_np_info(seq, max_n=6, max_l=100)
    assert info[0, L, 0] == 100   # stored clamped
    assert info[0, L_IDX, 0] == 0
    assert info[149, L_IDX, 0] == 100
    assert info[48, L_IDX, 0] == 0    # s=48 (raw 102) is its last writer


def test_trailing_repeat_units():
    # repeat at end of sequence: while-loop needs ptr+n < len
    info = get_np_info(bases_to_int("GCGCGC"))
    assert info[0, L, 1] == 3
    assert info[4, L_IDX, 1] == 2
