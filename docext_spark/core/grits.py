"""A7 — GRITS_Con table-similarity (factored 2D-MSS) kernel.

Semantics follow the published GRITS metric (Smock et al., "GriTS: Grid
table similarity metric for table structure recognition", arXiv:2203.12555;
reference behavior at /root/reference/docext/benchmark/metrics/grits.py:
13-36 fscore, 86-124 1D DP alignment, 127-164 outer 2D alignment, 167-221
factored_2dmss, 224-231 LCS similarity, 510-532 grits_from_html).

Own implementation: rewards precomputed as a dense numpy 4-tensor; the inner
1D alignments read reward slices instead of a dict lookup; tie-breaking
matches the published convention (diagonal preferred, then skip-seq1).

Pure Python + numpy, deterministic, no Spark imports.
"""
from __future__ import annotations

from difflib import SequenceMatcher

import numpy as np

from docext_spark.core.tables import cells_to_text_grid, html_table_to_cells


def fscore(match_score: float, num_true: int,
           num_positives: int) -> tuple[float, float, float]:
    """(f, precision, recall) — precision 1 when no predictions, recall 1
    when no truth, F 0 at 0+0 (reference grits.py:13-36 compute_fscore
    returns the same triple)."""
    precision = match_score / num_positives if num_positives > 0 else 1.0
    recall = match_score / num_true if num_true > 0 else 1.0
    if precision + recall <= 0:
        return 0.0, precision, recall
    return 2 * precision * recall / (precision + recall), precision, recall


def lcs_similarity(a: str, b: str) -> float:
    """2*|LCS-ish| / (|a|+|b|) via difflib matching blocks; 1.0 for two
    empty strings (reference grits.py:224-231)."""
    if len(a) == 0 and len(b) == 0:
        return 1.0
    matched = sum(blk.size for blk in SequenceMatcher(None, a, b).get_matching_blocks())
    return 2.0 * matched / (len(a) + len(b))


def _align(reward: np.ndarray, return_alignment: bool = False):
    """Needleman-Wunsch-style max-sum alignment over a (n, m) reward matrix.

    Returns total score, and optionally the aligned index pairs. Traceback
    preference on ties: diagonal, then skip-row, then skip-col (matches the
    published convention).
    """
    n, m = reward.shape
    score = np.zeros((n + 1, m + 1))
    ptr = np.zeros((n + 1, m + 1), dtype=np.int8)  # 0 diag, -1 up, 1 left
    ptr[1:, 0] = -1
    ptr[0, 1:] = 1
    for i in range(1, n + 1):
        row = reward[i - 1]
        for j in range(1, m + 1):
            diag = score[i - 1, j - 1] + row[j - 1]
            up = score[i - 1, j]
            left = score[i, j - 1]
            best = max(diag, up, left)
            score[i, j] = best
            if diag == best:
                ptr[i, j] = 0
            elif up == best:
                ptr[i, j] = -1
            else:
                ptr[i, j] = 1
    if not return_alignment:
        return score[n, m]
    i, j = n, m
    pairs: list[tuple[int, int]] = []
    while i or j:
        d = ptr[i, j]
        if d == -1:
            i -= 1
        elif d == 1:
            j -= 1
        else:
            i -= 1
            j -= 1
            pairs.append((i, j))
    pairs.reverse()
    return score[n, m], pairs


def _to_object_grid(grid: list[list]) -> np.ndarray:
    """2D object array regardless of cell type (strings, bbox tuples) —
    np.array() would promote a grid of equal-length bboxes to a 3D array."""
    rows = len(grid)
    cols = len(grid[0]) if rows else 0
    out = np.empty((rows, cols), dtype=object)
    for i, row in enumerate(grid):
        for j, cell in enumerate(row):
            out[i, j] = tuple(cell) if isinstance(cell, list) else cell
    return out


def factored_2dmss(true_grid: list[list], pred_grid: list[list],
                   reward_fn=lcs_similarity) -> float:
    """Factored 2D most-similar-substructure f-score over two grids."""
    return factored_2dmss_full(true_grid, pred_grid, reward_fn)[0]


def factored_2dmss_full(true_grid: list[list], pred_grid: list[list],
                        reward_fn=lcs_similarity
                        ) -> tuple[float, float, float, float]:
    """(f, precision, recall, upper_bound) — the reference factored_2dmss
    contract (grits.py:167-221; the upper bound is min(row-only, col-only)
    alignment score passed through compute_fscore with the reference's own
    argument order, grits.py:207-210)."""
    t = _to_object_grid(true_grid)
    p = _to_object_grid(pred_grid)
    tr, tc = t.shape if t.size else (0, 0)
    pr, pc = p.shape if p.size else (0, 0)
    num_true = tr * tc
    num_pos = pr * pc
    if num_true == 0 or num_pos == 0:
        f, prec, rec = fscore(0.0, num_true, num_pos)
        return f, prec, rec, f

    # dense reward tensor R[ti, tj, pi, pj]; real tables repeat cell values
    # (spans, empty cells, units) so memoize per distinct (gt, pred) pair —
    # turns the O((r·c)²) reward pass into O(distinct_pairs) kernel calls
    cache: dict[tuple, float] = {}
    R = np.empty((tr, tc, pr, pc))
    for ti in range(tr):
        for tj in range(tc):
            cell = t[ti, tj]
            for pi in range(pr):
                for pj in range(pc):
                    key = (cell, p[pi, pj])
                    r = cache.get(key)
                    if r is None:
                        r = reward_fn(key[0], key[1])
                        cache[key] = r
                    R[ti, tj, pi, pj] = r

    # row alignment: reward(row ti, row pi) = best 1D column alignment
    row_reward = np.empty((tr, pr))
    for ti in range(tr):
        for pi in range(pr):
            row_reward[ti, pi] = _align(R[ti, :, pi, :])
    row_total, row_pairs = _align(row_reward, return_alignment=True)

    # column alignment on the transposed tensor
    col_reward = np.empty((tc, pc))
    for tj in range(tc):
        for pj in range(pc):
            col_reward[tj, pj] = _align(R[:, tj, :, pj])
    col_total, col_pairs = _align(col_reward, return_alignment=True)

    # reference grits.py:207-210 passes (num_pos, num_true) in that order
    upper_bound, _, _ = fscore(min(row_total, col_total), num_pos, num_true)

    match = 0.0
    for ti, pi in row_pairs:
        for tj, pj in col_pairs:
            match += R[ti, tj, pi, pj]
    f, prec, rec = fscore(match, num_true, num_pos)
    return f, prec, rec, upper_bound


# Executor-protection bound: factored 2D-MSS is O((r·c)²) in time AND the
# dense reward tensor is (r·c)²·8 bytes — the bound must cap the grid AREA,
# not rows/cols independently (a 200×60 "within-bounds" pair would allocate
# a 1.07 GiB tensor and run ~1.4e8 Python loop iterations, hanging the very
# executor the bound claims to protect). MAX_GRID_AREA=2400 keeps the
# worst-case tensor at 2400²·8 ≈ 46 MB / ~6M reward calls — generous for any
# real document table (an 80-row × 30-col table is area 2400).
MAX_GRID_ROWS = 200
MAX_GRID_COLS = 60
MAX_GRID_AREA = 2400


def _clip_dims(rows: int, cols: int) -> tuple[int, int]:
    """(keep_rows, keep_cols) under the executor-protection bound — the ONE
    home of the clipping rule, shared by _bound (which applies it) and
    grits_grid_clipped (which flags it) so the lineage signal can never
    desynchronize from the clipping actually applied."""
    keep_cols = min(cols, MAX_GRID_COLS)
    keep_rows = min(rows, MAX_GRID_ROWS)
    if keep_cols > 0:
        keep_rows = min(keep_rows, max(1, MAX_GRID_AREA // keep_cols))
    return keep_rows, keep_cols


def _bound(grid: list[list[str]]) -> list[list[str]]:
    rows = len(grid)
    cols = len(grid[0]) if grid else 0
    keep_rows, keep_cols = _clip_dims(rows, cols)
    if keep_rows == rows and keep_cols == cols:
        return grid
    return [row[:keep_cols] for row in grid[:keep_rows]]


def grits_con_from_html(true_html: str, pred_html: str) -> float:
    """GRITS_Con over two HTML tables (reference grits.py:510-525)."""
    tg = _bound(cells_to_text_grid(html_table_to_cells(true_html)))
    pg = _bound(cells_to_text_grid(html_table_to_cells(pred_html)))
    return factored_2dmss(tg, pg)


def grits_grid_clipped(html: str) -> bool:
    """True when a table's grid exceeds the executor-protection bound and
    its GRITS score was computed on the truncated grid — the lineage
    signal a pipeline counts so clipping is observable, never silent.
    Checks the bound arithmetic on the cell-span dims directly instead of
    materializing the (possibly huge) grid — the whole point of flagging
    oversize tables is not to build them a second time."""
    cells = html_table_to_cells(html)
    if not cells:
        return False
    rows = max(max(c["row_nums"]) for c in cells) + 1
    cols = max(max(c["column_nums"]) for c in cells) + 1
    keep_rows, keep_cols = _clip_dims(rows, cols)
    return keep_rows != rows or keep_cols != cols


def cells_to_relspan_grid(cells: list[dict]) -> list[list[str]]:
    """Relative-span grid for GRITS_Top (reference grits.py:274-298): each
    grid position carries the bbox of its owning cell relative to the
    position, in grid units — "[0, 0, 1, 1]" for a non-spanning cell.
    Stringified (the reference's reward str()-ifies the lists too)."""
    if not cells:
        return [[]]
    num_rows = max(max(c["row_nums"]) for c in cells) + 1
    num_cols = max(max(c["column_nums"]) for c in cells) + 1
    grid = [["" for _ in range(num_cols)] for _ in range(num_rows)]
    for c in cells:
        min_r, max_r = min(c["row_nums"]), max(c["row_nums"]) + 1
        min_k, max_k = min(c["column_nums"]), max(c["column_nums"]) + 1
        for r in c["row_nums"]:
            for k in c["column_nums"]:
                grid[r][k] = str([min_k - k, min_r - r, max_k - k, max_r - r])
    return grid


def edit_distance_similarity(a: str, b: str) -> float:
    """1 - lev/maxlen, both-empty → 1.0 (reference grits.py:399-407)."""
    a, b = str(a), str(b)
    max_len = max(len(a), len(b))
    if max_len == 0:
        return 1.0
    # O(len^2) DP; grids are small (span strings ~12 chars)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return 1.0 - prev[-1] / max_len


def grits_top_from_html(true_html: str, pred_html: str) -> float:
    """GRITS_Top (topology) over two HTML tables: factored 2D-MSS on the
    relative-span grids with edit-distance reward (grits.py:410-428)."""
    tg = _bound(cells_to_relspan_grid(html_table_to_cells(true_html)))
    pg = _bound(cells_to_relspan_grid(html_table_to_cells(pred_html)))
    return factored_2dmss(tg, pg, reward_fn=edit_distance_similarity)


def cells_to_grid(cells: list[dict], key: str = "cell_text") -> list[list]:
    """Grid of per-position cell features (reference grits.py:252-272):
    'cell_text' feeds GRITS_Con, 'bbox' feeds GRITS_Loc. Unoccupied grid
    positions are 0 (the reference leaves np.zeros entries in place)."""
    if not cells:
        return [[]]
    num_rows = max(max(c["row_nums"]) for c in cells) + 1
    num_cols = max(max(c["column_nums"]) for c in cells) + 1
    grid: list[list] = [[0 for _ in range(num_cols)] for _ in range(num_rows)]
    for c in cells:
        for r in c["row_nums"]:
            for k in c["column_nums"]:
                grid[r][k] = c[key]
    return grid


def bbox_iou(bbox1, bbox2) -> float:
    """Reference grits.py iou (lines ~395-412): intersection area over the
    area of the *enclosing* rectangle (fitz include_rect — the smallest rect
    containing both), not the set-union area. Mirrored exactly so GRITS_Loc
    scores match."""
    ix = max(0.0, min(bbox1[2], bbox2[2]) - max(bbox1[0], bbox2[0]))
    iy = max(0.0, min(bbox1[3], bbox2[3]) - max(bbox1[1], bbox2[1]))
    inter = ix * iy
    ex = max(bbox1[2], bbox2[2]) - min(bbox1[0], bbox2[0])
    ey = max(bbox1[3], bbox2[3]) - min(bbox1[1], bbox2[1])
    enclosing = ex * ey
    return inter / enclosing if enclosing > 0 else 0.0


def _iou_reward(a, b) -> float:
    """IoU reward tolerant of the grid's 0 fill (no cell at a position)."""
    if not isinstance(a, (tuple, list)) or not isinstance(b, (tuple, list)):
        return 0.0
    return bbox_iou(a, b)


def grits_loc(true_bbox_grid: list[list], pred_bbox_grid: list[list]) -> float:
    """GRITS_Loc: factored 2D-MSS over grids of cell bounding boxes with
    IoU reward (reference grits.py:431-436)."""
    return factored_2dmss(_bound(true_bbox_grid), _bound(pred_bbox_grid),
                          reward_fn=_iou_reward)
