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


def fscore(match_score: float, num_true: int, num_positives: int) -> float:
    """Precision 1 when no predictions, recall 1 when no truth, F 0 at 0+0."""
    precision = match_score / num_positives if num_positives > 0 else 1.0
    recall = match_score / num_true if num_true > 0 else 1.0
    if precision + recall <= 0:
        return 0.0
    return 2 * precision * recall / (precision + recall)


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


def factored_2dmss(true_grid: list[list[str]], pred_grid: list[list[str]],
                   reward_fn=lcs_similarity) -> float:
    """Factored 2D most-similar-substructure f-score over two text grids."""
    t = np.array(true_grid, dtype=object)
    p = np.array(pred_grid, dtype=object)
    if t.ndim == 1:
        t = t.reshape(1, -1)
    if p.ndim == 1:
        p = p.reshape(1, -1)
    tr, tc = t.shape if t.size else (0, 0)
    pr, pc = p.shape if p.size else (0, 0)
    num_true = tr * tc
    num_pos = pr * pc
    if num_true == 0 or num_pos == 0:
        return fscore(0.0, num_true, num_pos)

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
    _, row_pairs = _align(row_reward, return_alignment=True)

    # column alignment on the transposed tensor
    col_reward = np.empty((tc, pc))
    for tj in range(tc):
        for pj in range(pc):
            col_reward[tj, pj] = _align(R[:, tj, :, pj])
    _, col_pairs = _align(col_reward, return_alignment=True)

    match = 0.0
    for ti, pi in row_pairs:
        for tj, pj in col_pairs:
            match += R[ti, tj, pi, pj]
    return fscore(match, num_true, num_pos)


# Executor-protection bound: factored 2D-MSS is O((r·c)²); a pathological
# (or adversarial) 10k-row table must not hang a task. Grids are truncated
# to this many rows/cols — far above any real document table.
MAX_GRID_ROWS = 200
MAX_GRID_COLS = 60


def _bound(grid: list[list[str]]) -> list[list[str]]:
    if len(grid) > MAX_GRID_ROWS or (grid and len(grid[0]) > MAX_GRID_COLS):
        return [row[:MAX_GRID_COLS] for row in grid[:MAX_GRID_ROWS]]
    return grid


def grits_con_from_html(true_html: str, pred_html: str) -> float:
    """GRITS_Con over two HTML tables (reference grits.py:510-525)."""
    tg = _bound(cells_to_text_grid(html_table_to_cells(true_html)))
    pg = _bound(cells_to_text_grid(html_table_to_cells(pred_html)))
    return factored_2dmss(tg, pg)


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
