"""Unit tests for the pure kernels: pdf layout, tables, json repair, fields,
classify, textstats. Edge cases mirror the reference's observed semantics
(SURVEY.md §5.2 item 3)."""
from __future__ import annotations

import math

from docext_spark.core.classify import classify
from docext_spark.core.convert import detect_payload_kind, turn_to_markdown
from docext_spark.core.fields import extract_fields, normalize_field_name
from docext_spark.core.jsonrepair import merge_list_of_dicts, repair_json
from docext_spark.core.pdflayout import pdf_blocks_to_markdown
from docext_spark.core.tables import (html_table_to_cells, parse_pipe_table,
                                      pipe_table_to_html, slice_pipe_region)
from docext_spark.core import textstats as ts


# ---- pdf layout (X3) -------------------------------------------------------

def test_pdf_blocks_sorted_with_page_headers():
    text = "2|10|0|second page\n1|200|0|below\n1|100|0|above"
    out = pdf_blocks_to_markdown(text)
    assert out["md"] == ("Page 1 of 2\nabove\nbelow\n"
                         "Page 2 of 2\nsecond page")
    assert out["n_pages"] == 2 and out["n_blocks"] == 3


def test_pdf_x_breaks_y_ties():
    text = "1|100|50|right\n1|100|10|left"
    assert pdf_blocks_to_markdown(text)["md"] == "Page 1 of 1\nleft\nright"


# ---- pipe tables (X5) ------------------------------------------------------

def test_pipe_slice_semantics():
    # reference extract.py:118 — first '|' to last '|' inclusive
    text = "preamble | a | b |\n|---|---|\n| 1 | 2 | trailing"
    region = slice_pipe_region(text)
    assert region.startswith("|") and region.endswith("|")
    assert "preamble" not in region and "trailing" not in region


def test_pipe_table_parse():
    t = "| name | value |\n|---|---|\n| a | 1 |\n| b | 2 |"
    parsed = parse_pipe_table(t)
    assert parsed["columns"] == ["name", "value"]
    assert parsed["rows"] == [["a", "1"], ["b", "2"]]


def test_pipe_table_to_html():
    t = "| c1 | c2 |\n|---|---|\n| x | y |"
    assert pipe_table_to_html(t) == ("<table><tr><th>c1</th><th>c2</th></tr>"
                                     "<tr><td>x</td><td>y</td></tr></table>")


def test_html_grid_rowspan_colspan():
    html = ('<table><tr><td rowspan="2">A</td><td>B</td></tr>'
            '<tr><td>C</td></tr>'
            '<tr><td colspan="2">D</td></tr></table>')
    cells = html_table_to_cells(html)
    a = next(c for c in cells if c["cell_text"] == "A")
    assert a["row_nums"] == [0, 1] and a["column_nums"] == [0]
    c = next(c for c in cells if c["cell_text"] == "C")
    assert c["row_nums"] == [1] and c["column_nums"] == [1]
    d = next(c for c in cells if c["cell_text"] == "D")
    assert d["column_nums"] == [0, 1]


def test_html_grid_thead_header_flag():
    html = ("<table><thead><tr><td>h</td></tr></thead>"
            "<tr><td>v</td></tr></table>")
    cells = html_table_to_cells(html)
    assert cells[0]["is_column_header"] is True
    assert cells[1]["is_column_header"] is False


# ---- json repair -----------------------------------------------------------

def test_repair_trailing_comma():
    assert repair_json('{"a": 1,}') == {"a": 1}


def test_repair_single_quotes():
    assert repair_json("{'a': 'x'}") == {"a": "x"}


def test_repair_fences_and_unquoted_keys():
    assert repair_json('```json\n{a: 1}\n```') == {"a": 1}


def test_merge_dup_keys_to_list():
    # reference benchmark.py:638-652
    merged = merge_list_of_dicts([{"k": 1}, {"k": 2}, {"k": 3}, {"j": "x"}])
    assert merged == {"k": [1, 2, 3], "j": "x"}


def test_merge_ignores_non_dicts():
    assert merge_list_of_dicts([{"a": 1}, "junk", 7]) == {"a": 1}


# ---- fields (X4/X6) --------------------------------------------------------

def test_field_normalization():
    # reference prompts.py:9-19
    assert normalize_field_name("Invoice Number") == "invoice_number"


def test_extract_fields_planted():
    text = "invoice_number: INV-42\nbuyer_name: ACME Corp\nnoise line"
    out = extract_fields(text, ["invoice_number", "buyer_name", "seller_name"])
    assert out[0]["answer"] == "INV-42" and out[0]["confidence"] == "High"
    assert out[1]["answer"] == "ACME Corp"
    # missing → "" / Low (reference extract.py:89-90)
    assert out[2]["answer"] == "" and out[2]["confidence"] == "Low"


def test_extract_fields_multivalue():
    text = "tag: one\ntag: two"
    out = extract_fields(text, ["tag"])
    assert out[0]["answers"] == ["one", "two"]
    assert out[0]["answer"] == "one"
    assert out[0]["confidence"] == "Low"  # ambiguous


def test_extract_fields_spaced_label():
    out = extract_fields("Buyer Name: Jane", ["buyer_name"])
    assert out[0]["answer"] == "Jane"


# ---- classify (X7) ---------------------------------------------------------

def test_classify_argmax_and_tiebreak():
    assert classify("urgent urgent low", ["low", "urgent"]) == "urgent"
    # tie → first label in vocab order
    assert classify("alpha beta", ["beta", "alpha"]) == "beta"
    assert classify("", []) == ""


# ---- textstats --------------------------------------------------------------

def test_token_count_edges():
    assert ts.token_count("") == 0
    assert ts.token_count("   ") == 0
    assert ts.token_count("a  b\tc") == 3


def test_fingerprint_normalization():
    assert ts.fingerprint("A  b") == ts.fingerprint("a b")


def test_lang_id():
    assert ts.lang_id("the cat is on the mat and it is warm") == "en"
    assert ts.lang_id("zzz qqq xxx vvv") == "unknown"


def test_quality_bounds():
    q = ts.quality_score("the quick brown fox is on a mat " * 20)
    assert 0.0 <= q <= 1.0


def test_shingles_and_minhash():
    assert ts.word_shingles("a b c d", 3) == ["a b c", "b c d"]
    assert ts.word_shingles("a b", 3) == ["a b"]
    assert ts.word_shingles("", 3) == []
    sig = ts.minhash_signature("a b c d e f", num_hashes=4)
    # 8-hex-char digest slices (one sha256 funds 8 permutations)
    assert len(sig) == 4 and all(len(s) == 8 for s in sig)
    # identical text → identical signature
    assert sig == ts.minhash_signature("a b c d e f", num_hashes=4)


def test_simhash_similar_texts_close():
    a = ts.simhash64("the quick brown fox jumps over the lazy dog")
    b = ts.simhash64("the quick brown fox jumps over the lazy cat")
    c = ts.simhash64("completely different words entirely unrelated")
    ham_ab = bin((a ^ b) & ((1 << 64) - 1)).count("1")
    ham_ac = bin((a ^ c) & ((1 << 64) - 1)).count("1")
    assert ham_ab < ham_ac


# ---- dispatch ----------------------------------------------------------------

def test_detect_kinds():
    assert detect_payload_kind('{"a": 1}') == "json_payload"
    assert detect_payload_kind("1|10|0|x\n1|20|0|y") == "pdf_text"
    assert detect_payload_kind("<p>x</p>") == "html"
    assert detect_payload_kind("| a | b |\n|---|---|\n| 1 | 2 |") == "md_table"
    assert detect_payload_kind("plain words") == "plain"
    assert detect_payload_kind("") == "plain"


def test_turn_to_markdown_broken_json_fallback():
    out = turn_to_markdown("{totally broken ][")
    assert out["parse_ok"] is False
    assert out["md"]  # error stub keeps the payload, never raises


def test_repair_json_apostrophes_in_double_quotes():
    """Apostrophes inside double-quoted values must not be mistaken for
    single-quote string delimiters (context-aware requoting)."""
    from docext_spark.core.jsonrepair import repair_json
    assert repair_json("{'q': \"don't\", 'r': \"can't\"}") == \
        {"q": "don't", "r": "can't"}
    assert repair_json('{"x": "it\'s fine", \'y\': 2}') == \
        {"x": "it's fine", "y": 2}
    assert repair_json("{'esc': 'a\\'b'}") == {"esc": "a'b"}
    assert repair_json("{'open") is None  # unterminated stays None


def test_grits_grid_bound_caps_area():
    """A 200x60 'within row/col bounds' grid must still be truncated: the
    dense reward tensor is (r*c)^2*8 bytes — area is the binding budget."""
    from docext_spark.core.grits import MAX_GRID_AREA, _bound
    big = [["x"] * 60 for _ in range(200)]
    out = _bound(big)
    assert len(out) * len(out[0]) <= MAX_GRID_AREA
    small = [["a", "b"], ["c", "d"]]
    assert _bound(small) is small  # untouched when inside the budget


def test_repair_python_constants():
    assert repair_json('{"a": True, "b": False, "c": None}') \
        == {"a": True, "b": False, "c": None}


def test_repair_bare_word_values():
    assert repair_json('{"status": ok, "b": done deal,}') \
        == {"status": "ok", "b": "done deal"}


def test_repair_concatenated_objects():
    # json_repair's multi-object recovery: a list, ready for merging
    out = repair_json('{"a": 1}{"a": 2}\n{"b": 3}')
    assert out == [{"a": 1}, {"a": 2}, {"b": 3}]
    assert merge_list_of_dicts(out) == {"a": [1, 2], "b": 3}


def test_repair_concatenated_after_fixes():
    # each concatenated object may itself need repairs
    assert repair_json("{'a': 1,}{b: True}") == [{"a": 1}, {"b": True}]


def test_repair_string_payloads_never_mangled():
    # constants / bare words INSIDE strings stay verbatim
    assert repair_json('{"t": "True story, None of it", "u": ok}') \
        == {"t": "True story, None of it", "u": "ok"}
    assert repair_json("{'t': 'True and False'}") == {"t": "True and False"}


def test_repair_well_formed_untouched():
    # stage-1 parse short-circuits: exotic-but-valid JSON is returned as-is
    assert repair_json('{"a": "x,}{", "n": 1e5, "i": Infinity}') \
        == {"a": "x,}{", "n": 1e5, "i": float("inf")}


def test_repair_free_text_stays_unparsed():
    """Code-review r5 #1: scalar streams must NOT become garbage lists —
    '2025-01-01' previously parsed as [2025, 0, 1, 0, 1]."""
    assert repair_json("2025-01-01") is None
    assert repair_json("version 2") is None
    assert repair_json("1 2 3") is None
    # single scalars still parse (plain json.loads path)
    assert repair_json("42") == 42


def test_repair_structural_regexes_skip_strings():
    """Code-review r5 #2: commas / key-shaped text INSIDE strings survive."""
    assert repair_json('{"t": "x,}", "n": 1,}') == {"t": "x,}", "n": 1}
    assert repair_json('{"t": "a, b: c", }') == {"t": "a, b: c"}
    assert repair_json("{'t': 'k: v,', }") == {"t": "k: v,"}


def test_repair_constants_only_standalone():
    """Code-review r5 #4: 'True story' is a bare string, not a half-cased
    boolean."""
    assert repair_json('{"a": True story}') == {"a": "True story"}
    assert repair_json('{"a": True, "b": [False, None]}') \
        == {"a": True, "b": [False, None]}
    assert repair_json('{"a": None of it,}') == {"a": "None of it"}
