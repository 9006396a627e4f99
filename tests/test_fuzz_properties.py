"""Property/fuzz tests (hypothesis): the kernels must be total functions —
any string payload converts deterministically, never raises (the per-page
error-stub contract, reference pdf2md.py:139-162: a bad payload yields a
stub, not a failure)."""
from __future__ import annotations

import json

from hypothesis import given, settings
from hypothesis import strategies as st

# derandomize: the driver's verify gate must be reproducible — a fresh
# random seed finding a novel input at gate time would be a flaky failure,
# not a controlled regression signal
settings.register_profile("ci", derandomize=True, deadline=None)
settings.load_profile("ci")

from docext_spark.core.convert import turn_to_markdown
from docext_spark.core.grits import factored_2dmss, lcs_similarity
from docext_spark.core.html2md import html_to_markdown
from docext_spark.core.jsonrepair import merge_list_of_dicts, repair_json
from docext_spark.core.tables import html_table_to_cells, parse_pipe_table
from docext_spark.core import textstats as ts

TEXT = st.text(max_size=400)
TAGGY = st.text(
    alphabet=st.sampled_from(list("<>/abcdiv ptrh123=\"'&;#!-\n|{}[],:")),
    max_size=300)


@given(TEXT | TAGGY)
@settings(max_examples=300, deadline=None)
def test_turn_to_markdown_total_and_deterministic(s):
    out1 = turn_to_markdown(s)
    out2 = turn_to_markdown(s)
    assert out1 == out2
    assert isinstance(out1["md"], str)
    assert out1["blocks_kept"] >= 0 and out1["blocks_dropped"] >= 0
    assert out1["classifier_decisions"] >= out1["blocks_kept"]
    for _label, start, end in out1["spans"]:
        assert 0 <= start <= end <= len(s)


@given(TAGGY)
@settings(max_examples=300, deadline=None)
def test_html_and_table_parsers_never_raise(s):
    html_to_markdown(s)
    html_table_to_cells(s)
    parse_pipe_table(s)


@given(TEXT)
@settings(max_examples=200, deadline=None)
def test_repair_json_total(s):
    out = repair_json(s)
    if out is not None:
        json.dumps(out)  # parse result is always JSON-serializable
    merge_list_of_dicts([{"a": 1}, {"a": 2}])


@given(st.text(max_size=80), st.text(max_size=80))
@settings(max_examples=200, deadline=None)
def test_lcs_similarity_bounds_and_symmetry(a, b):
    s = lcs_similarity(a, b)
    assert 0.0 <= s <= 1.0
    assert abs(lcs_similarity(b, a) - s) < 1e-12
    assert lcs_similarity(a, a) == 1.0


@given(st.lists(st.lists(st.text(max_size=6), min_size=1, max_size=3),
                min_size=1, max_size=3),
       st.lists(st.lists(st.text(max_size=6), min_size=1, max_size=3),
                min_size=1, max_size=3))
@settings(max_examples=60, deadline=None)
def test_grits_bounds(gt, pred):
    width = max(len(r) for r in gt)
    gt = [r + [""] * (width - len(r)) for r in gt]
    width = max(len(r) for r in pred)
    pred = [r + [""] * (width - len(r)) for r in pred]
    s = factored_2dmss(gt, pred)
    assert 0.0 <= s <= 1.0 + 1e-12
    assert factored_2dmss(gt, gt) == 1.0


@given(TEXT)
@settings(max_examples=200, deadline=None)
def test_textstats_total(s):
    assert ts.token_count(s) >= 0
    assert 0.0 <= ts.quality_score(s) <= 1.0 + 1e-9
    assert ts.lang_id(s) in ("en", "de", "fr", "es", "unknown")
    assert len(ts.fingerprint(s)) == 64
    sig = ts.minhash_signature(s, num_hashes=3)
    assert len(sig) == 3
    h = ts.simhash64(s)
    assert -(1 << 63) <= h < (1 << 63)


@given(st.binary(max_size=256))
@settings(max_examples=300, deadline=None)
def test_imagehdr_parse_total(payload):
    """parse_dims must be total on arbitrary bytes (a 100TB scan cannot die
    on one corrupt blob): never raises, and any result is a positive-dim
    triple whose format matches the sniff."""
    from docext_spark.core import imagehdr as ih
    out = ih.parse_dims(payload)
    if out is not None:
        fmt, w, h = out
        assert fmt in ("png", "jpeg", "gif")
        assert w > 0 and h > 0
        assert ih.sniff_format(payload) == fmt


@given(st.integers(1, 65535), st.integers(1, 65535), st.binary(max_size=64))
@settings(max_examples=100, deadline=None)
def test_imagehdr_builders_roundtrip(w, h, filler):
    from docext_spark.core import imagehdr as ih
    assert ih.parse_dims(ih.make_png(w, h, filler)) == ("png", w, h)
    assert ih.parse_dims(ih.make_jpeg(w, h, filler)) == ("jpeg", w, h)
    assert ih.parse_dims(ih.make_gif(w, h, filler)) == ("gif", w, h)
