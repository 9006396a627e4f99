from __future__ import annotations

from docext_spark.core.html2md import escape_display_tags, html_to_markdown


def test_headings_and_paragraphs():
    out = html_to_markdown("<h1>Title</h1><p>Body text here.</p>")
    assert out["md"] == "# Title\n\nBody text here."
    assert out["blocks_kept"] == 2


def test_boilerplate_subtrees_dropped():
    html = ("<nav><a href='/'>home</a><a href='/b'>b</a></nav>"
            "<script>var x=1;</script><style>.a{}</style>"
            "<p>Main content stays.</p>"
            "<footer>copyright</footer>")
    out = html_to_markdown(html)
    assert out["md"] == "Main content stays."
    assert out["blocks_dropped"] >= 4
    assert out["classifier_decisions"] > out["blocks_kept"]


def test_link_farm_dropped_by_density():
    html = ("<p>Real paragraph with plenty of ordinary words in it.</p>"
            "<div><a href='/1'>spam one</a>, <a href='/2'>spam two</a>, "
            "<a href='/3'>spam three</a></div>")
    out = html_to_markdown(html)
    assert "Real paragraph" in out["md"]
    assert "spam one" not in out["md"]


def test_long_link_block_kept():
    # link-density rule only drops SHORT blocks (trafilatura-style)
    body = "word " * 60
    html = f"<div><a href='/x'>{body}</a></div>"
    out = html_to_markdown(html)
    assert "word" in out["md"]


def test_table_reemitted_as_html():
    html = ('<table><tr><th>a</th><th>b</th></tr>'
            '<tr><td rowspan="2">x</td><td>1</td></tr></table>')
    out = html_to_markdown(html)
    assert out["md"] == ('<table><tr><th>a</th><th>b</th></tr>'
                         '<tr><td rowspan="2">x</td><td>1</td></tr></table>')


def test_checkboxes():
    out = html_to_markdown(
        '<p>yes <input type="checkbox" checked> no <input type="checkbox"></p>')
    assert "☑" in out["md"] and "☐" in out["md"]


def test_img_placeholder_and_escape():
    out = html_to_markdown("<p>before <img src='x.png'> after</p>")
    assert "<img>" in out["md"]
    assert escape_display_tags(out["md"]).count("&lt;img&gt;") == 1


def test_entities_unescaped():
    out = html_to_markdown("<p>a &amp; b &lt;c&gt;</p>")
    assert out["md"] == "a & b <c>"


def test_lists_and_blockquote():
    out = html_to_markdown("<ul><li>one</li><li>two</li></ul>"
                           "<blockquote>quoted</blockquote>")
    assert "- one" in out["md"] and "- two" in out["md"]
    assert "> quoted" in out["md"]


def test_spans_point_into_source():
    src = "<h1>Title</h1><p>Body</p>"
    out = html_to_markdown(src)
    for label, start, end in out["spans"]:
        assert 0 <= start <= end <= len(src)
    # first span covers "Title"
    label, start, end = out["spans"][0]
    assert "Title" in src[start:end]


def test_empty_and_whitespace():
    assert html_to_markdown("")["md"] == ""
    assert html_to_markdown("   ")["md"] == ""


def test_watermark_and_page_number_tags():
    # docext output contract: pdf2md.py:90
    html = ('<div class="watermark">OFFICIAL COPY</div>'
            '<p>Body text.</p>'
            '<span class="pageno">14</span>')
    out = html_to_markdown(html)
    assert "<watermark>OFFICIAL COPY</watermark>" in out["md"]
    assert "<page_number>14</page_number>" in out["md"]
    assert "Body text." in out["md"]


def test_plain_inline_span_stays_in_paragraph():
    out = html_to_markdown("<p>a <span>b</span> c</p>")
    assert out["md"] == "a b c"
    assert out["blocks_kept"] == 1


def test_self_closing_drop_tag_does_not_swallow_document():
    out = html_to_markdown('<iframe src="x"/><p>Main content here</p>'
                           '<p>More text</p>')
    assert "Main content here" in out["md"] and "More text" in out["md"]


def test_unclosed_options_do_not_swallow_document():
    out = html_to_markdown("<select><option>a<option>b</select>"
                           "<p>Visible body text</p>")
    assert out["md"] == "Visible body text"


def test_nested_table_flattens_into_outer_cell():
    out = html_to_markdown(
        "<table><tr><td>outer start"
        "<table><tr><td>inner</td></tr></table>"
        "outer end</td></tr></table>")
    assert out["md"] == ("<table><tr><td>outer startinnerouter end</td>"
                         "</tr></table>")


def test_garbage_rowspan_does_not_collapse_document():
    out = html_to_markdown('<h1>Title</h1><table><tr>'
                           '<td rowspan="50%">x</td></tr></table><p>body</p>')
    assert "# Title" in out["md"]
    assert "<table>" in out["md"]
    assert "body" in out["md"]


def test_deterministic():
    html = "<div><p>x</p><nav><a href='/'>l</a></nav></div>"
    assert html_to_markdown(html) == html_to_markdown(html)


def test_unclosed_table_cells_keep_text():
    """</td> and </tr> are optional per the HTML spec — implied closes must
    not lose cell text (real pages omit them constantly)."""
    from docext_spark.core.html2md import html_to_markdown
    r = html_to_markdown("<table><tr><td>a<td>b</tr><tr><td>c</table>")
    assert r["md"] == ("<table><tr><td>a</td><td>b</td></tr>"
                       "<tr><td>c</td></tr></table>")


def test_unquoted_url_trailing_slash_is_not_self_close():
    """href=http://x.com/ must not synthesize </a> — the anchor text must
    still count as link chars for the boilerplate filter."""
    from docext_spark.core.html2md import html_to_markdown
    r = html_to_markdown(
        '<p><a href=http://example.com/>nav nav nav nav nav</a></p>'
        '<p>body text here with many words to keep</p>')
    assert r["blocks_dropped"] == 1  # the link farm IS dropped
    # while a genuine self-close still closes ('<div/>' emits the end event)
    assert html_to_markdown('<div/>x<br/>y')["md"] == "x y"


def test_td_without_tr_is_total():
    from docext_spark.core.grits import grits_con_from_html
    from docext_spark.core.tables import html_table_to_cells
    cells = html_table_to_cells("<table><td>a</td><td>b</td></table>")
    assert [c["row_nums"] for c in cells] == [[0], [0]]
    assert grits_con_from_html("<table><td>a</td></table>",
                               "<table><tr><td>a</td></tr></table>") == 1.0
