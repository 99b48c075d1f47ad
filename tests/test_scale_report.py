"""The BENCH_scale.md section splicer (`bench_scale._append_named_section`).

Every scale-measurement runner rewrites one named section of a shared
markdown report. The r13 bug class under test: a rewrite that bounds
its own section by a hand-listed set of following headings deletes any
UNLISTED section sitting in between (the `--ivfpq-persist` refresh ate
the freshly measured compaction tables). The fixed contract: a section
ends at the next `## ` heading, whatever it is — replacement is
in-place and can never consume a neighbor; `next_markers` only places
a first-time section.
"""

import bench_scale

DOC = """# Report

intro text

## Alpha

alpha body

## Beta: with a subtitle

beta body line 1
beta body line 2

## Gamma

gamma body

## Appendix: skew-adversarial stress

appendix body
"""


def _headings(path):
    return [
        line.rstrip("\n")
        for line in open(path)
        if line.startswith("## ")
    ]


def _write(tmp_path):
    p = tmp_path / "report.md"
    p.write_text(DOC)
    return str(p)


def test_replace_in_place_eats_no_neighbor(tmp_path):
    """Rewriting Beta with a marker list that SKIPS Gamma (the exact
    r13 failure shape) must leave Gamma intact and Beta in place."""
    p = _write(tmp_path)
    bench_scale._append_named_section(
        ["", "## Beta: with a subtitle", "", "NEW BETA", ""],
        "## Beta",
        next_markers=["## Appendix: skew-adversarial stress"],
        md_path=p,
    )
    heads = _headings(p)
    assert heads == [
        "## Alpha",
        "## Beta: with a subtitle",
        "## Gamma",
        "## Appendix: skew-adversarial stress",
    ], heads
    text = open(p).read()
    assert "NEW BETA" in text
    assert "beta body line 1" not in text  # old body replaced
    assert "gamma body" in text  # neighbor untouched


def test_replace_is_idempotent(tmp_path):
    p = _write(tmp_path)
    sec = ["", "## Gamma", "", "G2", ""]
    bench_scale._append_named_section(sec, "## Gamma", md_path=p)
    once = open(p).read()
    bench_scale._append_named_section(sec, "## Gamma", md_path=p)
    assert open(p).read() == once


def test_new_section_placed_before_first_present_marker(tmp_path):
    p = _write(tmp_path)
    bench_scale._append_named_section(
        ["", "## Delta", "", "delta body", ""],
        "## Delta",
        next_markers=["## Nonexistent", "## Gamma"],
        md_path=p,
    )
    heads = _headings(p)
    assert heads.index("## Delta") == heads.index("## Gamma") - 1


def test_new_section_defaults_before_appendix(tmp_path):
    p = _write(tmp_path)
    bench_scale._append_named_section(
        ["", "## Delta", "", "delta body", ""], "## Delta", md_path=p
    )
    heads = _headings(p)
    assert heads[-1].startswith("## Appendix")
    assert heads[-2] == "## Delta"


def test_last_section_replacement_keeps_tail_empty(tmp_path):
    """Replacing the final section (nothing after it) must not raise
    or duplicate content."""
    p = _write(tmp_path)
    bench_scale._append_named_section(
        ["", "## Appendix: skew-adversarial stress", "", "new appendix", ""],
        "## Appendix: skew-adversarial stress",
        md_path=p,
    )
    text = open(p).read()
    assert text.count("## Appendix") == 1
    assert "new appendix" in text and "appendix body" not in text


def test_marker_in_prose_is_not_a_heading(tmp_path):
    """A mid-line mention of a heading string (e.g. prose citing
    '## Gamma') must not be mistaken for the section boundary."""
    p = tmp_path / "report.md"
    p.write_text(DOC.replace("beta body line 2", "see the ## Gamma table"))
    bench_scale._append_named_section(
        ["", "## Beta: with a subtitle", "", "NEW", ""],
        "## Beta",
        md_path=str(p),
    )
    heads = _headings(str(p))
    assert heads.count("## Gamma") == 1
    assert "gamma body" in open(str(p)).read()
