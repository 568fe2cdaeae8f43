"""Docs drift gates: the README's measured-numbers block must match what
tools/update_readme_bench.py would generate from the committed
BENCH_DETAIL.json (the r2 and r3 advisors both caught the hand-written
table drifting from the measurements)."""

import importlib.util
import os

ROOT = os.path.join(os.path.dirname(__file__), "..")


def _load_tool():
    spec = importlib.util.spec_from_file_location(
        "update_readme_bench",
        os.path.join(ROOT, "tools", "update_readme_bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_readme_bench_block_matches_bench_detail():
    import json
    tool = _load_tool()
    with open(os.path.join(ROOT, "BENCH_DETAIL.json")) as f:
        detail = json.load(f)
    with open(os.path.join(ROOT, "README.md")) as f:
        readme = f.read()
    assert tool.START in readme and tool.END in readme
    block = readme[readme.index(tool.START):
                   readme.index(tool.END) + len(tool.END)]
    assert block == tool.render(detail), (
        "README bench block is stale; run tools/update_readme_bench.py")
