"""--plot observability path (VERDICT r4 weak #6 / next #6): the
confusion-matrix and np-score PNG sets must be produced, non-empty, and
reachable through the CLI flag (reference behavior: src/bam.pyx:207-296
renders per-n confusion matrices, src/aln.pyx:100-172 the score
matrices; the reference CLI plots then exits the same way).
"""
import os
import shutil

from npore_tpu.model.plots import (plot_confusion_matrices,
                                   plot_np_score_matrices)
from npore_tpu.model.scores import (calc_score_matrices,
                                    load_confusion_matrices)


def test_plot_functions_emit_png_set(tmp_path, stats_dir):
    subs, nps, inss, dels = load_confusion_matrices(stats_dir)
    sub_scores, np_scores, _, _ = calc_score_matrices(subs, nps, inss, dels)
    out = str(tmp_path / "plots")

    # small max_l / med_np_len keep the per-cell text annotation loops
    # hermetically cheap; the file set is the contract
    plot_confusion_matrices(subs, nps, inss, dels, out, max_n=2, max_l=4)
    plot_np_score_matrices(np_scores, out, max_n=2, med_np_len=4)

    expect = (["subs_cm.png", "indels_cm.png"]
              + [f"{n}-polymer_cm.png" for n in (1, 2)]
              + [f"{n}-polymer_scores.png" for n in (1, 2)])
    for name in expect:
        p = os.path.join(out, name)
        assert os.path.isfile(p), name
        assert os.path.getsize(p) > 1000, name     # a real rendered PNG


def test_cli_plot_flag(tmp_path, data_dir, stats_dir, monkeypatch):
    """`realign --plot` renders into stats_dir and exits 0 without
    realigning (cli/realign.py plot block). The render functions are
    stubbed to record their wiring — the real rendering is covered
    above; the CLI defaults (max_l=10, med_np_len=20) draw ~3k annotated
    cells and would dominate suite time."""
    from npore_tpu.cli import realign as cli
    sd = str(tmp_path / "stats")
    shutil.copytree(stats_dir, sd)

    calls = []
    monkeypatch.setattr(
        "npore_tpu.model.plots.plot_confusion_matrices",
        lambda subs, nps, inss, dels, out, max_n: calls.append(
            ("cm", out, max_n)))
    monkeypatch.setattr(
        "npore_tpu.model.plots.plot_np_score_matrices",
        lambda np_scores, out, max_n: calls.append(("np", out, max_n)))

    rc = cli.main(["--bam", os.path.join(data_dir, "reads.bam"),
                   "--ref", os.path.join(data_dir, "ref.fasta"),
                   "--out_prefix", str(tmp_path / "out"),
                   "--stats_dir", sd, "--plot"])
    assert rc == 0
    assert calls == [("cm", sd, 6), ("np", sd, 6)]
    # plot mode exits before realignment, like the reference
    assert not os.path.exists(str(tmp_path / "out") + ".sam")
