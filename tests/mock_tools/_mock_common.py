"""Shared bootstrap for the mock external tools (minimap2/samtools/...).

These stubs stand in for tools absent from this image so the shell
pipelines (scripts/align.sh, scripts/realign_pipeline.sh, scripts/happy.sh)
can be *executed* in-suite, not just arg-checked (reference invocations:
scripts/align.sh:13-60, scripts/realign_pipeline.sh:214-423). Where a real
behavior is cheap they implement it functionally on npore_tpu's own IO
stack (sort/calmd/index/fastq, phase/haplotag, tabix); the aligner itself
is a pass-through that re-emits each read's original alignment, carried
through the fastq as a MOCKSRC comment.
"""
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

os.environ.setdefault("NPORE_PLATFORM", "cpu")


def open_reads(path):
    from npore_tpu.io.bam import open_alignment_file
    from npore_tpu.io.sam import SamReader
    if path.endswith(".sam"):
        return SamReader(path)
    return open_alignment_file(path)


def reader_refs(rd):
    return list(rd.references), [int(x) for x in rd.lengths]
