"""Host-side I/O: SAM/BAM/FASTA/VCF/BED codecs and the pileup engine.

These replace the reference's external native dependencies (pysam/htslib,
samtools mpileup, bedtools, tabix/bgzip; reference: requirements.txt:1,
src/bam.pyx:303, src/bed.py:95-141, src/vcf.py:132-133) with self-contained
implementations.
"""
