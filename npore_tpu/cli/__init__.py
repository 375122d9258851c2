"""Command-line entry points mirroring the reference CLIs:
realign, standardize-vcf, bed, purity, filter."""
