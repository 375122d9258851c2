"""Device kernels and vectorized host ops: n-polymer scan, banded DP,
traceback."""
