# Reproducible environment for npore-tpu (parity with the reference's
# container story, /root/reference/Dockerfile — ubuntu + toolchain + the
# package installed; here the stack is JAX/XLA instead of Cython, and the
# native C++ host kernels build lazily at import via g++ + ctypes).
#
#   docker build -t npore-tpu .
#   docker run --rm npore-tpu python -m pytest tests/ -q        # hermetic CPU
#   docker run --rm npore-tpu npore-realign --help
#
# On TPU hosts, base on a libtpu-enabled image instead and install
# jax[tpu]; everything in this repo runs unchanged (device selection is
# runtime-automatic; tests force the CPU backend themselves).
FROM python:3.11-slim-bookworm

ENV LANG=C.UTF-8 LC_ALL=C.UTF-8 PIP_NO_CACHE_DIR=1 \
    JAX_PLATFORMS=cpu

# g++/make: the ctypes-bound native kernels (npore_tpu/native/*.cpp)
# compile on first import; zlib headers for any local BGZF tooling.
RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make zlib1g-dev \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /opt/npore-tpu

# pinned runtime + test deps (the image is the reproducibility story;
# pyproject keeps loose ranges for library consumers)
RUN pip install "jax==0.4.38" "numpy<3" pytest matplotlib

COPY pyproject.toml README.md ./
COPY npore_tpu ./npore_tpu
COPY guppy5_stats ./guppy5_stats
COPY scripts ./scripts
COPY tests ./tests
COPY bench.py __graft_entry__.py ./

RUN pip install -e . && python -c "import npore_tpu, jax; \
    from npore_tpu.native import get_lib; \
    assert get_lib() is not None, 'native kernel build failed'"

CMD ["python", "-m", "pytest", "tests/", "-q"]
