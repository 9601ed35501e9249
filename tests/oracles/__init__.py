"""Float64 numpy oracles of the reference's native DSP stack.

pysptk / pyworld do NOT install in this image (no network egress — the
recorded `pip install pyworld pysptk` attempt fails with DNS resolution
errors; there is no vendored source to build either). These modules are
standalone float64 re-implementations of the *published algorithms* those
libraries implement, written to converge to machine precision so the JAX
kernels in `exemplars_vc_tpu` can be pinned against them. They are
deliberately slow, scalar-python-loop numpy code: clarity and independence
from the production implementation are the point.
"""
