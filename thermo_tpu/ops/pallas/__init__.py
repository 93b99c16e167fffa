"""Pallas TPU kernels for the hot ops.

Engineering notes from v5e bring-up (honest, fetch-synchronized timings):

  * The hash-grid gather is THE hot op (~95% of a ThermoNeRF train step).
    On this hardware/toolchain, XLA's native row gather (~6.5ns/element) is
    the best available implementation: Mosaic's ``tpu.dynamic_gather`` is a
    register-level 8x128 shuffle (larger operands crash or hang the
    compiler), and a Pallas scalar loop with dynamic VMEM slices measured
    ~10us/row — 1000x slower than XLA. The gather therefore stays in XLA;
    the win is in the BACKWARD, where ``ops.hash_backward`` replaces XLA's
    ~60ns/update scatter-add with a sort + cumsum segment-sum.
  * ``composite`` holds the fused single-pass ray-march/compositing kernel
    (RGB + thermal + accumulation + depths emitted together).
"""
