"""tbist_tpu — TPU-native text-based image & video style transfer framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
``msmink01/text-based-image-style-transfer`` (reference mounted read-only at
``/root/reference``; see SURVEY.md for the component inventory).

Design principles (TPU-first, not a port):

* **NHWC layout** everywhere on device — the natural layout for TPU convs.
* **Static shapes**: images are bucketed to multiples of a configurable
  stride before entering jitted code, so XLA compiles once per bucket.
* **Functional state**: no mutable module globals; PRNG keys are explicit.
* **jit + lax control flow**: the pixel-optimization loop is a single
  compiled ``lax.while_loop`` (reference: a Python closure loop around
  ``torch.optim.LBFGS``, multi_style_transfer/run_style_transfer.py:100-151).
* **Mesh parallelism**: video frames batch over a ``dp`` axis and large
  images can shard spatially over ``sp`` using ``jax.sharding`` — the
  reference has no parallelism at all (sequential frame loop, app.py:784).
* **Host/device boundary**: PIL/cv2/video codecs stay on host; everything
  between decode and encode stays on device.
"""

__version__ = "0.1.0"
