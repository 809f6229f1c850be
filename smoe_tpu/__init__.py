"""smoe_tpu — TPU-native Steered Mixture-of-Experts image/video/light-field codec.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
roljon/Steered-Mixture-of-Experts (TF1 reference, see /root/reference):
per-pixel softmax gating over steered Gaussian kernels with affine experts,
fit by block-accumulated Adam, plus the quantization/coding loop and the
decode paths.

Design stance (TPU-first, not a port):
  * The forward pass is expressed as dense MXU matmuls over quadratic
    coordinate features (see core/model.py) instead of the reference's
    broadcast einsum (reference ops/special_math_ops.py:36-149).
  * Training is one jitted XLA program per iteration: lax.scan over pixel
    blocks with f32 gradient accumulation (reference does one
    session.run per block per iteration, smoe.py:1643-1702).
  * Multi-chip scaling shards the pixel-block axis over a jax Mesh with a
    psum of accumulated gradients (the reference is single-device,
    smoe.py:277).
"""

__version__ = "0.1.0"

# Persistent XLA compilation cache: SMoE sweep programs take 40-240 s to
# compile; caching makes repeat fits (benches, RD sweeps, decode) start in
# seconds.  Respects an explicit JAX_COMPILATION_CACHE_DIR.
import os as _os

if not _os.environ.get("JAX_COMPILATION_CACHE_DIR"):
    try:
        import jax as _jax
        _cache_dir = _os.path.join(_os.path.expanduser("~"), ".cache",
                                   "smoe_tpu_jax")
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs",
                           10.0)
    except Exception:   # cache is best-effort; never block imports
        pass

from smoe_tpu.config import SmoeConfig  # noqa: F401
from smoe_tpu.core.params import SmoeParams  # noqa: F401
from smoe_tpu.core.model import smoe_forward  # noqa: F401
from smoe_tpu.fit.trainer import Smoe  # noqa: F401
