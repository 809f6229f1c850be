"""Quick end-to-end smoke run (CPU): fit a toy image, print PSNR."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax
if "--tpu" not in sys.argv:
    jax.config.update("jax_default_device", "cpu")

import numpy as np
from smoe_tpu import Smoe

y, x = np.mgrid[0:32, 0:32] / 31.0
img = (0.5 + 0.25 * np.sin(4 * x) * np.cos(3 * y))[..., None].astype(np.float32)
s = Smoe(img, kernels_per_dim=[4], use_yuv=False, use_determinant=True)
t = time.time()
loss, mse, npi, nsv = s.run_batched(train=False, update_reconstruction=True)
print(f"eval loss {loss:.6f} mse {mse:.2f} psnr {10*np.log10(255**2/mse):.2f} "
      f"num_pi {npi}  ({time.time()-t:.1f}s)", flush=True)
s.set_optimizer()
t = time.time()
for i in range(100):
    l, m, *_ = s.run_batched(train=True)
    if i == 0:
        print(f"first train step {time.time()-t:.1f}s", flush=True)
l, m, *_ = s.run_batched(train=False, update_reconstruction=True)
print(f"after 100 iters: loss {l:.6f} mse {m:.2f} "
      f"psnr {10*np.log10(255**2/m):.2f}  ({time.time()-t:.1f}s)", flush=True)
