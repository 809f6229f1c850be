"""Run logger callback: persist params + reconstructions every validation,
full checkpoint every 100 iterations (reference logger.py:11-46)."""

from __future__ import annotations

import os


import numpy as np


class ModelLogger:
    def __init__(self, path: str, as_media: bool = True,
                 checkpoint_every: int = 100):
        self.path = path
        self.as_media = as_media
        self.checkpoint_every = checkpoint_every
        os.makedirs(path, exist_ok=True)
        os.makedirs(os.path.join(path, "params"), exist_ok=True)
        os.makedirs(os.path.join(path, "reconstructions"), exist_ok=True)
        os.makedirs(os.path.join(path, "checkpoints"), exist_ok=True)

    def log(self, smoe) -> None:
        from smoe_tpu.codec.container import save_model
        from smoe_tpu.parallel.multihost import primary
        if not primary():      # process 0 owns all persisted artifacts
            return
        it = smoe.iter
        save_model(os.path.join(self.path, "params", f"{it}.pkl"),
                   smoe.get_params(), smoe.cfg, qparams=smoe.qparams,
                   losses=smoe.get_losses(), mses=smoe.get_mses(),
                   num_pis=smoe.get_num_pis(), musX_grid=smoe.musX_grid,
                   model_mask=smoe.model_mask)

        rec = smoe.get_reconstruction()
        self._write(rec, os.path.join(self.path, "reconstructions",
                                      f"{it}"), smoe)
        if smoe.cfg.quantization_mode == 1 and smoe.qvalid:
            self._write(smoe.get_qreconstruction(),
                        os.path.join(self.path, "reconstructions",
                                     f"{it}_q"), smoe)

        if self.checkpoint_every and it and it % self.checkpoint_every == 0:
            smoe.checkpoint(os.path.join(self.path, "checkpoints",
                                         f"{it}.pkl"))

    def _write(self, rec, path, smoe) -> None:
        if self.as_media and smoe.cfg.dim_domain <= 4:
            from smoe_tpu.io.images import write_image
            try:
                write_image(rec, path, smoe.cfg.dim_domain,
                            yuv=smoe.cfg.use_yuv,
                            precision=smoe.cfg.precision)
                return
            except Exception:
                pass
        np.save(path + ".npy", rec)


class JsonlLogger:
    """Machine-readable metrics stream (new vs reference): one JSON line per
    validation with loss/mse/psnr/kernel count — the observability layer
    SURVEY §5 calls for."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def log(self, smoe) -> None:
        import json
        import time
        if not smoe.get_mses():
            return
        it, mse = smoe.get_mses()[-1]
        _, loss = smoe.get_losses()[-1]
        _, npi = smoe.get_num_pis()[-1]
        from smoe_tpu.core.losses import psnr_from_mse
        rec = {
            "iter": it, "loss": float(loss), "mse": float(mse),
            "psnr_db": psnr_from_mse(mse, smoe.cfg.precision),
            "num_kernels": int(npi), "time": time.time(),
        }
        with open(self.path, "a") as fd:
            fd.write(json.dumps(rec) + "\n")
