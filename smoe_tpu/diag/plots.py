"""Diagnostic plotters — callback objects taking the Smoe trainer.

Mirrors reference plotter.py:
  ImagePlotter (orig / reconstruction / gating-argmax / SV map / pi
  histogram, :18-189), LossPlotter (loss+MSE+num-pi+num-SV multi-axis,
  q-curves dashed, :192-277), DenoisePlotter (:280-351).
All accept `quiet=True` to only write files (headless), and are plugged in
via Smoe.train(callbacks=[...]) exactly like the reference
(smoe.py:1518-1519, 1592-1594).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np


def psnr(mse: float, precision: int = 8) -> float:
    """Reference plotter.py:14-15."""
    from smoe_tpu.core.losses import psnr_from_mse
    return psnr_from_mse(mse, precision)


def _to_display(img: np.ndarray, use_yuv: bool) -> np.ndarray:
    """YUV -> RGB for display; squeeze grayscale.  Color video / light
    fields convert per leading-axis slice so panels show RGB, not raw
    YUV."""
    img = np.asarray(img)
    if img.ndim >= 3 and img.shape[-1] == 3 and use_yuv:
        import cv2
        u8 = np.uint8(np.clip(np.round(img * 255), 0, 255))
        if u8.ndim == 3:                    # (H, W, 3) image
            return cv2.cvtColor(u8, cv2.COLOR_YUV2RGB) / 255.0
        if u8.ndim == 4:                    # (H, W, T, 3) video
            rgb = np.stack([cv2.cvtColor(u8[:, :, t], cv2.COLOR_YUV2RGB)
                            for t in range(u8.shape[2])], axis=2)
            return rgb / 255.0
        if u8.ndim == 5:                    # (U, V, H, W, 3) light field
            flat = u8.reshape((-1,) + u8.shape[2:])
            rgb = np.stack([cv2.cvtColor(f, cv2.COLOR_YUV2RGB)
                            for f in flat])
            return rgb.reshape(u8.shape) / 255.0
    return np.squeeze(img)


class ImagePlotter:
    """Panel plot: original / reconstruction / gating / pi histogram
    (reference plotter.py:18-189)."""

    def __init__(self, path: Optional[str] = None,
                 options: Sequence[str] = ("orig", "reconstruction",
                                           "gating", "pis_hist"),
                 quiet: bool = True):
        self.path = path
        self.options = list(options)
        self.quiet = quiet
        if path:
            os.makedirs(path, exist_ok=True)

    def plot(self, smoe) -> None:
        n = len(self.options)
        fig, axes = plt.subplots(1, n, figsize=(4 * n, 4))
        if n == 1:
            axes = [axes]
        use_yuv = smoe.cfg.use_yuv
        for ax, opt in zip(axes, self.options):
            ax.set_title(opt)
            if opt == "orig":
                img = _to_display(smoe.image, use_yuv)
                ax.imshow(self._frame0(img), cmap="gray", vmin=0, vmax=1)
            elif opt == "reconstruction":
                rec = smoe.get_reconstruction()
                mse = smoe.get_mses()[-1][1] if smoe.get_mses() else None
                if mse is not None:
                    ax.set_title(f"rec {psnr(mse, smoe.cfg.precision):.2f} dB")
                ax.imshow(self._frame0(_to_display(rec, use_yuv)),
                          cmap="gray", vmin=0, vmax=1)
            elif opt == "gating":
                w = smoe.get_weight_matrix_argmax()
                ax.imshow(self._frame0(np.squeeze(w)), cmap="prism")
            elif opt == "supportvectors":
                sv = getattr(smoe, "reconstruction_sv", None)
                if sv is not None:
                    ax.imshow(self._frame0(np.squeeze(sv)), cmap="gray")
            elif opt == "pis_hist":
                pis = np.asarray(smoe.params.pis)
                ax.hist(pis[pis > 0], bins=32)
                ax.set_title(f"pis > 0: {(pis > 0).sum()}")
            ax.set_xticks([])
            ax.set_yticks([])
        fig.tight_layout()
        if self.path:
            fig.savefig(os.path.join(self.path, f"iter_{smoe.iter}.png"))
        if not self.quiet:
            plt.show()
        plt.close(fig)

    @staticmethod
    def _frame0(img):
        """For video volumes show frame 0; LF shows the center view."""
        if img.ndim == 5:                      # (U, V, H, W, C) light field
            return img[img.shape[0] // 2, img.shape[1] // 2]
        if img.ndim == 4:
            if img.shape[-1] in (1, 3):        # (H, W, T, C) video
                return img[:, :, 0]
            return img[img.shape[0] // 2, img.shape[1] // 2]   # gray LF
        if img.ndim == 3 and img.shape[-1] not in (1, 3):
            return img[:, :, 0]                # squeezed grayscale video
        return img


class LossPlotter:
    """Loss + MSE + kernel-count curves, quantized curves dashed
    (reference plotter.py:192-277)."""

    def __init__(self, path: Optional[str] = None, quiet: bool = True):
        self.path = path
        self.quiet = quiet
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def plot(self, smoe) -> None:
        losses = smoe.get_losses()
        mses = smoe.get_mses()
        num_pis = smoe.get_num_pis()
        if not losses:
            return
        fig, ax1 = plt.subplots(figsize=(8, 5))
        it, lv = zip(*losses)
        ax1.semilogy(it, lv, "b-", label="loss")
        if smoe.get_qlosses():
            qi, ql = zip(*smoe.get_qlosses())
            ax1.semilogy(qi, ql, "b--", label="qloss")
        ax1.set_xlabel("iteration")
        ax1.set_ylabel("loss", color="b")

        ax2 = ax1.twinx()
        it, mv = zip(*mses)
        ax2.semilogy(it, mv, "r-", label="mse")
        if smoe.get_qmses():
            qi, qm = zip(*smoe.get_qmses())
            ax2.semilogy(qi, qm, "r--", label="qmse")
        ax2.set_ylabel("mse", color="r")

        ax3 = ax1.twinx()
        ax3.spines["right"].set_position(("outward", 50))
        it, npi = zip(*num_pis)
        ax3.plot(it, npi, "g-", label="#kernels")
        ax3.set_ylabel("#kernels", color="g")
        fig.tight_layout()
        if self.path:
            fig.savefig(self.path)
        if not self.quiet:
            plt.show()
        plt.close(fig)


class DenoisePlotter:
    """Denoising workload: clean / noisy / reconstruction + PSNR track
    (reference plotter.py:280-351)."""

    def __init__(self, clean_image: np.ndarray, path: Optional[str] = None,
                 quiet: bool = True):
        self.clean = np.asarray(clean_image)
        self.path = path
        self.quiet = quiet
        self.psnrs = []
        if path:
            os.makedirs(path, exist_ok=True)

    def plot(self, smoe) -> None:
        rec = smoe.get_reconstruction()
        mse = float(np.mean((rec - self.clean) ** 2))
        p = psnr(mse * (2 ** smoe.cfg.precision) ** 2, smoe.cfg.precision)
        self.psnrs.append((smoe.iter, p))
        fig, axes = plt.subplots(1, 4, figsize=(16, 4))
        use_yuv = smoe.cfg.use_yuv
        for ax, (title, img) in zip(axes[:3], [
                ("clean", self.clean), ("noisy", smoe.image),
                (f"denoised {p:.2f} dB", rec)]):
            ax.imshow(np.squeeze(_to_display(img, use_yuv)),
                      cmap="gray", vmin=0, vmax=1)
            ax.set_title(title)
            ax.set_xticks([]); ax.set_yticks([])
        it, ps = zip(*self.psnrs)
        axes[3].plot(it, ps)
        axes[3].set_title("PSNR vs clean")
        fig.tight_layout()
        if self.path:
            fig.savefig(os.path.join(self.path, f"denoise_{smoe.iter}.png"))
        if not self.quiet:
            plt.show()
        plt.close(fig)
