"""GAN validate-loop runner — the reference configs' ``validate:`` block.

The reference's GAN training YAMLs declare a periodic validation pass
with metrics (reference tlxcv/models/gan/configs/*.yaml: ``validate:
interval / save_img / metrics: {fid: {name: FID, batch_size: N},
psnr: {name: PSNR, crop_border, test_y_channel}, ssim: {...}}``) but
ship no runner.  ``GanValidator`` is that runner for this framework:

- built from the YAML ``validate:`` dict verbatim;
- ``run(sample_fn, val_dataset)`` walks the dataset, calls
  ``sample_fn(batch) -> (fake, real)`` (each trainer knows how to turn a
  validation batch into a generated/reference pair — noise->image for
  StyleGAN, a->b translation for CycleGAN/UGATIT, rain->clean for
  PReNet), feeds the declared metrics, and returns ``{metric: value}``;
- FID streams moments through :class:`tlxcv_tpu.utils.fid.FID`
  (jitted InceptionV3 features); PSNR/SSIM are the jitted kernels in
  :mod:`tlxcv_tpu.utils.image_metrics`;
- ``save_img=True`` writes the first validation pair per run as .npy
  (zero-egress environment: no image codecs assumed).
"""
from __future__ import annotations

import os
import typing as tp

import numpy as np

__all__ = ["GanValidator"]


class GanValidator:
    def __init__(self, metrics: tp.Optional[dict] = None,
                 save_img: bool = False, out_dir: str = "val_out",
                 interval: int = 0, **_ignored):
        self.spec = dict(metrics or {})
        self.save_img = save_img
        self.out_dir = out_dir
        self.interval = int(interval)
        self._fid = None

    @classmethod
    def from_config(cls, validate_cfg: tp.Optional[dict]):
        return cls(**validate_cfg) if validate_cfg else None

    def _get_fid(self, cfg):
        if self._fid is None:
            from ..utils.fid import FID

            self._fid = FID(batch_size=int(cfg.get("batch_size", 32)))
        self._fid.reset()
        return self._fid

    def run(self, sample_fn, val_dataset, max_batches=None) -> dict:
        """sample_fn(batch) -> (fake, real) NHWC arrays on any scale."""
        from ..utils import image_metrics as im

        fid = None
        sums: dict = {}
        counts: dict = {}
        first_pair = None
        for bi, batch in enumerate(val_dataset):
            if max_batches is not None and bi >= max_batches:
                break
            fake, real = sample_fn(batch)
            fake = np.asarray(fake, np.float32)
            real = np.asarray(real, np.float32)
            if first_pair is None:
                first_pair = (fake, real)
            for key, cfg in self.spec.items():
                name = str(cfg.get("name", key)).upper()
                if name == "FID":
                    if fid is None:
                        fid = self._get_fid(cfg)
                    fid.update(real)
                    fid.update_fake(fake)
                elif name in ("PSNR", "SSIM"):
                    fn = im.psnr if name == "PSNR" else im.ssim
                    vals = np.asarray(fn(
                        fake, real,
                        crop_border=int(cfg.get("crop_border", 0)),
                        test_y_channel=bool(cfg.get("test_y_channel", False))))
                    finite = vals[np.isfinite(vals)]
                    sums[key] = sums.get(key, 0.0) + float(finite.sum())
                    counts[key] = counts.get(key, 0) + int(finite.size)
                else:
                    raise ValueError(f"unknown validate metric {name!r}")
        results = {k: sums[k] / max(counts[k], 1) for k in sums}
        for key, cfg in self.spec.items():
            if str(cfg.get("name", key)).upper() == "FID" and fid is not None:
                results[key] = fid.result()
        if self.save_img and first_pair is not None:
            os.makedirs(self.out_dir, exist_ok=True)
            np.save(os.path.join(self.out_dir, "fake.npy"), first_pair[0])
            np.save(os.path.join(self.out_dir, "real.npy"), first_pair[1])
        return results
