"""Blind-SISR trainer — the TPU re-design of train_SISR.py.

As with the denoise trainers, the whole degradation pipeline (per-sample
anisotropic kernels, blur, antialiased bicubic downsample, Gaussian noise)
runs inside the jitted train step (data/sisr_synth.py); the host only
serves HR patch batches.  The ELBO resamples the kernel covariance and
differentiates through degradation every step (losses/elbo.py).

Matching reference semantics: Adam + cosine (no warmup,
train_SISR.py:99-101), three per-subnet clip norms (:184, :226-228),
σ² prior = nlevel², α0 = 0.5·var_window², κ0, penalty_K from config.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from ..data.sisr_synth import synthesize_sisr_batch
from ..losses import elbo_sisr
from ..models import VIRNetSR
from ..models.common import train_conv_impl as _train_conv_impl
from ..models.common import train_remat as _train_remat
from ..precision import compute_dtype, precision
from .checkpoint import CheckpointManager
from .mesh import make_mesh, replicate, shard_batch
from .optim import build_optimizer, subtree_grad_norms


@dataclass
class SISRTrainConfig:
    # model
    im_chn: int = 3
    sigma_chn: int = 1
    kernel_chn: int = 3
    dep_S: int = 5
    dep_K: int = 8
    n_feat: tuple = (96, 160, 224)
    n_resblocks: int = 2
    extra_mode: str = "both"
    noise_cond: bool = True
    kernel_cond: bool = True
    # degradation
    sf: int = 4
    k_size: int = 21
    kernel_shift: bool = False
    downsampler: str = "bicubic"
    noise_level: tuple = (0.01, 15.0)
    add_jpeg_in_graph: bool = False   # device-side JPEG noise branch
                                      # (ops/jpeg.py approximation of the
                                      # reference's libjpeg round trip)
    noise_jpeg: tuple = (0.1, 10.0)
    # training
    batch_size: int = 16
    hr_size: int = 192
    epochs: int = 120
    warmup_epochs: int = 0
    steps_per_epoch: int = 10000
    lr: float = 2e-4
    lr_min: float = 1e-6
    clip_grad_R: float = 5e2
    clip_grad_S: float = 1e2
    clip_grad_K: float = 5e2
    eps2: float = 1e-5
    r2: float = 1e-4
    var_window: int = 9
    kappa0: float = 50.0
    penalty_K: tuple = (0.02, 2.0)
    prefetch: int = 2           # batches in flight ahead of the device
                                # (data/prefetch.py; 0 disables — the
                                # reference's prefetch_factor analogue)
    mixed_precision: bool = True  # bf16 activations (params/opt stay fp32)
    remat: bool = False         # rematerialize RNet blocks in the backward
                                # (A/B'd on chip — see BASELINE.md; env
                                # override VIRNET_TPU_REMAT=1|0)
    seed: int = 1234
    save_dir: str = "./train_save_sisr"
    print_freq: int = 100


class SISRTrainer:
    """``host_batches=True`` consumes host-degraded (hr, lr, kinfo, nlevel)
    batches (data/sisr_host.py — needed for the JPEG noise branch);
    otherwise HR batches are degraded on device (data/sisr_synth.py)."""

    def __init__(self, cfg: SISRTrainConfig, mesh=None,
                 host_batches: bool = False):
        self.cfg = cfg
        self.host_batches = host_batches
        self.mesh = mesh if mesh is not None else make_mesh()

        self.model = VIRNetSR(
            im_chn=cfg.im_chn, sigma_chn=cfg.sigma_chn,
            kernel_chn=cfg.kernel_chn, n_feat=cfg.n_feat, dep_S=cfg.dep_S,
            dep_K=cfg.dep_K, noise_cond=cfg.noise_cond,
            kernel_cond=cfg.kernel_cond, n_resblocks=cfg.n_resblocks,
            extra_mode=cfg.extra_mode, noise_avg=True,
            conv_impl=_train_conv_impl(),
            remat=_train_remat(cfg.remat))

        self.tx, self.schedule = build_optimizer(
            cfg.lr, cfg.lr_min, cfg.epochs, cfg.warmup_epochs,
            cfg.steps_per_epoch,
            clip_map={"rnet": cfg.clip_grad_R, "snet": cfg.clip_grad_S,
                      "knet": cfg.clip_grad_K})

        n_dev = self.mesh.devices.size
        if cfg.batch_size % n_dev:
            raise ValueError(
                f"batch_size={cfg.batch_size} must be divisible by the "
                f"data-mesh size ({n_dev} devices)")

        key = jax.random.PRNGKey(cfg.seed)
        lr_size = cfg.hr_size // cfg.sf
        dummy = jnp.zeros((1, lr_size, lr_size, cfg.im_chn))
        variables = self.model.init(key, dummy, cfg.sf)
        self.params = replicate(self.mesh, variables["params"])
        self.opt_state = replicate(self.mesh, self.tx.init(self.params))
        self.step = 0
        self.alpha0 = 0.5 * float(cfg.var_window) ** 2

        self.ckpt = CheckpointManager(cfg.save_dir)
        self._train_step = self._build_train_step()

    def _build_train_step(self):
        cfg = self.cfg
        model = self.model
        tx = self.tx
        alpha0 = self.alpha0

        host_batches = self.host_batches

        def _norm(t):
            # uint8 batches normalize in-graph (4x smaller host->device
            # transfer; see data/packdb.PackDBSampler.sample raw=True)
            if t.dtype == jnp.uint8:
                return t.astype(jnp.float32) / 255.0
            return t

        def loss_fn(params, data, key):
            data = jax.tree_util.tree_map(_norm, data)
            k_synth, k_elbo = jax.random.split(key)
            if host_batches:
                from ..data.sisr_synth import SISRBatch
                im_hr, im_lr, kinfo_gt, nlevel = data
                batch = SISRBatch(im_hr=im_hr, im_lr=im_lr, im_blur=im_lr,
                                  kinfo=kinfo_gt, nlevel=nlevel)
            else:
                batch = synthesize_sisr_batch(
                    k_synth, data, cfg.sf, cfg.k_size, cfg.kernel_shift,
                    cfg.downsampler, cfg.noise_level,
                    add_jpeg=cfg.add_jpeg_in_graph,
                    noise_jpeg=cfg.noise_jpeg)
            sigma_prior = (batch.nlevel ** 2).reshape(-1, 1, 1, 1)
            cdt = jnp.bfloat16 if cfg.mixed_precision else None
            prec = "default" if cfg.mixed_precision else "highest"
            with compute_dtype(cdt), precision(prec):
                mu, kinfo_est, sigma_est = model.apply(
                    {"params": params}, batch.im_lr, cfg.sf)
            mu = mu.astype(jnp.float32)
            kinfo_est = kinfo_est.astype(jnp.float32)
            sigma_est = sigma_est.astype(jnp.float32)
            loss, aux = elbo_sisr(
                k_elbo, mu, sigma_est, kinfo_est, batch.im_hr, batch.im_lr,
                sigma_prior, alpha0, batch.kinfo, cfg.kappa0, cfg.r2,
                cfg.eps2, cfg.sf, cfg.k_size, cfg.penalty_K,
                cfg.kernel_shift, cfg.downsampler)
            scalars = {k: v for k, v in aux.items() if k != "kernel"}
            return loss, scalars

        def train_step(params, opt_state, im_hr, key):
            (loss, aux), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, im_hr, key)
            norms = subtree_grad_norms(grads)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            aux.update(loss=loss, gnorm_r=norms.get("rnet", 0.0),
                       gnorm_s=norms.get("snet", 0.0),
                       gnorm_k=norms.get("knet", 0.0))
            return params, opt_state, aux

        self._train_step_raw = train_step
        return jax.jit(train_step, donate_argnums=(0, 1))

    # ------------------------------------------------- device-resident data

    def _build_device_train_step(self, batch_size: int, hr_size: int):
        """HR patch sampling (gather + random crop + dihedral) fused into
        the jitted SISR step; see loop_denoise._build_device_train_step.
        Not available with host_batches (the JPEG branch needs libjpeg on
        the host)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..data.device_data import sample_patches

        if self.host_batches:
            raise ValueError("device-resident data requires on-device "
                             "degradation (host_batches=False)")
        base_step = self._train_step_raw
        bs = NamedSharding(self.mesh, P("data"))

        def step(params, opt_state, data_arrays, key):
            k_sample, k_step = jax.random.split(key)
            hr = sample_patches(k_sample, data_arrays[0], batch_size,
                                hr_size)
            hr = jax.lax.with_sharding_constraint(hr, bs)
            return base_step(params, opt_state, hr, k_step)

        return jax.jit(step, donate_argnums=(0, 1))

    def run_step_device(self, dataset, epoch: int) -> Dict[str, jnp.ndarray]:
        """One step fed from a DeviceDataset of HR records (zero host
        input bytes; degradation already runs on device)."""
        if getattr(self, "_train_step_dev", None) is None:
            self._train_step_dev = self._build_device_train_step(
                self.cfg.batch_size, self.cfg.hr_size)
        key = jax.random.fold_in(
            jax.random.fold_in(jax.random.PRNGKey(self.cfg.seed), epoch),
            self.step)
        self.params, self.opt_state, aux = self._train_step_dev(
            self.params, self.opt_state, dataset.arrays, key)
        self.step += 1
        return aux

    def train_epoch_device(self, epoch: int, dataset, steps: int,
                           log_fn: Optional[Callable] = None
                           ) -> Dict[str, float]:
        cfg = self.cfg
        tic = time.time()
        sums: Dict[str, float] = {}
        count = 0
        for ii in range(steps):
            aux = self.run_step_device(dataset, epoch)
            if (ii + 1) % cfg.print_freq == 0 or ii == 0:
                vals = {k: float(v) for k, v in aux.items()}
                lr = float(self.schedule(self.step))
                msg = (f"[Epoch:{epoch + 1:>2d}/{cfg.epochs:<2d}] "
                       f"train:{ii + 1:0>5d}/{steps:0>5d}, "
                       f"lh={vals['lh']:+4.2f}, KLR={vals['kl_rnet']:+6.2f}, "
                       f"KLS={vals['kl_snet']:+6.2f}, "
                       f"KLK={vals['kl_knet']:+6.2f}, lr={lr:.2e}")
                (log_fn or print)(msg)
                for k, v in vals.items():
                    sums[k] = sums.get(k, 0.0) + v
                count += 1
        out = {k: v / max(count, 1) for k, v in sums.items()}
        out["epoch_time"] = time.time() - tic
        return out

    def run_step(self, im_hr_batch, epoch: int) -> Dict[str, jnp.ndarray]:
        key = jax.random.fold_in(
            jax.random.fold_in(jax.random.PRNGKey(self.cfg.seed), epoch),
            self.step)
        batch = shard_batch(self.mesh, im_hr_batch)
        self.params, self.opt_state, aux = self._train_step(
            self.params, self.opt_state, batch, key)
        self.step += 1
        return aux

    def train_epoch(self, epoch: int, batch_iter,
                    log_fn: Optional[Callable] = None) -> Dict[str, float]:
        cfg = self.cfg
        tic = time.time()
        sums: Dict[str, float] = {}
        count = 0
        if cfg.prefetch > 0:
            from ..data.prefetch import DevicePrefetcher
            batch_iter = DevicePrefetcher(batch_iter, self.mesh,
                                          depth=cfg.prefetch)
        for ii, batch in enumerate(batch_iter):
            aux = self.run_step(batch, epoch)
            if (ii + 1) % cfg.print_freq == 0 or ii == 0:
                vals = {k: float(v) for k, v in aux.items()}
                lr = float(self.schedule(self.step))
                msg = (f"[Epoch:{epoch + 1:>2d}/{cfg.epochs:<2d}] "
                       f"train:{ii + 1:0>5d}/{cfg.steps_per_epoch:0>5d}, "
                       f"lh={vals['lh']:+4.2f}, KLR={vals['kl_rnet']:+6.2f}, "
                       f"KLS={vals['kl_snet']:+6.2f}, "
                       f"KLK={vals['kl_knet']:+6.2f}, lr={lr:.2e}")
                (log_fn or print)(msg)
                for k, v in vals.items():
                    sums[k] = sums.get(k, 0.0) + v
                count += 1
        out = {k: v / max(count, 1) for k, v in sums.items()}
        out["epoch_time"] = time.time() - tic
        return out

    def save(self, epoch: int):
        self.ckpt.save(epoch + 1, dict(params=self.params,
                                       opt_state=self.opt_state,
                                       step=self.step, epoch=epoch + 1))

    def restore(self, step: Optional[int] = None) -> int:
        state = self.ckpt.restore(
            step, like=dict(params=self.params, opt_state=self.opt_state,
                            step=self.step, epoch=0))
        if state is None:
            return 0
        self.params = replicate(self.mesh, state["params"])
        self.opt_state = replicate(self.mesh, state["opt_state"])
        self.step = int(state["step"])
        return int(state["epoch"])
