"""Denoising trainers (synthetic + real), the TPU re-design of
train_denoising_syn.py / train_denoising_real.py.

Differences from the reference that are deliberate TPU-first redesigns:
  * data synthesis (σ-maps + noise) happens inside the jitted train step on
    device (data/denoise_synth.py) — the host only serves GT patch batches;
  * parallelism is a 1-D data mesh (train/mesh.py) instead of DDP/NCCL;
  * checkpoints carry the full train state (params + optimizer) via orbax,
    where the reference saves weights only and replays the scheduler
    (train_denoising_syn.py:91-105 — a quirk we improve on, while still
    supporting weights-only import).
Training semantics match: virtual epochs of 10000*batch steps, per-epoch
seed reset, Adam + warmup-cosine per-epoch LR, per-subnet grad clipping,
per-epoch PSNR/SSIM validation and checkpoint.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from ..data.denoise_synth import synthesize_noisy_batch
from ..losses import elbo_denoising
from ..models import VIRNet
from ..models.common import train_conv_impl as _train_conv_impl
from ..models.common import train_remat as _train_remat
from ..ops.degrade import noise_estimate
from ..precision import compute_dtype, precision
from .checkpoint import CheckpointManager
from .mesh import make_mesh, replicate, shard_batch
from .optim import build_optimizer, subtree_grad_norms


@dataclass
class DenoiseTrainConfig:
    # model
    im_chn: int = 3
    sigma_chn: int = 1
    dep_S: int = 5
    n_feat: tuple = (96, 192, 288)
    n_resblocks: int = 3
    noise_cond: bool = True
    extra_mode: str = "input"
    # training
    batch_size: int = 16
    patch_size: int = 128
    epochs: int = 120
    warmup_epochs: int = 5
    steps_per_epoch: int = 10000
    lr: float = 1e-4
    lr_min: float = 1e-6
    clip_grad_R: float = 1e3
    clip_grad_S: float = 1e2
    eps2: float = 1e-6
    var_window: int = 7
    noise_mode: str = "niid"    # niid | iid  (synthetic) / 'real'
    prefetch: int = 2           # batches in flight ahead of the device
                                # (data/prefetch.py; 0 disables — the
                                # reference's prefetch_factor analogue)
    mixed_precision: bool = True  # bf16 activations (params/opt stay fp32)
    remat: bool = False         # rematerialize RNet blocks in the backward
                                # (trades recompute for HBM traffic; A/B'd
                                # on chip — see BASELINE.md; env override
                                # VIRNET_TPU_REMAT=1|0)
    use_mixup: bool = True      # real-data mode only (reference
                                # train_denoising_real.py:163)
    seed: int = 1234
    save_dir: str = "./train_save"
    print_freq: int = 100


class DenoiseTrainer:
    """Synthetic-noise denoising trainer.  For real-data training pass
    ``real=True`` and feed (noisy, gt) batches; the σ² prior is then
    estimated in-graph from the residual (reference
    train_denoising_real.py:164)."""

    def __init__(self, cfg: DenoiseTrainConfig, real: bool = False,
                 mesh=None):
        self.cfg = cfg
        self.real = real
        self.mesh = mesh if mesh is not None else make_mesh()

        self.model = VIRNet(
            im_chn=cfg.im_chn, sigma_chn=cfg.sigma_chn, n_feat=cfg.n_feat,
            dep_S=cfg.dep_S, n_resblocks=cfg.n_resblocks,
            noise_cond=cfg.noise_cond, extra_mode=cfg.extra_mode,
            noise_avg=False, conv_impl=_train_conv_impl(),
            remat=_train_remat(cfg.remat))

        self.tx, self.schedule = build_optimizer(
            cfg.lr, cfg.lr_min, cfg.epochs, cfg.warmup_epochs,
            cfg.steps_per_epoch,
            clip_map={"rnet": cfg.clip_grad_R, "snet": cfg.clip_grad_S})

        n_dev = self.mesh.devices.size
        if cfg.batch_size % n_dev:
            raise ValueError(
                f"batch_size={cfg.batch_size} must be divisible by the "
                f"data-mesh size ({n_dev} devices)")

        key = jax.random.PRNGKey(cfg.seed)
        dummy = jnp.zeros((1, cfg.patch_size, cfg.patch_size, cfg.im_chn))
        variables = self.model.init(key, dummy)
        self.params = replicate(self.mesh, variables["params"])
        self.opt_state = replicate(self.mesh, self.tx.init(self.params))
        self.step = 0
        self.alpha0 = 0.5 * float(cfg.var_window) ** 2

        self.ckpt = CheckpointManager(cfg.save_dir)
        self._train_step = self._build_train_step()

    # ------------------------------------------------------------------ step

    def _build_train_step(self):
        cfg = self.cfg
        model = self.model
        tx = self.tx
        alpha0 = self.alpha0
        real = self.real

        def _norm(t):
            # uint8 batches normalize in-graph: the host ships 4x less data
            # (see data/packdb.PackDBSampler.sample raw=True)
            if t.dtype == jnp.uint8:
                return t.astype(jnp.float32) / 255.0
            return t

        def loss_fn(params, batch, key):
            batch = jax.tree_util.tree_map(_norm, batch)
            if real:
                im_noisy, im_gt = batch
                if cfg.use_mixup:
                    key, k_mix = jax.random.split(key)
                    from ..data.mixup import mixup_pairs
                    im_gt, im_noisy = mixup_pairs(k_mix, im_gt, im_noisy)
                sigma_gt = noise_estimate(im_noisy, im_gt, cfg.var_window)
            else:
                im_gt = batch
                im_noisy, sigma_gt = synthesize_noisy_batch(
                    key, im_gt, mode=cfg.noise_mode)
            beta0 = alpha0 * sigma_gt
            cdt = jnp.bfloat16 if cfg.mixed_precision else None
            prec = "default" if cfg.mixed_precision else "highest"
            with compute_dtype(cdt), precision(prec):
                mu, sigma = model.apply({"params": params}, im_noisy)
            mu = mu.astype(jnp.float32)
            sigma = sigma.astype(jnp.float32)
            loss, lh, klg, klig = elbo_denoising(
                mu, sigma, im_noisy, im_gt, cfg.eps2, alpha0, beta0)
            return loss, dict(lh=lh, kl_gauss=klg, kl_ig=klig)

        def train_step(params, opt_state, batch, key):
            (loss, aux), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, batch, key)
            norms = subtree_grad_norms(grads)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            aux.update(loss=loss, gnorm_r=norms.get("rnet", 0.0),
                       gnorm_s=norms.get("snet", 0.0))
            return params, opt_state, aux

        self._train_step_raw = train_step
        return jax.jit(train_step, donate_argnums=(0, 1))

    # ------------------------------------------------- device-resident data

    def _build_device_train_step(self, batch_size: int, patch: int):
        """Train step whose input batch is sampled ON DEVICE from a
        resident record array (data/device_data.py): gather + random crop
        + dihedral augment fuse into the step's XLA program, so the host
        contributes one dispatch and zero bytes per step.  The record
        arrays are step *arguments* (same buffers every call — no
        transfer), not closure constants."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..data.device_data import sample_patches

        base_step = self._train_step_raw
        bs = NamedSharding(self.mesh, P("data"))

        def step(params, opt_state, data_arrays, key):
            k_sample, k_noise = jax.random.split(key)
            if len(data_arrays) == 2:
                noisy, gt = sample_patches(
                    k_sample, data_arrays[0], batch_size, patch,
                    extra=data_arrays[1])
                batch = (jax.lax.with_sharding_constraint(noisy, bs),
                         jax.lax.with_sharding_constraint(gt, bs))
            else:
                gt = sample_patches(k_sample, data_arrays[0], batch_size,
                                    patch)
                batch = jax.lax.with_sharding_constraint(gt, bs)
            return base_step(params, opt_state, batch, k_noise)

        return jax.jit(step, donate_argnums=(0, 1))

    def run_step_device(self, dataset, epoch: int) -> Dict[str, float]:
        """One step fed from a DeviceDataset (zero host input bytes)."""
        if getattr(self, "_train_step_dev", None) is None:
            self._train_step_dev = self._build_device_train_step(
                self.cfg.batch_size, self.cfg.patch_size)
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
                       f"lh={vals['lh']:+4.2f}, KLG={vals['kl_gauss']:+7.2f}, "
                       f"KLIG={vals['kl_ig']:+6.2f}, lr={lr:.2e}")
                (log_fn or print)(msg)
                for k, v in vals.items():
                    sums[k] = sums.get(k, 0.0) + v
                count += 1
        out = {k: v / max(count, 1) for k, v in sums.items()}
        out["epoch_time"] = time.time() - tic
        return out

    def run_step(self, batch, epoch: int) -> Dict[str, float]:
        """One optimization step.  ``batch``: GT NHWC float32 (synthetic) or
        (noisy, gt) tuple (real)."""
        key = jax.random.fold_in(
            jax.random.fold_in(jax.random.PRNGKey(self.cfg.seed), epoch),
            self.step)
        batch = shard_batch(self.mesh, batch)
        self.params, self.opt_state, aux = self._train_step(
            self.params, self.opt_state, batch, key)
        self.step += 1
        return aux

    # ------------------------------------------------------------ epoch loop

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
                       f"lh={vals['lh']:+4.2f}, KLG={vals['kl_gauss']:+7.2f}, "
                       f"KLIG={vals['kl_ig']:+6.2f}, "
                       f"GNorm_R={vals['gnorm_r']:.1e}, "
                       f"GNorm_S={vals['gnorm_s']:.1e}, lr={lr:.2e}")
                (log_fn or print)(msg)
                for k, v in vals.items():
                    sums[k] = sums.get(k, 0.0) + v
                count += 1
        toc = time.time()
        out = {k: v / max(count, 1) for k, v in sums.items()}
        out["epoch_time"] = toc - tic
        return out

    # ------------------------------------------------------------ checkpoint

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
