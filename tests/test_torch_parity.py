"""End-to-end forward parity: flax models with converted weights must match a
functional torch evaluation of the reference architecture to float tolerance.

The torch golden below is written functionally from the architecture spec
(SURVEY.md §2.1 / networks/*.py semantics) and keyed by the reference's
state-dict names, so it simultaneously validates the converter's name map,
the weight transposes, and every op-semantics choice (reflect pad, nearest
resize, transposed conv, clamping)."""

import math

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from virnet_tpu.convert import convert_state_dict
from virnet_tpu.models import VIRNet, VIRNetSR

torch.manual_seed(0)


def _conv_params(sd, name, cout, cin, k, bias=True):
    sd[f"{name}.weight"] = torch.randn(cout, cin, k, k) * 0.05
    if bias:
        sd[f"{name}.bias"] = torch.randn(cout) * 0.05


def _tconv(sd, name, x, stride=1, padding=1, slope=None):
    w = sd[f"{name}.weight"]
    b = sd.get(f"{name}.bias")
    out = F.conv2d(x, w, b, stride=stride, padding=padding)
    if slope is not None:
        out = F.leaky_relu(out, slope)
    return out


# ---------------------------------------------------------------- DnCNN (SNet)

def _make_dncnn(sd, prefix, cin, cout, dep, nf=64):
    _conv_params(sd, f"{prefix}.conv1", nf, cin, 3)
    for i in range(1, dep - 1):
        _conv_params(sd, f"{prefix}.mid_layer.{2 * (i - 1)}", nf, nf, 3)
    _conv_params(sd, f"{prefix}.conv_last", cout, nf, 3)


def _run_dncnn(sd, prefix, x, dep, noise_avg):
    x = _tconv(sd, f"{prefix}.conv1", x, slope=0.25)
    for i in range(1, dep - 1):
        x = _tconv(sd, f"{prefix}.mid_layer.{2 * (i - 1)}", x, slope=0.25)
    x = _tconv(sd, f"{prefix}.conv_last", x)
    if noise_avg:
        x = x.mean(dim=(2, 3), keepdim=True)
    return x


# ------------------------------------------------------------ AttResUNet (RNet)

def _make_att_layer(sd, prefix, out_chn, extra_chn):
    nf1, nf2 = out_chn // 8, out_chn // 4
    _conv_params(sd, f"{prefix}.conv1", nf1, extra_chn, 1)
    _conv_params(sd, f"{prefix}.conv2", nf2, nf1, 1)
    _conv_params(sd, f"{prefix}.mul_conv", out_chn, nf2, 1)
    _conv_params(sd, f"{prefix}.add_conv", out_chn, nf2, 1)


def _run_att_layer(sd, prefix, extra):
    f = _tconv(sd, f"{prefix}.conv1", extra, padding=0, slope=0.2)
    f = _tconv(sd, f"{prefix}.conv2", f, padding=0, slope=0.2)
    mul = torch.sigmoid(_tconv(sd, f"{prefix}.mul_conv", f, padding=0))
    add = _tconv(sd, f"{prefix}.add_conv", f, padding=0)
    return mul, add


def _make_att_res_block(sd, prefix, nf, extra_chn):
    if extra_chn > 0:
        _make_att_layer(sd, f"{prefix}.sft1", nf, extra_chn)
        _make_att_layer(sd, f"{prefix}.sft2", nf, extra_chn)
    _conv_params(sd, f"{prefix}.conv1", nf, nf, 3)
    _conv_params(sd, f"{prefix}.conv2", nf, nf, 3)


def _run_att_res_block(sd, prefix, x, extra, conditioned):
    mul1, add1 = (_run_att_layer(sd, f"{prefix}.sft1", extra)
                  if conditioned else (1, 0))
    f = _tconv(sd, f"{prefix}.conv1", F.leaky_relu(x * mul1 + add1, 0.2))
    mul2, add2 = (_run_att_layer(sd, f"{prefix}.sft2", extra)
                  if conditioned else (1, 0))
    f = _tconv(sd, f"{prefix}.conv2", F.leaky_relu(f * mul2 + add2, 0.2))
    return x + f


def _make_attresunet(sd, prefix, in_chn, extra_chn, out_chn, n_feat,
                     n_resblocks, extra_mode):
    head_in = in_chn + (extra_chn if extra_mode in ("input", "both") else 0)
    _conv_params(sd, f"{prefix}.head", n_feat[0], head_in, 3)
    extra_down = extra_chn if extra_mode in ("down", "both") else 0
    depth = len(n_feat)
    for i in range(depth):
        for j in range(n_resblocks):
            _make_att_res_block(sd, f"{prefix}.down_path.{i}.body.{j}",
                                n_feat[i], extra_down)
        if i + 1 < depth:
            _conv_params(sd, f"{prefix}.down_path.{i}.downsampler",
                         n_feat[i + 1], n_feat[i], 3)
    for k, jj in enumerate(reversed(range(depth - 1))):
        sd[f"{prefix}.up_path.{k}.upsampler.weight"] = (
            torch.randn(n_feat[jj + 1], n_feat[jj], 2, 2) * 0.05)
        sd[f"{prefix}.up_path.{k}.upsampler.bias"] = (
            torch.randn(n_feat[jj]) * 0.05)
        for b in range(n_resblocks):
            _make_att_res_block(sd, f"{prefix}.up_path.{k}.body.{b}",
                                n_feat[jj], 0)
    _conv_params(sd, f"{prefix}.tail", out_chn, n_feat[0], 3)


def _run_attresunet(sd, prefix, x_in, extra_in, n_feat, n_resblocks,
                    extra_mode):
    depth = len(n_feat)
    h, w = x_in.shape[-2:]
    mod = 2 ** (depth - 1)
    pad_b = int(math.ceil(h / mod) * mod - h)
    pad_r = int(math.ceil(w / mod) * mod - w)
    x = F.pad(x_in, (0, pad_r, 0, pad_b), mode="reflect")
    extra = (F.pad(extra_in, (0, pad_r, 0, pad_b), mode="reflect")
             if extra_mode != "null" else None)

    if extra_mode in ("input", "both"):
        x = _tconv(sd, f"{prefix}.head", torch.cat([x, extra], 1))
    else:
        x = _tconv(sd, f"{prefix}.head", x)

    cond = extra_mode in ("down", "both")
    bridges, extra_cur = [], extra
    for i in range(depth):
        for j in range(n_resblocks):
            x = _run_att_res_block(sd, f"{prefix}.down_path.{i}.body.{j}",
                                   x, extra_cur if cond else None, cond)
        if i + 1 < depth:
            bridges.append(x)
            x = _tconv(sd, f"{prefix}.down_path.{i}.downsampler", x, stride=2)
            if cond:
                extra_cur = F.interpolate(extra, x.shape[-2:], mode="nearest")

    for k, jj in enumerate(reversed(range(depth - 1))):
        x = F.conv_transpose2d(x, sd[f"{prefix}.up_path.{k}.upsampler.weight"],
                               sd[f"{prefix}.up_path.{k}.upsampler.bias"],
                               stride=2)
        for b in range(n_resblocks):
            inp = x + bridges[jj] if b == 0 else x
            x = _run_att_res_block(sd, f"{prefix}.up_path.{k}.body.{b}",
                                   inp, None, False)

    out = _tconv(sd, f"{prefix}.tail", x)[..., :h, :w] + x_in
    return out


# -------------------------------------------------------------------- KNet

def _make_knet(sd, prefix, in_nc, out_chn, nf, num_blocks):
    _conv_params(sd, f"{prefix}.head", nf, in_nc, 9, bias=False)
    for i in range(num_blocks):
        bp = f"{prefix}.body.{i}.body"
        _conv_params(sd, f"{bp}.0", nf, nf, 3)
        _conv_params(sd, f"{bp}.2", nf, nf, 3)
        _conv_params(sd, f"{bp}.3.body.0", nf // 16, nf, 1)
        _conv_params(sd, f"{bp}.3.body.2", nf, nf // 16, 1)
    _conv_params(sd, f"{prefix}.tail.0", out_chn, nf, 3)


def _run_knet(sd, prefix, x, num_blocks):
    h = _tconv(sd, f"{prefix}.head", x, stride=4, padding=4)
    for i in range(num_blocks):
        bp = f"{prefix}.body.{i}.body"
        f = _tconv(sd, f"{bp}.0", h, slope=0.2)
        f = _tconv(sd, f"{bp}.2", f)
        y = f.mean(dim=(2, 3), keepdim=True)
        y = _tconv(sd, f"{bp}.3.body.0", y, padding=0, slope=0.2)
        y = torch.sigmoid(_tconv(sd, f"{bp}.3.body.2", y, padding=0))
        h = f * y + h
    out = _tconv(sd, f"{prefix}.tail.0", h)
    out = out.mean(dim=(2, 3), keepdim=True)
    lam12 = torch.exp(torch.clamp(out[:, :2], math.log(1e-4), math.log(1e2)))
    rho = torch.tanh(out[:, -1:])
    return torch.cat([lam12, rho], dim=1)


# -------------------------------------------------------------------- tests

@pytest.mark.parametrize("extra_mode,hw", [("input", (33, 41)),
                                           ("down", (32, 40)),
                                           ("both", (29, 32))])
def test_virnet_denoise_parity(extra_mode, hw):
    n_feat = (16, 24, 32)
    dep_s, n_res, sigma_chn = 4, 2, 1
    sd = {}
    _make_dncnn(sd, "SNet", 3, sigma_chn, dep_s)
    _make_attresunet(sd, "RNet", 3, sigma_chn, 3, n_feat, n_res, extra_mode)

    x = torch.rand(2, 3, *hw)
    sigma = torch.exp(torch.clamp(_run_dncnn(sd, "SNet", x, dep_s, False),
                                  math.log(1e-10), math.log(1e2)))
    mu = _run_attresunet(sd, "RNet", x, sigma.sqrt(), n_feat, n_res,
                         extra_mode)

    model = VIRNet(sigma_chn=sigma_chn, n_feat=n_feat, dep_S=dep_s,
                   n_resblocks=n_res, extra_mode=extra_mode)
    params = convert_state_dict(sd, model)
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    mu_j, sigma_j = model.apply(params, xj)

    np.testing.assert_allclose(np.asarray(sigma_j),
                               sigma.numpy().transpose(0, 2, 3, 1),
                               atol=2e-6)
    np.testing.assert_allclose(np.asarray(mu_j),
                               mu.numpy().transpose(0, 2, 3, 1), atol=1e-5)


@pytest.mark.parametrize("sf", [2, 3])
def test_virnet_sisr_parity(sf):
    n_feat = (16, 24, 32)
    dep_s, dep_k, n_res = 3, 2, 1
    sigma_chn, kernel_chn = 1, 3
    extra_mode = "both"
    sd = {}
    _make_dncnn(sd, "SNet", 3, sigma_chn, dep_s)
    _make_knet(sd, "KNet", 3, kernel_chn, 64, dep_k)
    _make_attresunet(sd, "RNet", 3, kernel_chn + sigma_chn, 3, n_feat,
                     n_res, extra_mode)

    x = torch.rand(2, 3, 17, 19)
    sigma = torch.exp(torch.clamp(
        _run_dncnn(sd, "SNet", x, dep_s, True), math.log(1e-10),
        math.log(1e2)))
    kinfo = _run_knet(sd, "KNet", x, dep_k)
    x_up = F.interpolate(x, scale_factor=sf, mode="nearest")
    h_up, w_up = x_up.shape[-2:]
    extra = torch.cat([kinfo.view(2, 3, 1, 1).repeat(1, 1, h_up, w_up),
                       sigma.sqrt().repeat(1, 1, h_up, w_up)], 1)
    mu = _run_attresunet(sd, "RNet", x_up, extra, n_feat, n_res, extra_mode)

    model = VIRNetSR(sigma_chn=sigma_chn, kernel_chn=kernel_chn,
                     n_feat=n_feat, dep_S=dep_s, dep_K=dep_k,
                     n_resblocks=n_res, extra_mode=extra_mode)
    params = convert_state_dict(sd, model)
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    mu_j, kinfo_j, sigma_j = model.apply(params, xj, sf)

    np.testing.assert_allclose(np.asarray(kinfo_j),
                               kinfo.view(2, 3).numpy(), atol=2e-6)
    np.testing.assert_allclose(np.asarray(sigma_j).reshape(2, 1),
                               sigma.view(2, 1).numpy(), atol=2e-6)
    np.testing.assert_allclose(np.asarray(mu_j),
                               mu.numpy().transpose(0, 2, 3, 1), atol=1e-5)
