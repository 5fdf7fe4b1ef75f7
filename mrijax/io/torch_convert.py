"""Convert reference (PyTorch) checkpoints into mrijax flax params.

Lets users of the reference bring their trained weights along. Handles the
reference's checkpoint format for the 2D/2.5D UNets
(`diffusion.state_dict()` — UNet weights under ``model.*`` plus schedule
buffers like ``betas``; may carry ``model.module.`` / ``module.`` prefixes
from DataParallel/DDP wrapping, the three remap variants of
`slice_cond_2d_ddpm/show_model.py:110-124`).

Leaf transforms (determined empirically, verified by forward-parity tests
in tests/test_torch_parity.py):

* Conv{2,3}d          (O, I, *k)  →  (*k, I, O)           [exact]
* ConvTranspose{2,3}d (I, O, *k)  →  flip spatial, (*k, I, O)  [exact]
* Linear              (O, I)      →  (I, O)
* GroupNorm           weight/bias →  scale/bias (fp32)

The checkpoint's tensors arrive as numpy arrays: pass
``{k: v.numpy() for k, v in torch.load(p).items()}`` (no torch needed at
conversion time if the dict is already numpy, e.g. loaded via
``torch.load(..., map_location="cpu")`` elsewhere).
"""

from typing import Dict, Optional, Sequence

import numpy as np


def _np(v) -> np.ndarray:
    if hasattr(v, "detach"):  # torch tensor
        v = v.detach().cpu().numpy()
    return np.asarray(v)


def conv_kernel(w) -> np.ndarray:
    """(O, I, *k) → (*k, I, O)."""
    w = _np(w)
    spatial = tuple(range(2, w.ndim))
    return np.ascontiguousarray(w.transpose(*spatial, 1, 0))


def convt_kernel(w) -> np.ndarray:
    """(I, O, *k) → spatial-flip → (*k, I, O) (matches flax ConvTranspose
    with the default transpose_kernel=False)."""
    w = _np(w)
    flip = tuple(slice(None, None, -1) for _ in range(w.ndim - 2))
    w = w[(slice(None), slice(None)) + flip]
    spatial = tuple(range(2, w.ndim))
    return np.ascontiguousarray(w.transpose(*spatial, 0, 1))


def linear_kernel(w) -> np.ndarray:
    """(O, I) → (I, O)."""
    return np.ascontiguousarray(_np(w).T)


def strip_prefixes(state_dict: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Unwrap {state_dict: ...} nesting and drop DataParallel/DDP prefixes,
    keeping only the UNet's ``model.*`` subtree (schedule buffers dropped —
    mrijax recomputes them from the config in fp64)."""
    if "state_dict" in state_dict and isinstance(state_dict["state_dict"], dict):
        state_dict = state_dict["state_dict"]
    out = {}
    for k, v in state_dict.items():
        for pre in ("model.module.", "module.model.", "model.", "module."):
            if k.startswith(pre):
                out[k[len(pre):]] = _np(v)
                break
    return out


def infer_timesteps(state_dict: Dict[str, np.ndarray]) -> Optional[int]:
    """T from the checkpointed ``betas`` buffer (eval-parity trick,
    `slice_cond_2d_ddpm/metrics.py:291-294`)."""
    for k in ("betas", "state_dict"):
        if k == "state_dict" and isinstance(state_dict.get(k), dict):
            return infer_timesteps(state_dict[k])
        if k in state_dict:
            return int(_np(state_dict[k]).shape[0])
    return None


def _resblock(p: Dict[str, np.ndarray], prefix: str, has_res_conv: bool) -> dict:
    out = {
        "Conv_0": {"kernel": conv_kernel(p[f"{prefix}.conv1.weight"]),
                   "bias": _np(p[f"{prefix}.conv1.bias"])},
        "GroupNormSiLU_0": {"scale": _np(p[f"{prefix}.norm1.weight"]),
                            "bias": _np(p[f"{prefix}.norm1.bias"])},
        "Dense_0": {"kernel": linear_kernel(p[f"{prefix}.time_mlp.weight"]),
                    "bias": _np(p[f"{prefix}.time_mlp.bias"])},
        "Conv_1": {"kernel": conv_kernel(p[f"{prefix}.conv2.weight"]),
                   "bias": _np(p[f"{prefix}.conv2.bias"])},
        "GroupNormSiLU_1": {"scale": _np(p[f"{prefix}.norm2.weight"]),
                            "bias": _np(p[f"{prefix}.norm2.bias"])},
    }
    if has_res_conv:
        out["Conv_2"] = {"kernel": conv_kernel(p[f"{prefix}.res_conv.weight"]),
                         "bias": _np(p[f"{prefix}.res_conv.bias"])}
    return out


def convert_reference_unet2d(
    state_dict: Dict,
    *,
    channel_mults: Sequence[int] = (1, 2, 4, 8),
) -> dict:
    """Reference 2D/2.5D UNet ``diffusion.state_dict()`` → flax params for
    ``mrijax.models.UNet2D`` (identical forward within fp32 tolerance).

    Covers both `slice_cond_2d_ddpm/unet.py:108-199` and the 2.5D variant
    (same module names; only channel counts differ).
    """
    p = strip_prefixes({k: _np(v) for k, v in state_dict.items()})
    if not p:
        raise ValueError("no model.* keys found — is this a reference checkpoint?")
    n_trans = len(channel_mults) - 1

    params: dict = {
        "TimeEmbedding_0": {
            "Dense_0": {"kernel": linear_kernel(p["time_mlp.1.weight"]),
                        "bias": _np(p["time_mlp.1.bias"])},
            "Dense_1": {"kernel": linear_kernel(p["time_mlp.3.weight"]),
                        "bias": _np(p["time_mlp.3.bias"])},
        },
        "ScalarCondEmbedding_0": {
            "Dense_0": {"kernel": linear_kernel(p["slice_mlp.0.weight"]),
                        "bias": _np(p["slice_mlp.0.bias"])},
            "Dense_1": {"kernel": linear_kernel(p["slice_mlp.2.weight"]),
                        "bias": _np(p["slice_mlp.2.bias"])},
        },
        "Conv_0": {"kernel": conv_kernel(p["init_conv.weight"]),
                   "bias": _np(p["init_conv.bias"])},
    }

    rb = 0
    for i in range(n_trans):
        # DownBlock i: res1 changes channels (res_conv), res2 keeps them
        params[f"ResBlock2D_{rb}"] = _resblock(
            p, f"downs.{i}.res1", has_res_conv=f"downs.{i}.res1.res_conv.weight" in p
        )
        params[f"ResBlock2D_{rb + 1}"] = _resblock(
            p, f"downs.{i}.res2", has_res_conv=f"downs.{i}.res2.res_conv.weight" in p
        )
        params[f"Downsample_{i}"] = {
            "Conv_0": {"kernel": conv_kernel(p[f"downs.{i}.down.weight"]),
                       "bias": _np(p[f"downs.{i}.down.bias"])},
        }
        rb += 2
    for mid in ("mid_block1", "mid_block2"):
        params[f"ResBlock2D_{rb}"] = _resblock(
            p, mid, has_res_conv=f"{mid}.res_conv.weight" in p
        )
        rb += 1
    for j in range(n_trans):
        params[f"Upsample_{j}"] = {
            "ConvTranspose_0": {"kernel": convt_kernel(p[f"ups.{j}.up.weight"]),
                                "bias": _np(p[f"ups.{j}.up.bias"])},
        }
        for r, name in ((0, "res1"), (1, "res2")):
            params[f"ResBlock2D_{rb}"] = _resblock(
                p, f"ups.{j}.{name}",
                has_res_conv=f"ups.{j}.{name}.res_conv.weight" in p,
            )
            rb += 1

    params["GroupNormSiLU_0"] = {"scale": _np(p["out_norm.weight"]),
                                 "bias": _np(p["out_norm.bias"])}
    params["Conv_1"] = {"kernel": conv_kernel(p["out_conv.weight"]),
                        "bias": _np(p["out_conv.bias"])}
    return {"params": params}


def _resblock3d(p: Dict[str, np.ndarray], prefix: str, *, timed: bool) -> dict:
    """Reference ResidualBlock3D[NoTime] → mrijax ResBlock3D
    (norm→act→conv pre-activation; time-proj without activation)."""
    out = {
        "GroupNormSiLU_0": {"scale": _np(p[f"{prefix}.norm1.weight"]),
                            "bias": _np(p[f"{prefix}.norm1.bias"])},
        "Conv_0": {"kernel": conv_kernel(p[f"{prefix}.conv1.weight"]),
                   "bias": _np(p[f"{prefix}.conv1.bias"])},
        "GroupNormSiLU_1": {"scale": _np(p[f"{prefix}.norm2.weight"]),
                            "bias": _np(p[f"{prefix}.norm2.bias"])},
        "Conv_1": {"kernel": conv_kernel(p[f"{prefix}.conv2.weight"]),
                   "bias": _np(p[f"{prefix}.conv2.bias"])},
    }
    if timed and f"{prefix}.time_mlp.weight" in p:
        out["Dense_0"] = {"kernel": linear_kernel(p[f"{prefix}.time_mlp.weight"]),
                          "bias": _np(p[f"{prefix}.time_mlp.bias"])}
    if f"{prefix}.skip.weight" in p:
        out["Conv_2"] = {"kernel": conv_kernel(p[f"{prefix}.skip.weight"]),
                         "bias": _np(p[f"{prefix}.skip.bias"])}
    return out


def _conv1x1_to_dense(w, b) -> dict:
    """1×1(×1) conv → Dense over the channel axis (channels-last)."""
    w = _np(w)
    return {"kernel": np.ascontiguousarray(w.reshape(w.shape[0], w.shape[1]).T),
            "bias": _np(b)}


def convert_reference_unet3d(
    state_dict: Dict,
    *,
    channel_mults: Sequence[int] = (1, 2, 4),
    use_attention: bool = True,
) -> dict:
    """Reference ``UNet3DModel[WithAttention]`` weights → flax params for
    ``mrijax.models.UNet3D`` (`ddpm_3d_ldm/unet_attention.py:88-200`)."""
    p = strip_prefixes({k: _np(v) for k, v in state_dict.items()})
    if not p:  # 3D checkpoints may be saved unwrapped (UNet-only state_dict)
        p = {k: _np(v) for k, v in state_dict.items()}
    levels = len(channel_mults)

    params: dict = {
        "TimeEmbedding_0": {
            "Dense_0": {"kernel": linear_kernel(p["time_mlp.1.weight"]),
                        "bias": _np(p["time_mlp.1.bias"])},
            "Dense_1": {"kernel": linear_kernel(p["time_mlp.3.weight"]),
                        "bias": _np(p["time_mlp.3.bias"])},
        },
        "Conv_0": {"kernel": conv_kernel(p["in_conv.weight"]),
                   "bias": _np(p["in_conv.bias"])},
    }
    rb = 0
    for i in range(levels):
        params[f"ResBlock3D_{rb}"] = _resblock3d(p, f"downs.{i}.res1", timed=True)
        params[f"ResBlock3D_{rb + 1}"] = _resblock3d(p, f"downs.{i}.res2", timed=True)
        if i != levels - 1:
            params[f"Downsample_{i}"] = {
                "Conv_0": {"kernel": conv_kernel(p[f"downs.{i}.down.weight"]),
                           "bias": _np(p[f"downs.{i}.down.bias"])},
            }
        rb += 2
    params[f"ResBlock3D_{rb}"] = _resblock3d(p, "mid1", timed=True)
    rb += 1
    if use_attention:
        params["AttentionBlock3D_0"] = {
            "GroupNorm_0": {"scale": _np(p["mid_attn.norm.weight"]),
                            "bias": _np(p["mid_attn.norm.bias"])},
            "Dense_0": _conv1x1_to_dense(p["mid_attn.qkv.weight"],
                                         p["mid_attn.qkv.bias"]),
            "Dense_1": _conv1x1_to_dense(p["mid_attn.proj.weight"],
                                         p["mid_attn.proj.bias"]),
        }
    params[f"ResBlock3D_{rb}"] = _resblock3d(p, "mid2", timed=True)
    rb += 1
    # up path: reference iterates i = levels-1..0; ups.0.up is Identity
    up_idx = 0
    for j in range(levels):
        if j > 0:
            params[f"Upsample_{up_idx}"] = {
                "ConvTranspose_0": {
                    "kernel": convt_kernel(p[f"ups.{j}.up.weight"]),
                    "bias": _np(p[f"ups.{j}.up.bias"]),
                },
            }
            up_idx += 1
        params[f"ResBlock3D_{rb}"] = _resblock3d(p, f"ups.{j}.res1", timed=True)
        params[f"ResBlock3D_{rb + 1}"] = _resblock3d(p, f"ups.{j}.res2", timed=True)
        rb += 2
    params["GroupNormSiLU_0"] = {"scale": _np(p["out_norm.weight"]),
                                 "bias": _np(p["out_norm.bias"])}
    params["Conv_1"] = {"kernel": conv_kernel(p["out_conv.weight"]),
                        "bias": _np(p["out_conv.bias"])}
    return {"params": params}


# --------------------------------------------------- eval feature backbones


def _fold_bn(
    p: Dict, conv_key: str, bn_key: str, *, eps: float
) -> dict:
    """Fold an inference-mode BatchNorm into the preceding conv — exact:
    BN(conv(x)+b) = s·conv(x) + (s·(b−μ) + β) with s = γ/√(σ²+eps)."""
    w = _np(p[f"{conv_key}.weight"])  # (O, I, kh, kw)
    gamma = _np(p[f"{bn_key}.weight"]).astype(np.float64)
    beta = _np(p[f"{bn_key}.bias"]).astype(np.float64)
    mean = _np(p[f"{bn_key}.running_mean"]).astype(np.float64)
    var = _np(p[f"{bn_key}.running_var"]).astype(np.float64)
    s = gamma / np.sqrt(var + eps)
    kernel = conv_kernel(
        (w.astype(np.float64) * s[:, None, None, None]).astype(np.float32)
    )
    b = _np(p[f"{conv_key}.bias"]).astype(np.float64) if f"{conv_key}.bias" in p else 0.0
    bias = (s * (b - mean) + beta).astype(np.float32)
    return {"kernel": kernel, "bias": bias}


def convert_inception_v3(state_dict: Dict) -> dict:
    """torchvision ``inception_v3`` state_dict → flax params for
    ``mrijax.evals.backbones.InceptionV3`` (BN folded, eps=1e-3; fc and
    AuxLogits dropped — only the 2048-d pool3 trunk is used for FID/KID,
    `evaluation_scripts/evaluate_models.py:94-99`)."""
    p = {k: _np(v) for k, v in state_dict.items()}
    params: dict = {}
    for k in p:
        if not k.endswith(".conv.weight"):
            continue
        prefix = k[: -len(".conv.weight")]
        if prefix.startswith(("AuxLogits", "fc")):
            continue
        node = params
        for part in prefix.split("."):
            node = node.setdefault(part, {})
        node["conv"] = _fold_bn(p, f"{prefix}.conv", f"{prefix}.bn", eps=1e-3)
    if "Conv2d_1a_3x3" not in params:
        raise ValueError("not a torchvision inception_v3 state_dict")
    return {"params": params}


def convert_resnet18(state_dict: Dict) -> dict:
    """torchvision ``resnet18`` state_dict → flax params for
    ``mrijax.evals.backbones.ResNet18`` (BN folded, eps=1e-5; fc dropped —
    the PR extractor replaces it with Identity, metrics.py:156-160)."""
    p = {k: _np(v) for k, v in state_dict.items()}
    if "conv1.weight" not in p:
        raise ValueError("not a torchvision resnet18 state_dict")
    params: dict = {"conv1": _fold_bn(p, "conv1", "bn1", eps=1e-5)}
    for layer in range(1, 5):
        for blk in range(2):
            t = f"layer{layer}.{blk}"
            node = {
                "conv1": _fold_bn(p, f"{t}.conv1", f"{t}.bn1", eps=1e-5),
                "conv2": _fold_bn(p, f"{t}.conv2", f"{t}.bn2", eps=1e-5),
            }
            if f"{t}.downsample.0.weight" in p:
                node["downsample"] = _fold_bn(
                    p, f"{t}.downsample.0", f"{t}.downsample.1", eps=1e-5
                )
            params[f"layer{layer}_{blk}"] = node
    return {"params": params}


_ALEX_TAPS = (0, 3, 6, 8, 10)  # conv indices in alexnet.features
_ALEX_SLICES = (1, 2, 3, 4, 5)  # lpips slice holding each tap conv


def convert_lpips_alex(state_dict: Dict) -> dict:
    """``lpips.LPIPS(net="alex")`` state_dict → flax params for
    ``mrijax.evals.backbones.LPIPS``.

    Accepts the lpips-package key layout (``net.slice1.0.weight`` +
    ``lin0.model.1.weight``) and the flat variant (``features.0.weight`` +
    ``lin0.weight``). The scaling-layer buffers are fixed constants in the
    flax module, so they are ignored here."""
    p = {k: _np(v) for k, v in state_dict.items()}
    net: dict = {}
    lins: dict = {}
    for i, (gi, sl) in enumerate(zip(_ALEX_TAPS, _ALEX_SLICES)):
        for wkey in (f"net.slice{sl}.{gi}.weight", f"features.{gi}.weight"):
            if wkey in p:
                bkey = wkey[: -len("weight")] + "bias"
                net[f"conv{gi}"] = {
                    "kernel": conv_kernel(p[wkey]),
                    "bias": _np(p[bkey]),
                }
                break
        else:
            raise ValueError(f"missing alexnet conv {gi} in LPIPS state_dict")
        for lkey in (f"lin{i}.model.1.weight", f"lins.{i}.model.1.weight",
                     f"lin{i}.1.weight", f"lin{i}.weight"):
            if lkey in p:
                lins[f"lin{i}"] = _np(p[lkey]).reshape(-1).astype(np.float32)
                break
        else:
            raise ValueError(f"missing lin{i} head in LPIPS state_dict")
    return {"params": {"net": net, **lins}}


def convert_reference_vae3d(state_dict: Dict, *, num_down: int = 3) -> dict:
    """Reference ``VAE3D`` weights → flax params for ``mrijax.models.VAE3D``
    (`ddpm_3d_ldm/vae.py:5-128`)."""
    p = {k: _np(v) for k, v in state_dict.items()}
    if "state_dict" in p and isinstance(state_dict.get("state_dict"), dict):
        p = {k: _np(v) for k, v in state_dict["state_dict"].items()}
    p = {k[len("module."):] if k.startswith("module.") else k: v
         for k, v in p.items()}

    enc: dict = {
        "Conv_0": {"kernel": conv_kernel(p["encoder.in_conv.weight"]),
                   "bias": _np(p["encoder.in_conv.bias"])},
    }
    # encoder.downs is a FLAT ModuleList: [res, (res, conv)] per level
    k = 0
    rb = 0
    for i in range(num_down):
        enc[f"ResBlock3D_{rb}"] = _resblock3d(p, f"encoder.downs.{k}", timed=False)
        rb += 1
        k += 1
        if i != num_down - 1:
            enc[f"ResBlock3D_{rb}"] = _resblock3d(p, f"encoder.downs.{k}", timed=False)
            rb += 1
            k += 1
            enc[f"Downsample_{i}"] = {
                "Conv_0": {"kernel": conv_kernel(p[f"encoder.downs.{k}.weight"]),
                           "bias": _np(p[f"encoder.downs.{k}.bias"])},
            }
            k += 1
    enc["Conv_1"] = {"kernel": conv_kernel(p["encoder.to_mu_logvar.weight"]),
                     "bias": _np(p["encoder.to_mu_logvar.bias"])}

    dec: dict = {
        "Conv_0": {"kernel": conv_kernel(p["decoder.from_latent.weight"]),
                   "bias": _np(p["decoder.from_latent.bias"])},
    }
    k = 0
    rb = 0
    for i in reversed(range(num_down)):
        dec[f"ResBlock3D_{rb}"] = _resblock3d(p, f"decoder.ups.{k}", timed=False)
        rb += 1
        k += 1
        if i != 0:
            dec[f"ResBlock3D_{rb}"] = _resblock3d(p, f"decoder.ups.{k}", timed=False)
            rb += 1
            k += 1
            up_i = num_down - 1 - i
            dec[f"Upsample_{up_i}"] = {
                "ConvTranspose_0": {
                    "kernel": convt_kernel(p[f"decoder.ups.{k}.weight"]),
                    "bias": _np(p[f"decoder.ups.{k}.bias"]),
                },
            }
            k += 1
    dec["Conv_1"] = {"kernel": conv_kernel(p["decoder.out_conv.weight"]),
                     "bias": _np(p["decoder.out_conv.bias"])}
    return {"params": {"encoder": enc, "decoder": dec}}
