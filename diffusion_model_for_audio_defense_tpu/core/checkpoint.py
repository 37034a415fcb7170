"""Checkpoint IO: Orbax for native checkpoints + PyTorch-state-dict converters.

The reference ships torch checkpoints in three formats (SURVEY.md §5.4):
DiffWave ``{model_state_dict, optimizer_state_dict}`` pickles
(``DiffWave_Unconditional/train.py:131-136``), improved-diffusion per-part
``.pt`` files, and classifier full-model/state-dict pickles. The converters
here fold ``nn.utils.weight_norm`` reparameterizations (``WaveNet.py:28,67,72``)
into plain kernels — ``w = g · v / ‖v‖₂(per out-channel)`` — and transpose to
the channels-last Flax layouts.

torch is only required at conversion time (CPU wheel in this image); the
converted artifacts are plain pytrees saved with Orbax.
"""

from __future__ import annotations

import os
from typing import Mapping

import jax
import numpy as np


# ---------------------------------------------------------------- low level


def _np(t):
    try:  # torch tensor
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def fold_weight_norm(v: np.ndarray, g: np.ndarray) -> np.ndarray:
    """w = g * v / ||v|| with the norm over all dims except dim 0
    (torch ``weight_norm(..., dim=0)`` default)."""
    v = np.asarray(v, dtype=np.float64)
    g = np.asarray(g, dtype=np.float64)
    axes = tuple(range(1, v.ndim))
    norm = np.sqrt((v**2).sum(axis=axes, keepdims=True))
    return (g.reshape(norm.shape) * v / norm).astype(np.float32)


def _conv_weight(sd: Mapping, prefix: str) -> np.ndarray:
    """Resolve a conv weight that may be weight-normed (old or new torch API)."""
    if f"{prefix}.weight_v" in sd:
        return fold_weight_norm(_np(sd[f"{prefix}.weight_v"]), _np(sd[f"{prefix}.weight_g"]))
    if f"{prefix}.parametrizations.weight.original1" in sd:
        return fold_weight_norm(
            _np(sd[f"{prefix}.parametrizations.weight.original1"]),
            _np(sd[f"{prefix}.parametrizations.weight.original0"]),
        )
    return _np(sd[f"{prefix}.weight"]).astype(np.float32)


def _conv1d(sd: Mapping, prefix: str) -> dict:
    """torch Conv1d (out,in,k) → flax {'kernel': (k,in,out), 'bias': (out,)}."""
    w = _conv_weight(sd, prefix)
    out = {"kernel": np.ascontiguousarray(np.transpose(w, (2, 1, 0)))}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"]).astype(np.float32)
    return out


def _conv2d(sd: Mapping, prefix: str) -> dict:
    """torch Conv2d (out,in,kh,kw) → flax {'kernel': (kh,kw,in,out), ...}."""
    w = _conv_weight(sd, prefix)
    out = {"kernel": np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"]).astype(np.float32)
    return out


def _dense(sd: Mapping, prefix: str) -> dict:
    out = {"kernel": np.ascontiguousarray(_np(sd[f"{prefix}.weight"]).astype(np.float32).T)}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"]).astype(np.float32)
    return out


def _batchnorm(sd: Mapping, prefix: str):
    """Returns (params, batch_stats) halves of a torch BatchNorm."""
    params = {
        "scale": _np(sd[f"{prefix}.weight"]).astype(np.float32),
        "bias": _np(sd[f"{prefix}.bias"]).astype(np.float32),
    }
    stats = {
        "mean": _np(sd[f"{prefix}.running_mean"]).astype(np.float32),
        "var": _np(sd[f"{prefix}.running_var"]).astype(np.float32),
    }
    return params, stats


# ------------------------------------------------------------ net converters


def convert_diffwave_state_dict(sd: Mapping, num_res_layers: int = 36, fuse_res_skip: bool = False) -> dict:
    """Reference WaveNet state dict → Flax ``WaveNet`` params
    (``use_weight_norm=False`` layout). Key layout per
    ``DiffWave_Unconditional/WaveNet.py`` module tree. With
    ``fuse_res_skip`` (the model default) the per-block res_conv/skip_conv
    kernels are concatenated into the single ``rs_conv`` matmul."""
    sd = {k.replace("module.", "", 1) if k.startswith("module.") else k: v for k, v in sd.items()}
    p = {
        "init_conv": {"Conv_0": _conv1d(sd, "init_conv.0.conv")},
        "fc_t1": _dense(sd, "residual_layer.fc_t1"),
        "fc_t2": _dense(sd, "residual_layer.fc_t2"),
        "final_conv1": {"Conv_0": _conv1d(sd, "final_conv.0.conv")},
        "final_conv2": {"Conv_0": _conv1d(sd, "final_conv.2.conv")},
    }
    for n in range(num_res_layers):
        b = f"residual_layer.residual_blocks.{n}"
        blk = {
            "Dense_0": _dense(sd, f"{b}.fc_t"),
            "dilated_conv": {"Conv_0": _conv1d(sd, f"{b}.dilated_conv_layer.conv")},
        }
        res = _conv1d(sd, f"{b}.res_conv")
        skip = _conv1d(sd, f"{b}.skip_conv")
        if fuse_res_skip:
            blk["rs_conv"] = {"Conv_0": {
                "kernel": np.concatenate([res["kernel"], skip["kernel"]], axis=-1),
                "bias": np.concatenate([res["bias"], skip["bias"]]),
            }}
        else:
            blk["res_conv"] = {"Conv_0": res}
            blk["skip_conv"] = {"Conv_0": skip}
        p[f"res_block_{n}"] = blk
    return jax.tree.map(np.asarray, p)


def stack_wavenet_cycles(params: dict, num_res_layers: int = 36, dilation_cycle: int = 12) -> dict:
    """Unrolled WaveNet params (res_block_0..N-1) → scan-over-cycles layout
    (``WaveNet(scan_cycles=True)``): per-position blocks stacked across
    cycles on a new leading axis under ``cycles/res_block_i``."""
    n_cycles = num_res_layers // dilation_cycle
    assert n_cycles * dilation_cycle == num_res_layers
    stacked = {}
    for i in range(dilation_cycle):
        trees = [params[f"res_block_{c * dilation_cycle + i}"] for c in range(n_cycles)]
        stacked[f"res_block_{i}"] = jax.tree.map(lambda *xs: np.stack([np.asarray(x) for x in xs]), *trees)
    out = {k: v for k, v in params.items() if not k.startswith("res_block_")}
    out["cycles"] = stacked
    return out


def load_diffwave_checkpoint(path: str, num_res_layers: int = 36) -> dict:
    """Load a reference ``{iter}.pkl`` and convert (``train.py:131-136`` format)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model_state_dict", ckpt)
    return {"params": convert_diffwave_state_dict(sd, num_res_layers)}


def convert_resnext_state_dict(sd: Mapping) -> dict:
    """Reference ``CifarResNeXt`` state dict → Flax variables
    ({'params', 'batch_stats'}), key layout per
    ``audio_models/ConvNets_SpeechCommands/models/resnext.py``."""
    sd = {k.replace("module.", "", 1) if k.startswith("module.") else k: v for k, v in sd.items()}
    params, stats = {}, {}

    def put_bn(flax_name, torch_prefix, dst_p, dst_s):
        p, s = _batchnorm(sd, torch_prefix)
        dst_p[flax_name] = p
        dst_s[flax_name] = s

    params["conv_1_3x3"] = {"kernel": _conv2d(sd, "conv_1_3x3")["kernel"]}
    put_bn("bn_1", "bn_1", params, stats)
    params["classifier"] = _dense(sd, "classifier")

    for key in sd:
        if "_bottleneck_" not in key or not key.endswith("conv_reduce.weight"):
            continue
        # e.g. stage_1.stage_1_bottleneck_0.conv_reduce.weight
        prefix = key[: -len(".conv_reduce.weight")]
        block = prefix.split(".")[-1]  # stage_1_bottleneck_0 (matches our name)
        bp, bs = {}, {}
        for conv in ("conv_reduce", "conv_conv", "conv_expand"):
            bp[conv] = {"kernel": _conv2d(sd, f"{prefix}.{conv}")["kernel"]}
        for bn in ("bn_reduce", "bn", "bn_expand"):
            put_bn(bn, f"{prefix}.{bn}", bp, bs)
        if f"{prefix}.shortcut.shortcut_conv.weight" in sd:
            bp["shortcut_conv"] = {"kernel": _conv2d(sd, f"{prefix}.shortcut.shortcut_conv")["kernel"]}
            put_bn("shortcut_bn", f"{prefix}.shortcut.shortcut_bn", bp, bs)
        params[block] = bp
        stats[block] = bs

    return {"params": jax.tree.map(np.asarray, params), "batch_stats": jax.tree.map(np.asarray, stats)}


def convert_m5_state_dict(sd: Mapping) -> dict:
    """Reference ``M5`` state dict → Flax variables (conv/bn blocks are
    positional: Conv_0..3, BatchNorm_0..3, Dense_0)."""
    sd = {k.replace("module.", "", 1) if k.startswith("module.") else k: v for k, v in sd.items()}
    params, stats = {}, {}
    for i in range(4):
        params[f"Conv_{i}"] = _conv1d(sd, f"conv{i + 1}")
        p, s = _batchnorm(sd, f"bn{i + 1}")
        params[f"BatchNorm_{i}"] = p
        stats[f"BatchNorm_{i}"] = s
    params["Dense_0"] = _dense(sd, "fc1")
    return {"params": jax.tree.map(np.asarray, params), "batch_stats": jax.tree.map(np.asarray, stats)}


def _gru_cell_params(sd: Mapping, layer: int, reverse: bool, prefix: str = "CRNN_model.gru") -> dict:
    """One torch GRU direction-layer → flax ``nn.GRUCell`` params.

    torch stacks gates r|z|n in ``weight_ih_l{k}``/``weight_hh_l{k}`` and
    keeps separate input/hidden biases; flax GRUCell has per-gate Dense
    layers where the r/z hidden biases fold into the input bias
    (σ(Wx+bi + Wh+bh) = σ(Wx + Wh + (bi+bh))) while b_hn must stay on the
    ``hn`` dense — it sits inside the reset-gate product
    ``n = tanh(W_in x + b_in + r ⊙ (W_hn h + b_hn))`` in both frameworks.
    """
    sfx = f"l{layer}" + ("_reverse" if reverse else "")
    W_ih = _np(sd[f"{prefix}.weight_ih_{sfx}"]).astype(np.float32)  # (3H, in)
    W_hh = _np(sd[f"{prefix}.weight_hh_{sfx}"]).astype(np.float32)  # (3H, H)
    b_ih = _np(sd[f"{prefix}.bias_ih_{sfx}"]).astype(np.float32)
    b_hh = _np(sd[f"{prefix}.bias_hh_{sfx}"]).astype(np.float32)
    H = W_hh.shape[1]
    g = lambda a, i: a[i * H:(i + 1) * H]
    return {
        "ir": {"kernel": np.ascontiguousarray(g(W_ih, 0).T), "bias": g(b_ih, 0) + g(b_hh, 0)},
        "iz": {"kernel": np.ascontiguousarray(g(W_ih, 1).T), "bias": g(b_ih, 1) + g(b_hh, 1)},
        "in": {"kernel": np.ascontiguousarray(g(W_ih, 2).T), "bias": g(b_ih, 2)},
        "hr": {"kernel": np.ascontiguousarray(g(W_hh, 0).T)},
        "hz": {"kernel": np.ascontiguousarray(g(W_hh, 1).T)},
        "hn": {"kernel": np.ascontiguousarray(g(W_hh, 2).T), "bias": g(b_hh, 2)},
    }


def convert_kws_state_dict(sd: Mapping, gru_num_layers: int = 2) -> dict:
    """Reference RCNN-KWS ``KWSModel`` state dict → Flax ``KWSModel`` params
    (``audio_models/RCNN_KWS/model.py:66-114``): sepconv depthwise/pointwise,
    2-layer bidirectional GRU (cells in flax creation order: l0 fwd, l0 bwd,
    l1 fwd, l1 bwd), tanh attention (Wx_b/Vt) and output head U."""
    sd = {k.replace("module.", "", 1) if k.startswith("module.") else k: v for k, v in sd.items()}
    params = {
        "depthwise": _conv1d(sd, "CRNN_model.sepconv.0"),
        "pointwise": _conv1d(sd, "CRNN_model.sepconv.1"),
        "attn_w": _dense(sd, "attn_layer.Wx_b"),
        "attn_v": _dense(sd, "attn_layer.Vt"),
        "attn_u": _dense(sd, "apply_attn.U"),
    }
    gru = {}
    idx = 0
    for layer in range(gru_num_layers):
        for reverse in (False, True):
            gru[f"GRUCell_{idx}"] = _gru_cell_params(sd, layer, reverse)
            idx += 1
    params["gru"] = gru
    return {"params": jax.tree.map(np.asarray, params)}


def convert_vgg_state_dict(sd: Mapping, cfg: str = "E") -> dict:
    """Reference VGG (torchvision-derived, ``models/vgg.py``) state dict →
    Flax ``VGG`` params. Sequential ``features.{i}`` indices advance 3 per
    conv-BN-ReLU triple and 1 per maxpool; the head is ``classifier.{0,3,6}``."""
    from ..models.vgg import _CFG

    sd = {k.replace("module.", "", 1) if k.startswith("module.") else k: v for k, v in sd.items()}
    params, stats = {}, {}
    seq, conv_i = 0, 0
    for v in _CFG[cfg]:
        if v == "M":
            seq += 1
            continue
        params[f"conv_{conv_i}"] = _conv2d(sd, f"features.{seq}")
        bnp, bns = _batchnorm(sd, f"features.{seq + 1}")
        params[f"bn_{conv_i}"] = bnp
        stats[f"bn_{conv_i}"] = bns
        seq += 3
        conv_i += 1
    for i, j in ((1, 0), (2, 3), (3, 6)):
        params[f"fc{i}"] = _dense(sd, f"classifier.{j}")
    return {"params": jax.tree.map(np.asarray, params), "batch_stats": jax.tree.map(np.asarray, stats)}


def convert_wideresnet_state_dict(sd: Mapping, depth: int = 28) -> dict:
    """Reference WideResNet (``models/wideresnet.py``) state dict → Flax
    ``WideResNet`` params: ``block{g}.layer.{b}.{bn1,conv1,bn2,conv2,
    convShortcut}`` plus the stem conv1 and final bn1/fc."""
    sd = {k.replace("module.", "", 1) if k.startswith("module.") else k: v for k, v in sd.items()}
    n = (depth - 4) // 6
    params = {"conv1": _conv2d(sd, "conv1"), "fc": _dense(sd, "fc")}
    stats = {}
    bnp, bns = _batchnorm(sd, "bn1")
    params["bn1"], stats["bn1"] = bnp, bns
    for g in range(1, 4):
        for b in range(n):
            t = f"block{g}.layer.{b}"
            blk_p, blk_s = {}, {}
            for bn in ("bn1", "bn2"):
                bp, bs = _batchnorm(sd, f"{t}.{bn}")
                blk_p[bn], blk_s[bn] = bp, bs
            blk_p["conv1"] = _conv2d(sd, f"{t}.conv1")
            blk_p["conv2"] = _conv2d(sd, f"{t}.conv2")
            if f"{t}.convShortcut.weight" in sd:
                blk_p["conv_shortcut"] = _conv2d(sd, f"{t}.convShortcut")
            params[f"block{g}_{b}"] = blk_p
            stats[f"block{g}_{b}"] = blk_s
    return {"params": jax.tree.map(np.asarray, params), "batch_stats": jax.tree.map(np.asarray, stats)}


def convert_densenet_state_dict(sd: Mapping, depth: int = 100) -> dict:
    """Reference DenseNet-BC (``models/densenet.py``) state dict → Flax
    ``DenseNet`` params: ``dense{d}.{b}.{bn1,conv1,bn2,conv2}``,
    ``trans{d}.{bn1,conv1}``, stem conv1, final bn/fc."""
    sd = {k.replace("module.", "", 1) if k.startswith("module.") else k: v for k, v in sd.items()}
    n = (depth - 4) // 6
    params = {"conv1": _conv2d(sd, "conv1"), "fc": _dense(sd, "fc")}
    stats = {}
    bnp, bns = _batchnorm(sd, "bn")
    params["bn_final"], stats["bn_final"] = bnp, bns
    for d in range(1, 4):
        for b in range(n):
            t = f"dense{d}.{b}"
            blk_p, blk_s = {}, {}
            for bn in ("bn1", "bn2"):
                bp, bs = _batchnorm(sd, f"{t}.{bn}")
                blk_p[bn], blk_s[bn] = bp, bs
            blk_p["conv1"] = _conv2d(sd, f"{t}.conv1")
            blk_p["conv2"] = _conv2d(sd, f"{t}.conv2")
            params[f"dense{d}_{b}"] = blk_p
            stats[f"dense{d}_{b}"] = blk_s
        if d < 3:
            bp, bs = _batchnorm(sd, f"trans{d}.bn1")
            params[f"trans{d}_bn"], stats[f"trans{d}_bn"] = bp, bs
            params[f"trans{d}_conv"] = _conv2d(sd, f"trans{d}.conv1")
    return {"params": jax.tree.map(np.asarray, params), "batch_stats": jax.tree.map(np.asarray, stats)}


def convert_dpn_state_dict(sd: Mapping, num_blocks=(3, 4, 20, 3)) -> dict:
    """Reference DPN (``models/dpn.py``) state dict → Flax ``DPN`` params:
    ``layer{l}.{i}.{conv1..3,bn1..3,shortcut.0,shortcut.1}`` plus stem
    conv1/bn1 and the linear head."""
    sd = {k.replace("module.", "", 1) if k.startswith("module.") else k: v for k, v in sd.items()}
    params = {"conv1": _conv2d(sd, "conv1"), "linear": _dense(sd, "linear")}
    stats = {}
    bnp, bns = _batchnorm(sd, "bn1")
    params["bn1"], stats["bn1"] = bnp, bns
    for l, nb in enumerate(num_blocks, start=1):
        for i in range(nb):
            t = f"layer{l}.{i}"
            blk_p, blk_s = {}, {}
            for c in (1, 2, 3):
                blk_p[f"conv{c}"] = _conv2d(sd, f"{t}.conv{c}")
                bp, bs = _batchnorm(sd, f"{t}.bn{c}")
                blk_p[f"bn{c}"], blk_s[f"bn{c}"] = bp, bs
            if f"{t}.shortcut.0.weight" in sd:
                blk_p["shortcut_conv"] = _conv2d(sd, f"{t}.shortcut.0")
                bp, bs = _batchnorm(sd, f"{t}.shortcut.1")
                blk_p["shortcut_bn"], blk_s["shortcut_bn"] = bp, bs
            params[f"layer{l}_{i}"] = blk_p
            stats[f"layer{l}_{i}"] = blk_s
    return {"params": jax.tree.map(np.asarray, params), "batch_stats": jax.tree.map(np.asarray, stats)}


def _tolerant_torch_load(path: str):
    """``torch.load`` that survives full-model pickles whose class modules
    are not importable (the reference saves whole models —
    ``torch.save(model, ...)``, ``M5/train.py:150-152`` — and loads them with
    ``create_model.py:8-16``, which needs the original sources on sys.path).

    Missing classes are replaced by state-capturing stubs; tensors are real
    (torch's tensor/Parameter types are always importable), so the module
    graph can be walked to recover the flat state dict."""
    import pickle

    import torch

    class _Stub:
        def __setstate__(self, state):
            if isinstance(state, dict):
                self.__dict__.update(state)
            elif isinstance(state, tuple):  # (dict, slots) protocol
                for part in state:
                    if isinstance(part, dict):
                        self.__dict__.update(part)

    class _TolerantUnpickler(pickle.Unpickler):
        def find_class(self, module, name):
            try:
                return super().find_class(module, name)
            except (ImportError, AttributeError):
                return type(name, (_Stub,), {"__module__": module})

    class _ShimModule:
        Unpickler = _TolerantUnpickler
        load = staticmethod(pickle.load)

    return torch.load(path, map_location="cpu", weights_only=False, pickle_module=_ShimModule)


def _extract_module_state_dict(obj, prefix: str = "") -> dict:
    """Walk a (possibly stubbed) nn.Module object graph → flat state dict."""
    d = getattr(obj, "__dict__", {})
    sd = {}
    for k, v in (d.get("_parameters") or {}).items():
        if v is not None:
            sd[prefix + k] = v
    for k, v in (d.get("_buffers") or {}).items():
        if v is not None:
            sd[prefix + k] = v
    for k, sub in (d.get("_modules") or {}).items():
        sd.update(_extract_module_state_dict(sub, prefix + k + "."))
    return sd


def load_classifier_checkpoint(path: str, model_name: str = "resnext29_8_64") -> dict:
    """Load a torch classifier checkpoint and convert.

    Handles state-dict files, ``{'state_dict': ...}`` wrappers, and the
    reference's full-model pickles (incl. DataParallel-wrapped ones) even
    when the original class modules are unavailable.
    """
    import torch

    try:
        obj = torch.load(path, map_location="cpu", weights_only=False)
    except (ModuleNotFoundError, AttributeError):
        stub = _tolerant_torch_load(path)
        sd = _extract_module_state_dict(stub)
        if not sd:
            raise ValueError(f"could not recover a state dict from {path}")
        obj = sd
    if hasattr(obj, "state_dict"):
        sd = obj.state_dict()
    elif isinstance(obj, dict) and "state_dict" in obj:
        sd = obj["state_dict"]
    elif isinstance(obj, dict):
        sd = obj
    else:
        raise ValueError(f"unsupported checkpoint object {type(obj)} in {path}")
    if model_name.startswith("resnext"):
        return convert_resnext_state_dict(sd)
    if model_name == "m5":
        return convert_m5_state_dict(sd)
    if model_name in ("rcnn_kws", "kws", "attn_rcnn"):
        return convert_kws_state_dict(sd)
    if model_name.startswith("vgg"):
        cfg = {"11": "A", "13": "B", "16": "D", "19": "E"}[
            "".join(c for c in model_name if c.isdigit())]
        return convert_vgg_state_dict(sd, cfg=cfg)
    if model_name.startswith("wideresnet") or model_name.startswith("wrn"):
        depth = int("".join(c for c in model_name if c.isdigit())[:2] or 28)
        return convert_wideresnet_state_dict(sd, depth=depth)
    if model_name.startswith("densenet"):
        depth = int(model_name.split("_")[-2]) if "_" in model_name else 100
        return convert_densenet_state_dict(sd, depth=depth)
    if model_name.startswith("dpn"):
        nb = (2, 2, 2, 2) if model_name == "dpn26" else (3, 4, 20, 3)
        return convert_dpn_state_dict(sd, num_blocks=nb)
    raise NotImplementedError(f"no converter for {model_name} yet; use a native orbax checkpoint")


def _groupnorm(sd: Mapping, prefix: str) -> dict:
    return {
        "scale": _np(sd[f"{prefix}.weight"]).astype(np.float32),
        "bias": _np(sd[f"{prefix}.bias"]).astype(np.float32),
    }


def _conv1x1_as_dense(sd: Mapping, prefix: str) -> dict:
    """torch conv (out,in,1[,1]) used as a channel-mixing 1×1 → flax Dense."""
    w = _np(sd[f"{prefix}.weight"]).astype(np.float32)
    w = w.reshape(w.shape[0], w.shape[1])
    out = {"kernel": np.ascontiguousarray(w.T)}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"]).astype(np.float32)
    return out


def convert_unet_state_dict(
    sd: Mapping,
    num_res_blocks: int = 3,
    channel_mult=(1, 2, 2, 2),
    attention_ds=(2, 4),
    num_heads: int = 4,
) -> dict:
    """Improved-diffusion ``UNetModel`` state dict → Flax ``models/unet.py``
    params. Walks the reference's ``input_blocks``/``middle_block``/
    ``output_blocks`` ModuleList indices in construction order
    (``improved_diffusion/unet.py:278-438``)."""
    sd = {k.replace("module.", "", 1) if k.startswith("module.") else k: v for k, v in sd.items()}

    def resblock(prefix):
        p = {
            "in_norm": _groupnorm(sd, f"{prefix}.in_layers.0"),
            "in_conv": _conv2d(sd, f"{prefix}.in_layers.2"),
            "emb_proj": _dense(sd, f"{prefix}.emb_layers.1"),
            "out_norm": _groupnorm(sd, f"{prefix}.out_layers.0"),
            "out_conv": _conv2d(sd, f"{prefix}.out_layers.3"),
        }
        if f"{prefix}.skip_connection.weight" in sd:
            p["skip"] = _conv1x1_as_dense(sd, f"{prefix}.skip_connection")
        return p

    def attnblock(prefix):
        qkv = _conv1x1_as_dense(sd, f"{prefix}.qkv")
        # torch lays qkv channels out per-head ([q_h k_h v_h] × heads,
        # unet.py:253-266 reshape); ours is [q(all heads) k v] — permute
        C3 = qkv["kernel"].shape[1]
        C = C3 // 3
        d = C // num_heads
        perm = np.concatenate(
            [np.arange(g * 3 * d + p * d, g * 3 * d + (p + 1) * d) for p in range(3) for g in range(num_heads)]
        )
        qkv = {"kernel": qkv["kernel"][:, perm], "bias": qkv["bias"][perm]}
        return {
            "norm": _groupnorm(sd, f"{prefix}.norm"),
            "qkv": qkv,
            "proj_out": _conv1x1_as_dense(sd, f"{prefix}.proj_out"),
        }

    p = {
        "time_embed_0": _dense(sd, "time_embed.0"),
        "time_embed_2": _dense(sd, "time_embed.2"),
        "in_conv": _conv2d(sd, "input_blocks.0.0"),
        "out_norm": _groupnorm(sd, "out.0"),
        "out_conv": _conv2d(sd, "out.2"),
        "mid_res_0": resblock("middle_block.0"),
        "mid_attn": attnblock("middle_block.1"),
        "mid_res_1": resblock("middle_block.2"),
    }

    # down path: input_blocks[1:] in construction order
    idx = 1
    ds = 1
    blk = 0
    for level, _ in enumerate(channel_mult):
        for _ in range(num_res_blocks):
            p[f"down_res_{blk}"] = resblock(f"input_blocks.{idx}.0")
            if ds in attention_ds:
                p[f"down_attn_{blk}"] = attnblock(f"input_blocks.{idx}.1")
            idx += 1
            blk += 1
        if level != len(channel_mult) - 1:
            p[f"down_sample_{level}"] = {"op": _conv2d(sd, f"input_blocks.{idx}.0.op")}
            idx += 1
            ds *= 2

    # up path: output_blocks in construction order (levels reversed)
    idx = 0
    blk = 0
    for level, _ in list(enumerate(channel_mult))[::-1]:
        for i in range(num_res_blocks + 1):
            p[f"up_res_{blk}"] = resblock(f"output_blocks.{idx}.0")
            sub = 1
            if ds in attention_ds:
                p[f"up_attn_{blk}"] = attnblock(f"output_blocks.{idx}.{sub}")
                sub += 1
            if level and i == num_res_blocks:
                p[f"up_sample_{level}"] = {"conv": _conv2d(sd, f"output_blocks.{idx}.{sub}.conv")}
            idx += 1
            blk += 1
        if level:
            ds //= 2

    return jax.tree.map(np.asarray, p)


def load_unet_checkpoint(path: str, **kwargs) -> dict:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {"params": convert_unet_state_dict(sd, **kwargs)}


# ------------------------------------------------------------------- orbax


def save_pytree(path: str, tree) -> None:
    import shutil

    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    if os.path.isdir(path):  # overwrite like torch.save would
        shutil.rmtree(path)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, tree)


def load_pytree(path: str, target=None):
    """Restore an orbax checkpoint.

    ``target``: optional pytree giving the structure (and namedtuple/custom
    node types) to restore into — required to round-trip optax optimizer
    states, whose namedtuple nodes would otherwise come back as plain dicts.
    """
    import warnings

    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    with warnings.catch_warnings():
        # restoring without per-leaf sharding specs is deliberate: checkpoints
        # move between the CPU test mesh and the TPU, so orbax reading the
        # sharding file (its informational UserWarning) is the wanted path
        warnings.filterwarnings(
            "ignore", message="Sharding info not provided when restoring"
        )
        if target is None:
            return ckptr.restore(os.path.abspath(path))
        return ckptr.restore(os.path.abspath(path), item=target)
