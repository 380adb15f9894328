"""Bidirectional conversion between our param pytrees and the reference's
PyTorch ``state_dict`` layout.

``from_reference_state_dict`` loads released ReReVST checkpoints
(``style_net-TIP-final.pth``; schema at ``test/framework.py:74-78``) into the
TPU model; ``to_reference_state_dict`` exports our params so the original
PyTorch code can run them (used by the parity test suite as a live oracle).

state_dict naming (from the reference module trees):
  Encoder.slice.<i>.{weight,bias}        i in {0,2,5,7,10,12,14,16,19}
  EncoderStyle.slice<k>.<i>.*            k slices keep torchvision indices
  Vgg19.slice<k>.<i>.*                   (loss net; optional)
  Decoder.slice{4,3,2}.{conv1,conv2,conv_shortcut}.*
  Decoder.slice1.*                       final 64->3 conv
  Decoder.Filter{1,2,3}.{down_sample.0,upsample.0,F1.down_sample.0,F1.FC,F2...}
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from rerevst_tpu.models.layers import from_torch_conv, from_torch_linear

#: our vgg conv name -> (EncoderStyle/Vgg19 slice name, torchvision index)
_VGG_SLICED = {
    "conv1_1": ("slice1", 0),
    "conv1_2": ("slice2", 2),
    "conv2_1": ("slice2", 5),
    "conv2_2": ("slice3", 7),
    "conv3_1": ("slice3", 10),
    "conv3_2": ("slice4", 12),
    "conv3_3": ("slice4", 14),
    "conv3_4": ("slice4", 16),
    "conv4_1": ("slice4", 19),
}

_RES_MAP = {"res4": "slice4", "res3": "slice3", "res2": "slice2"}
_RES_CONVS = {"conv1": "conv1", "conv2": "conv2", "shortcut": "conv_shortcut"}


def _np(x):
    """torch tensor or array-like -> numpy."""
    if hasattr(x, "detach"):
        return x.detach().cpu().numpy()
    return np.asarray(x)


def _conv_to_torch(p) -> Dict[str, np.ndarray]:
    out = {"weight": np.transpose(np.asarray(p["w"]), (3, 2, 0, 1))}
    if "b" in p:
        out["bias"] = np.asarray(p["b"])
    return out


def _linear_to_torch(p) -> Dict[str, np.ndarray]:
    return {"weight": np.transpose(np.asarray(p["w"])),
            "bias": np.asarray(p["b"])}


def to_reference_state_dict(params: Dict) -> Dict[str, np.ndarray]:
    sd: Dict[str, np.ndarray] = {}

    def put(prefix, tensors):
        for k, v in tensors.items():
            sd[f"{prefix}.{k}"] = v

    if "encoder" in params:
        for name, (_, idx) in _VGG_SLICED.items():
            put(f"Encoder.slice.{idx}", _conv_to_torch(params["encoder"][name]))
    for tree_key, mod in (("encoder_style", "EncoderStyle"), ("vgg_loss", "Vgg19")):
        if tree_key in params:
            for name, (slc, idx) in _VGG_SLICED.items():
                put(f"{mod}.{slc}.{idx}", _conv_to_torch(params[tree_key][name]))

    dec = params.get("decoder")
    if dec is not None:
        for ours, theirs in _RES_MAP.items():
            for ck, tk in _RES_CONVS.items():
                put(f"Decoder.{theirs}.{tk}", _conv_to_torch(dec[ours][ck]))
        put("Decoder.slice1", _conv_to_torch(dec["out"]))
        for i in (1, 2, 3):
            fname = f"filter{i}"
            if fname not in dec:
                continue
            fp = dec[fname]
            put(f"Decoder.Filter{i}.down_sample.0", _conv_to_torch(fp["down"]))
            put(f"Decoder.Filter{i}.upsample.0", _conv_to_torch(fp["up"]))
            for pk, pt in (("p1", "F1"), ("p2", "F2")):
                put(f"Decoder.Filter{i}.{pt}.down_sample.0",
                    _conv_to_torch(fp[pk]["down"]))
                put(f"Decoder.Filter{i}.{pt}.FC", _linear_to_torch(fp[pk]["fc"]))
    return sd


def from_reference_state_dict(state_dict: Dict, dtype=np.float32) -> Dict:
    """Convert a reference checkpoint (torch tensors or arrays) to params."""
    sd = {k: _np(v) for k, v in state_dict.items()}

    def conv(prefix):
        return from_torch_conv(sd[f"{prefix}.weight"],
                               sd.get(f"{prefix}.bias"), dtype)

    params: Dict = {}
    if "Encoder.slice.0.weight" in sd:
        params["encoder"] = {
            name: conv(f"Encoder.slice.{idx}")
            for name, (_, idx) in _VGG_SLICED.items()
        }
    for tree_key, mod in (("encoder_style", "EncoderStyle"), ("vgg_loss", "Vgg19")):
        if f"{mod}.slice1.0.weight" in sd:
            params[tree_key] = {
                name: conv(f"{mod}.{slc}.{idx}")
                for name, (slc, idx) in _VGG_SLICED.items()
            }

    if "Decoder.slice4.conv1.weight" in sd:
        dec: Dict = {}
        for ours, theirs in _RES_MAP.items():
            dec[ours] = {
                ck: conv(f"Decoder.{theirs}.{tk}")
                for ck, tk in _RES_CONVS.items()
            }
        dec["out"] = conv("Decoder.slice1")
        for i in (1, 2, 3):
            pre = f"Decoder.Filter{i}"
            if f"{pre}.down_sample.0.weight" not in sd:
                continue
            dec[f"filter{i}"] = {
                "down": conv(f"{pre}.down_sample.0"),
                "up": conv(f"{pre}.upsample.0"),
                "p1": {
                    "down": conv(f"{pre}.F1.down_sample.0"),
                    "fc": from_torch_linear(sd[f"{pre}.F1.FC.weight"],
                                            sd[f"{pre}.F1.FC.bias"], dtype),
                },
                "p2": {
                    "down": conv(f"{pre}.F2.down_sample.0"),
                    "fc": from_torch_linear(sd[f"{pre}.F2.FC.weight"],
                                            sd[f"{pre}.F2.FC.bias"], dtype),
                },
            }
        params["decoder"] = dec
    return params


def load_reference_checkpoint(path: str, dtype=np.float32) -> Dict:
    """Load a ReReVST ``.pth`` checkpoint into a TPU-model param pytree."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return from_reference_state_dict(sd, dtype)


# --- LoadPretrained: the reference's 3-stage fallback -----------------------

#: Ancient ReReVST schema: an extra 512->512 1x1 conv the reference tolerates
#: by temporarily attaching a dummy module (``train/train.py:144-146``).
_LEGACY_KEYS = ("Decoder.conv_kernel.weight", "Decoder.conv_kernel.bias")


def _covers(partial, template) -> bool:
    """Does `partial` provide every subtree/leaf of `template`?"""
    if isinstance(template, dict):
        if not isinstance(partial, dict):
            return False
        return all(k in partial and _covers(partial[k], template[k])
                   for k in template)
    return np.shape(partial) == np.shape(template)


def _graft(template, partial, path=""):
    """Overlay `partial` onto `template` (template keys only; shapes must
    match where provided).  Leaves are cast to the template leaf's dtype."""
    if isinstance(template, dict):
        part = partial if isinstance(partial, dict) else {}
        return {k: _graft(v, part.get(k), f"{path}.{k}" if path else k)
                for k, v in template.items()}
    if partial is None:
        return template
    t = np.asarray(template)
    p = np.asarray(partial)
    if p.shape != t.shape:
        raise ValueError(
            f"pretrained leaf {path}: shape {p.shape} != model {t.shape}")
    return p.astype(t.dtype)


def graft_pretrained_state_dict(state_dict: Dict, template: Dict,
                                dtype=np.float32):
    """The reference's 3-stage ``LoadPretrained`` (``train/train.py:124-146``)
    as a functional graft onto `template` (a freshly-initialised pytree):

    1. ``direct``  — the checkpoint covers the whole template tree.
    2. ``subtree`` — a flags-off / half-pretrained checkpoint (e.g. no
       ``Filter*`` or ``Vgg19``): graft Encoder / EncoderStyle /
       Decoder.slice1-4 and keep the template's dynamic filters + loss net,
       exactly what the reference's module-copy graft does.
    3. ``legacy``  — the old ``Decoder.conv_kernel`` schema: the extra keys
       are stripped (the reference attaches a dummy conv, loads, deletes it).

    Returns ``(params, stage)``.
    """
    sd = {k: _np(v) for k, v in state_dict.items()}
    stage = "direct"
    if any(k in sd for k in _LEGACY_KEYS):
        stage = "legacy"
        for k in _LEGACY_KEYS:
            sd.pop(k, None)
    partial = from_reference_state_dict(sd, dtype)
    if not partial:
        raise ValueError("state_dict contains no recognizable ReReVST keys")
    if stage == "direct" and not _covers(partial, template):
        stage = "subtree"
    return _graft(template, partial), stage


def load_pretrained(path: str, template: Dict, dtype=np.float32):
    """Initialise training from a checkpoint in any supported format:
    reference ``.pth`` (with the 3-stage fallback above) or our native
    ``.msgpack`` (bare params or a full train-state blob; missing subtrees
    keep the template init).  Returns ``(params, stage)``."""
    if path.endswith(".msgpack"):
        from rerevst_tpu.io.checkpoint import load_params

        raw = load_params(path)
        if isinstance(raw, dict) and "params" in raw and "opt_state" in raw:
            raw = raw["params"]
        stage = "direct" if _covers(raw, template) else "subtree"
        return _graft(template, raw), stage
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return graft_pretrained_state_dict(sd, template, dtype)
